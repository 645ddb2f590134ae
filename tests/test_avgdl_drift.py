"""Regression tests for streaming-append correctness.

1. avgdl drift: block-max impacts are encoded with the build-time avgdl; a
   streaming append that RAISES the corpus avgdl makes those stored bounds
   underestimate true scores, which silently mis-prunes WAND unless the
   bounds are inflated by max(1, avgdl_now/encode_avgdl) per chunk (the
   monotone correction recorded via the manifest's ``encode_avgdl``).
   The corpus below is engineered so the un-inflated bound WOULD prune the
   true top-1 (asserted in test setup), i.e. this fails without the fix.

2. foreachBatch idempotency: a replayed batch_id is a no-op, and a retry of
   a batch that crashed mid-commit republishes the same artifacts instead of
   appending duplicates.
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.index.builder import build_index
from search_engine_spark.index.codec import BM25_B, BM25_K1
from search_engine_spark.query.bm25 import bm25_topk
from search_engine_spark.query.wand import bm25_topk_wand
from search_engine_spark.streaming.incremental import append_batch


def _word(i: int) -> str:
    """Unique all-alpha filler token (len>1, non-stopword, digit-free)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    s = ""
    i += 1
    while i:
        s += letters[i % 26]
        i //= 26
    return "q" + s


def _turn(conv: int, text: str) -> dict:
    return {
        "conv_id": f"conv_{conv:08d}",
        "turn_idx": 0,
        "role": "user",
        "text": text,
        "tool": "",
        "ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=conv),
    }


N_BASE = 300
VICTIM = 200  # block 2 of the single alpha segment (BLOCK_SIZE=128)


@pytest.fixture(scope="module")
def drift_store(spark, tmp_path_factory):
    rows = []
    w = iter(range(10**6))
    for i in range(N_BASE):
        if i < 128:
            # high-impact threshold setters: tf=1, dl=5 (block 0)
            fill = " ".join(_word(next(w)) for _ in range(4))
            rows.append(_turn(i, f"alpha {fill}"))
        elif i == VICTIM:
            # the true top-1 after drift: tf=3, dl=60
            fill = " ".join(_word(next(w)) for _ in range(57))
            rows.append(_turn(i, f"alpha alpha alpha {fill}"))
        else:
            fill = " ".join(_word(next(w)) for _ in range(59))
            rows.append(_turn(i, f"alpha {fill}"))
    base = spark.createDataFrame(pd.DataFrame(rows))
    d = tmp_path_factory.mktemp("drift")
    store = build_index(
        spark, base, str(d / "ix"), drange_span=1024, n_chunks=1
    )
    avgdl_old = store.corpus_stats()["avgdl"]

    # append long docs without 'alpha' -> avgdl rises, alpha segments stale
    delta = [
        _turn(N_BASE + i, " ".join(_word(next(w)) for _ in range(300)))
        for i in range(N_BASE)
    ]
    append_batch(spark, store, spark.createDataFrame(pd.DataFrame(delta)))
    avgdl_new = store.corpus_stats()["avgdl"]
    assert avgdl_new > 2 * avgdl_old, "scenario setup: avgdl must drift up"

    # scenario guard: the victim's STALE stored impact must sit below the
    # threshold-setters' TRUE impact, else this corpus wouldn't catch the bug
    def impact(tf, dl, avgdl):
        return tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))

    assert impact(3, 60, avgdl_old) < impact(1, 5, avgdl_new)
    assert impact(3, 60, avgdl_new) > impact(1, 5, avgdl_new)
    return store


def test_wand_matches_df_after_avgdl_drift(spark, drift_store):
    df_top = bm25_topk(spark, drift_store, ["alpha"], k=3).collect()
    wand_top = bm25_topk_wand(spark, drift_store, ["alpha"], k=3).collect()
    assert [r["doc_id"] for r in df_top] == [r["doc_id"] for r in wand_top]
    for a, b in zip(df_top, wand_top):
        assert abs(a["score"] - b["score"]) < 1e-9
    # and the drifted victim actually IS the true top-1
    assert df_top[0]["doc_id"] == VICTIM


def test_replayed_batch_id_is_noop(spark, drift_store, tmp_path):
    store = drift_store
    n_before = store.corpus_stats()["n_docs"]
    batch = spark.createDataFrame(
        pd.DataFrame([_turn(10_000 + i, f"beta gamma {_word(i)}") for i in range(5)])
    )
    n1 = append_batch(spark, store, batch, batch_id=777)
    assert n1 == 5
    assert store.corpus_stats()["n_docs"] == n_before + 5
    # replay: at-least-once delivery of the same batch_id must be skipped
    n2 = append_batch(spark, store, batch, batch_id=777)
    assert n2 == 0
    assert store.corpus_stats()["n_docs"] == n_before + 5
    docs = store.docs(spark)
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_partial_batch_retry_has_no_duplicates(spark, drift_store):
    """Crash after publishing data files but before the ledger commit: the
    retry must purge the first attempt's files and republish once."""
    store = drift_store
    n_before = store.corpus_stats()["n_docs"]
    batch = spark.createDataFrame(
        pd.DataFrame([_turn(20_000 + i, f"delta {_word(i)} {_word(i + 7)}") for i in range(4)])
    )

    original = store.write_manifest
    calls = {"n": 0}

    def failing_manifest(chunk, payload):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before commit")
        return original(chunk, payload)

    store.write_manifest = failing_manifest
    try:
        with pytest.raises(RuntimeError, match="injected"):
            append_batch(spark, store, batch, batch_id=888)
        # docs/postings were already published by the failed attempt
        assert store.docs(spark).count() == n_before + 4
        assert "888" in store.read_ledger()["inflight"]
        # retry: same batch_id -> same base/chunk, purge + republish
        n = append_batch(spark, store, batch, batch_id=888)
    finally:
        store.write_manifest = original
    assert n == 4
    assert store.corpus_stats()["n_docs"] == n_before + 4
    docs = store.docs(spark)
    assert docs.count() == n_before + 4
    assert docs.count() == docs.select("doc_id").distinct().count()
    assert "888" in store.read_ledger()["committed"]
    # postings table carries no duplicate (term, doc_id) rows either
    p = store.postings(spark)
    assert p.count() == p.select("term", "doc_id").distinct().count()
