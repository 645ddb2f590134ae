"""Incremental index append (Structured Streaming, availableNow):
after draining new transcript files, the merged index must answer queries
rank-identically to a from-scratch oracle over the full corpus, and a
re-trigger with the same checkpoint must be a no-op (exactly-once)."""

import time

import pytest

from search_engine_spark.corpus import HEAD_TERMS, VOCAB, generate_pandas
from search_engine_spark.index.builder import build_index
from search_engine_spark.index.storage import IndexStore
from search_engine_spark.oracle import build_oracle_index, score_query, topk
from search_engine_spark.query.pipeline import search
from search_engine_spark.streaming.incremental import incremental_index_stream

N_BASE = 20
N_TOTAL = 30

QUERIES = [
    f"{HEAD_TERMS[0]} {VOCAB[0]}",
    f"{VOCAB[1]} {VOCAB[4]} {VOCAB[9]}",
    f'"{VOCAB[0]} {VOCAB[1]}"',
]


@pytest.fixture(scope="module")
def appended_store(spark, tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("stream")
    full = generate_pandas(N_TOTAL, seed=42)
    base = full[full["conv_id"] < f"conv_{N_BASE:08d}"]
    delta = full[full["conv_id"] >= f"conv_{N_BASE:08d}"]

    ix_dir = str(base_dir / "ix")
    store = build_index(
        spark, spark.createDataFrame(base), ix_dir, drange_span=64, n_chunks=2
    )
    n0 = store.corpus_stats()["n_docs"]

    # drop delta files into the watched directory, drain with availableNow
    watch = str(base_dir / "incoming")
    spark.createDataFrame(delta).coalesce(2).write.mode("overwrite").parquet(watch)
    ckpt = str(base_dir / "ckpt")
    q = incremental_index_stream(spark, store, watch, ckpt)
    q.awaitTermination(120)
    assert store.corpus_stats()["n_docs"] == len(full)

    # re-trigger: checkpoint makes it exactly-once (no duplicate appends)
    q2 = incremental_index_stream(spark, store, watch, ckpt)
    q2.awaitTermination(120)
    assert store.corpus_stats()["n_docs"] == len(full)
    return store, full, n0


def test_incremental_counts_and_manifest(appended_store):
    store, full, n0 = appended_store
    ms = store.manifests()
    assert any(m["input"] == "transcripts-stream" for m in ms)
    assert sum(1 for m in ms if m["input"] == "transcripts-stream") >= 1
    total_postings = sum(m["n_postings"] for m in ms)
    assert total_postings > 0


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("engine", ["df", "wand"])
def test_incremental_rank_identity(spark, appended_store, query, engine):
    store, full, _ = appended_store
    if engine == "wand" and query.startswith('"'):
        pytest.skip("phrase goes through the positional path")
    oix = build_oracle_index(full)
    exp = topk(score_query(oix, query), 10)
    got = search(spark, store, query, k=10, engine=engine, with_metadata=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in exp
    ]


def test_direct_and_stream_prefixes_do_not_collide(spark, tmp_path):
    """A direct append_batch (batch_id=None) publishes under 'c<chunk>-';
    a stream batch under 'b<id>-'. With one shared namespace (pre-round-3),
    a stream replay's unpublish could delete a direct append's
    already-published files when chunk numbers and batch_ids advanced onto
    the same small integers."""
    from search_engine_spark.streaming.incremental import append_batch

    full = generate_pandas(24, seed=7)
    base = full[full["conv_id"] < "conv_00000008"]
    mid = full[
        (full["conv_id"] >= "conv_00000008")
        & (full["conv_id"] < "conv_00000016")
    ]
    rest = full[full["conv_id"] >= "conv_00000016"]

    ix = str(tmp_path / "ix")
    store = build_index(
        spark, spark.createDataFrame(base), ix, drange_span=64, n_chunks=1
    )
    # direct append -> chunk 1, prefix c1-
    append_batch(spark, store, spark.createDataFrame(mid))
    n_after_direct = store.corpus_stats()["n_docs"]
    # stream-style append with batch_id=1 (same small integer) -> prefix b1-
    append_batch(spark, store, spark.createDataFrame(rest), batch_id=1)
    assert store.corpus_stats()["n_docs"] == len(full)
    # replaying the SAME stream batch must be a committed no-op AND must
    # not have unpublished the direct append's c1- files
    append_batch(spark, store, spark.createDataFrame(rest), batch_id=1)
    assert store.corpus_stats()["n_docs"] == len(full)
    assert store.docs(spark).count() == len(full)
    assert n_after_direct == len(base) + len(mid)

    # rank identity vs a fresh full build proves no files were lost
    oix = build_oracle_index(full)
    for q in QUERIES:
        exp = topk(score_query(oix, q), 10)
        got = search(spark, store, q, k=10, with_metadata=False).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
            (d, round(s, 9)) for d, s in exp
        ], q
