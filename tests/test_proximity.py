"""Proximity (NEAR/w) queries: parser forms, segment kernel vs the
brute-force oracle, pipeline integration, and fuzzy-token parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.query.parser import parse_query
from search_engine_spark.query.proximity import near_matches, near_topk


def test_parser_near_forms():
    pq = parse_query("table NEAR/3 filter", stem=False)
    assert pq.kind == "near"
    assert pq.terms == ["table", "filter"]
    assert pq.window == 3
    # quoted sides parse the same
    quoted = parse_query('"table" NEAR/7 "filter"', stem=False)
    assert quoted.kind == "near" and quoted.window == 7
    # stemming applies to both sides
    stemmed = parse_query("tables NEAR/2 filtering", stem=True)
    assert stemmed.kind == "near"
    assert stemmed.terms == [
        parse_query("tables", stem=True).terms[0],
        parse_query("filtering", stem=True).terms[0],
    ]


def test_parser_near_degenerates_to_free_text():
    # stopword side analyzes to zero terms -> free text
    assert parse_query("the NEAR/3 filter", stem=False).kind == "term"
    # both sides the same analyzed term -> free text
    assert parse_query("table NEAR/3 table", stem=False).kind == "term"
    # zero window -> free text
    assert parse_query("table NEAR/0 filter", stem=False).kind == "term"
    # free-text / phrase / logical surfaces unaffected
    assert parse_query("plain data", stem=False).window is None
    assert parse_query('"some words"', stem=False).kind in ("phrase", "term")


def test_parser_fuzzy_tokens():
    pq = parse_query("lin~ data", stem=False)
    assert pq.kind == "term"
    assert pq.fuzzies == ["lin"]
    assert pq.terms == ["data"]
    only = parse_query("lin~", stem=False)
    assert only.fuzzies == ["lin"] and only.terms == []
    assert parse_query("plain data", stem=False).fuzzies is None


def _near_oracle(oix, ta: str, tb: str, w: int) -> dict[int, int]:
    """Brute-force pair counts from the oracle's positional index."""
    out: dict[int, int] = {}
    pa_by_doc = oix.positions.get(ta, {})
    pb_by_doc = oix.positions.get(tb, {})
    for doc_id, pas in pa_by_doc.items():
        pbs = pb_by_doc.get(doc_id)
        if not pbs:
            continue
        n = sum(1 for pa in pas for pb in pbs if abs(pa - pb) <= w)
        if n:
            out[doc_id] = n
    return out


def _cooccurring_pair(oix, w: int) -> tuple[str, str]:
    """Two distinct analyzed terms guaranteed to co-occur within ``w``,
    both fixed points of re-analysis (so the raw query string round-trips
    through the pipeline's analyzer to the same terms)."""
    from search_engine_spark.analysis.analyzer import analyze_query

    for _, doc in oix.docs.iterrows():
        doc_id = int(doc["doc_id"])
        here = [
            (t, ps[0])
            for t, by_doc in oix.positions.items()
            if (ps := by_doc.get(doc_id))
        ]
        here.sort(key=lambda x: x[1])
        for (t1, p1), (t2, p2) in zip(here, here[1:]):
            if (
                t1 != t2
                and abs(p1 - p2) <= w
                and analyze_query(t1) == [t1]
                and analyze_query(t2) == [t2]
            ):
                return t1, t2
    pytest.skip("fixture has no co-occurring pair")


@pytest.mark.parametrize("w", [1, 3])
def test_near_matches_vs_oracle(spark, index_store, oracle_index, w):
    ta, tb = _cooccurring_pair(oracle_index, w)
    expect = _near_oracle(oracle_index, ta, tb, w)
    assert expect  # pair chosen to co-occur
    got = {
        r["doc_id"]: r["pair_count"]
        for r in near_matches(spark, index_store, ta, tb, w).collect()
    }
    assert got == expect


def test_near_matches_symmetric(spark, index_store, oracle_index):
    ta, tb = _cooccurring_pair(oracle_index, 3)
    a = {
        (r["doc_id"], r["pair_count"])
        for r in near_matches(spark, index_store, ta, tb, 3).collect()
    }
    b = {
        (r["doc_id"], r["pair_count"])
        for r in near_matches(spark, index_store, tb, ta, 3).collect()
    }
    assert a == b


def test_near_validation(spark, index_store):
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "same", "same", 3)
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "a", "b", 0)
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "a", "b", 64)


def test_near_pipeline_equals_direct(spark, index_store, oracle_index):
    from search_engine_spark.query.pipeline import search

    ta, tb = _cooccurring_pair(oracle_index, 3)
    direct = [
        (r["doc_id"], round(r["score"], 9))
        for r in near_topk(spark, index_store, ta, tb, 3, k=10).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{ta} NEAR/3 {tb}", k=10,
            engine="df", with_metadata=False,
        ).collect()
    ]
    assert got == direct and got


def test_fuzzy_pipeline_equals_manual_expansion(spark, index_store):
    from search_engine_spark.query.bm25 import bm25_topk
    from search_engine_spark.query.pipeline import search
    from search_engine_spark.query.suggest import expand_fuzzy

    word = next(
        t
        for r in index_store.term_stats(spark)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(1)
        .collect()
        for t in [r["term"]]
    )[:-1] + "x"  # near-miss of the most frequent term
    terms = expand_fuzzy(spark, index_store, word, limit=3)
    assert terms
    manual = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(spark, index_store, terms, k=10)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{word}~", k=10, engine="df",
            with_metadata=False, prefix_limit=3,
        ).collect()
    ]
    assert got == manual
