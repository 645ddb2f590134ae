"""Sharded-build merge (index/merge.py): two independently-built shards
folded together must be query-equivalent to one build over the whole
corpus — stats, BM25 (df + WAND), and the positional phrase family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import HEAD_TERMS
from search_engine_spark.index.builder import build_index
from search_engine_spark.index.merge import merge_store
from search_engine_spark.index.storage import IndexStore
from search_engine_spark.query.bm25 import bm25_topk
from search_engine_spark.query.phrase import phrase_matches
from search_engine_spark.query.wand import bm25_topk_wand

SPLIT = "conv-0020"


@pytest.fixture(scope="module")
def merged_and_full(spark, transcripts_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    half = transcripts_df.filter(F.col("conv_id") < SPLIT)
    rest = transcripts_df.filter(F.col("conv_id") >= SPLIT)
    dst = build_index(spark, half, str(root / "a"), drange_span=64, n_chunks=2)
    src = build_index(spark, rest, str(root / "b"), drange_span=64, n_chunks=2)
    n = merge_store(spark, dst, src)
    assert n == rest.count()
    full = build_index(
        spark, transcripts_df, str(root / "full"), drange_span=64, n_chunks=2
    )
    return dst, full


def _topk(rows):
    return [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in rows]


def test_merged_stats_equal_full_build(spark, merged_and_full):
    merged, full = merged_and_full
    ms, fs = merged.corpus_stats(), full.corpus_stats()
    assert ms["n_docs"] == fs["n_docs"]
    assert abs(ms["avgdl"] - fs["avgdl"]) < 1e-9
    m = {
        (r["term"], r["df"], round(r["bm25_idf"], 9))
        for r in merged.term_stats(spark).collect()
    }
    f = {
        (r["term"], r["df"], round(r["bm25_idf"], 9))
        for r in full.term_stats(spark).collect()
    }
    assert m == f


def test_merged_bm25_equals_full_build(spark, merged_and_full):
    merged, full = merged_and_full
    q = [HEAD_TERMS[0], HEAD_TERMS[1]]
    assert _topk(bm25_topk(spark, merged, q, k=10).collect()) == _topk(
        bm25_topk(spark, full, q, k=10).collect()
    )
    assert _topk(bm25_topk_wand(spark, merged, q, k=10).collect()) == _topk(
        bm25_topk_wand(spark, full, q, k=10).collect()
    )


def test_merged_phrase_equals_full_build(spark, merged_and_full):
    """Positional streams must survive the shift+re-encode: the merged
    chunk serves phrase counts identical to the single build."""
    merged, full = merged_and_full
    q = [HEAD_TERMS[0], HEAD_TERMS[1]]
    m = sorted(
        (int(r["doc_id"]), int(r["phrase_count"]))
        for r in phrase_matches(spark, merged, q).collect()
    )
    f = sorted(
        (int(r["doc_id"]), int(r["phrase_count"]))
        for r in phrase_matches(spark, full, q).collect()
    )
    assert m == f and len(m) > 0


def test_src_tombstones_travel(spark, transcripts_df, tmp_path):
    from search_engine_spark.index.deletes import mark_deleted, tombstones

    half = transcripts_df.filter(F.col("conv_id") < SPLIT)
    rest = transcripts_df.filter(F.col("conv_id") >= SPLIT)
    dst = build_index(spark, half, str(tmp_path / "a"), n_chunks=1)
    src = build_index(spark, rest, str(tmp_path / "b"), n_chunks=1)
    mark_deleted(spark, src, [0, 1])
    base = dst.corpus_stats()["n_docs"]
    merge_store(spark, dst, src)
    got = {int(r["doc_id"]) for r in tombstones(spark, dst).collect()}
    assert got == {base + 0, base + 1}


def test_analyzer_mismatch_refused(spark, transcripts_df, tmp_path):
    half = transcripts_df.filter(F.col("conv_id") < SPLIT)
    rest = transcripts_df.filter(F.col("conv_id") >= SPLIT)
    a = build_index(spark, half, str(tmp_path / "s"), n_chunks=1, stem=True)
    b = build_index(spark, rest, str(tmp_path / "n"), n_chunks=1, stem=False)
    with pytest.raises(ValueError, match="analyzer mismatch"):
        merge_store(spark, a, b)
