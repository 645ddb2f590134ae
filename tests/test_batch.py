"""Batch workload search (query/batch.py): per-query row identity with
the single-query BM25 engine, pushdown-cap path equivalence, tombstone
handling, and the pruned-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.analysis.analyzer import analyze_query
from search_engine_spark.query.batch import analyze_queries, batch_bm25_topk
from search_engine_spark.query.bm25 import bm25_topk

WORKLOAD = [
    (1, "spark index"),
    (2, "query model spark"),
    (3, "model model token"),  # duplicate term: qtf = 2
    (4, "zzzznothing"),        # no dictionary hit -> no rows
    (5, "the of and"),         # stopword-only -> analyzes to nothing
]


@pytest.fixture(scope="module")
def workload(spark):
    return spark.createDataFrame(WORKLOAD, "query_id long, query string")


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_analyze_queries_matches_driver_analyzer(spark, workload):
    got = {
        (r["query_id"], r["term"]): r["qtf"]
        for r in analyze_queries(spark, workload).collect()
    }
    want = {}
    for qid, q in WORKLOAD:
        for t in analyze_query(q):
            want[(qid, t)] = want.get((qid, t), 0.0) + 1.0
    assert got == want


def test_batch_equals_single_query_engine(spark, index_store, workload):
    batch = batch_bm25_topk(spark, index_store, workload, k=5)
    by_qid = {}
    for qid, rank, doc, score in _rows(batch):
        by_qid.setdefault(qid, []).append((rank, doc, score))
    for qid, q in WORKLOAD:
        single = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(
                bm25_topk(spark, index_store, analyze_query(q), k=5).collect()
            )
        ]
        assert by_qid.get(qid, []) == single, f"query_id {qid} ({q!r})"


def test_join_path_equals_pushdown_path(spark, index_store, workload):
    """pushdown_cap=0 forces the no-literal-pushdown plan (term join prunes
    instead) — results must be identical."""
    a = _rows(batch_bm25_topk(spark, index_store, workload, k=5))
    b = _rows(batch_bm25_topk(spark, index_store, workload, k=5, pushdown_cap=0))
    assert a == b and len(a) > 0


def test_empty_workload(spark, index_store):
    empty = spark.createDataFrame([], "query_id long, query string")
    assert batch_bm25_topk(spark, index_store, empty, k=5).count() == 0


def test_pushdown_plan_prunes_scan(spark, index_store, workload):
    """The pushed path must show the workload's term filter reaching the
    posting scan (partition pruning on tbucket + pushed term IN)."""
    df = batch_bm25_topk(spark, index_store, workload, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan
    assert "PushedFilters" in plan


def test_per_query_topk_is_two_level_group_limit(spark, index_store, workload):
    """The per-query rank window must be planned as a two-level group
    limit (SPARK-37099): a WindowGroupLimit(Partial) BEFORE the query_id
    exchange keeps at most k rows per query per upstream partition, so a
    head-term query's full candidate set is never sorted in one task. A
    plan regression here (e.g. a refactor that breaks the rank-filter
    pattern the optimizer matches) reintroduces the hot-partition sort."""
    df = batch_bm25_topk(spark, index_store, workload, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan
    assert ", Partial" in plan  # the pre-exchange pruning level
    assert ", Final" in plan
