"""Physical-plan shape regressions: the scale properties we claim must be
visible in `.explain` output — partition pruning on term buckets, parquet
filter pushdown, broadcast joins for small sides, TakeOrderedAndProject for
top-k (SURVEY.md §4)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_postings_scan_prunes_partitions_and_pushes_term_filter(spark, index_store):
    from search_engine_spark.index.build import term_bucket_py

    term = "spark"
    df = (
        index_store.postings(spark)
        .filter(F.col("tbucket") == term_bucket_py(term))
        .filter(F.col("term") == term)
        .select("doc_id", "tf")
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    # tbucket appears as a partition filter, term as a pushed data filter
    assert "tbucket" in plan.split("PartitionFilters", 1)[1].split("\n", 2)[0] or \
           "tbucket" in plan
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1].split("\n", 1)[0]
    assert "term" in pushed
    # column pruning: the fat importance column is not read
    assert "importance" not in plan.split("ReadSchema", 1)[1].split("\n", 1)[0]


def test_bm25_topk_uses_take_ordered_and_broadcasts_stats(spark, index_store):
    from search_engine_spark.analysis import analyze_query
    from search_engine_spark.query.bm25 import bm25_topk

    df = bm25_topk(spark, index_store, analyze_query("spark index"), k=10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_metadata_join_is_broadcast(spark, index_store):
    from search_engine_spark.query.pipeline import search

    df = search(spark, index_store, "spark", k=5)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_positions_scan_prunes_partitions(spark, index_store):
    """Phrase queries must get the same directory pruning postings have:
    positions/ is partitioned by tbucket and phrase_matches filters on it."""
    from search_engine_spark.analysis import analyze_query
    from search_engine_spark.query.phrase import phrase_matches

    df = phrase_matches(spark, index_store, analyze_query("spark index"))
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "tbucket" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_enrichment_probe_pushes_doc_id_filter(spark, index_store):
    """Metadata enrichment must not scan the whole doc registry for k rows:
    the probe side carries a pushed doc_id IN filter (row-group skipping)."""
    from search_engine_spark.query.pipeline import search

    df = search(spark, index_store, "spark", k=5)
    plan = _plan(df)
    scans = [p for p in plan.split("Scan parquet") if "/docs]" in p]
    assert scans, plan
    assert any(
        "In(doc_id" in s.split("PushedFilters", 1)[1].split("\n", 1)[0]
        for s in scans
        if "PushedFilters" in s
    ), plan


def test_wand_segment_scan_prunes_by_term(spark, index_store):
    from search_engine_spark.index.build import term_bucket_py

    term = "spark"
    segs = (
        index_store.segments(spark)
        .filter(F.col("tbucket") == term_bucket_py(term))
        .filter(F.col("term") == term)
    )
    plan = _plan(segs)
    # tbucket is a partition dir inside each chunk -> whole-bucket pruning
    assert "PartitionFilters" in plan
    assert "tbucket" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0]


def test_near_chain_scan_prunes_by_term(spark, index_store, oracle_index):
    """The ordered-chain kernel's input scan must carry the same tbucket
    partition pruning + pushed term filter as every other segment serve."""
    from search_engine_spark.query.proximity import near_chain_matches

    terms = sorted(oracle_index.positions)[:3]
    df = near_chain_matches(spark, index_store, terms, 5)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "tbucket" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0]


def test_lm_topk_has_no_window_exchange(spark, index_store):
    """cf(t) comes from the build-time term_stats column (broadcast with
    the stats join) — the LM plan must not contain the per-term Window
    (a maximally skewed shuffle: every posting of a head term in ONE
    partition) the pre-cf serve path used."""
    from search_engine_spark.analysis import analyze_query
    from search_engine_spark.query.lm import lm_dirichlet_topk

    df = lm_dirichlet_topk(spark, index_store, analyze_query("spark index"), k=10)
    plan = _plan(df)
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
