"""Token-budget sequence packing (functions/packing.py): greedy-rule
identity with a driver-side reference, budget invariants, determinism
across physical layouts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.packing import pack_sequences, packed_stats

BUDGET = 100


def _reference(rows, n_shards, budget):
    """Driver-side greedy pack: dict (doc_id -> (shard, seq_idx))."""
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n in rows:
        by_shard.setdefault(doc_id % n_shards, []).append((doc_id, n))
    out = {}
    for shard, docs in by_shard.items():
        seq, run = 0, 0
        for doc_id, n in sorted(docs):
            if run > 0 and run + n > budget:
                seq, run = seq + 1, 0
            run += n
            out[doc_id] = (shard, seq)
    return out


@pytest.fixture(scope="module")
def sized_rows():
    rng = random.Random(7)
    # sizes spanning tiny, typical, boundary-exact, and oversized (> budget)
    return [(i, rng.choice([1, 7, 30, 50, 100, 130])) for i in range(300)]


def test_matches_reference_greedy(spark, sized_rows):
    df = spark.createDataFrame(sized_rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["seq_idx"])
        for r in pack_sequences(
            df, BUDGET, n_shards=4, tokens_col="n_tokens"
        ).collect()
    }
    assert got == _reference(sized_rows, 4, BUDGET)


def test_budget_invariant(spark, sized_rows):
    df = spark.createDataFrame(sized_rows, "doc_id long, n_tokens long")
    asg = pack_sequences(df, BUDGET, n_shards=4, tokens_col="n_tokens")
    stats = packed_stats(asg, BUDGET)
    # any sequence over budget must be a single oversized document
    bad = stats.filter(
        (F.col("seq_tokens") > BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert bad == 0
    assert asg.count() == len(sized_rows)  # nothing dropped


def test_deterministic_across_layouts(spark, sized_rows):
    df = spark.createDataFrame(sized_rows, "doc_id long, n_tokens long")
    a = pack_sequences(df, BUDGET, n_shards=4, tokens_col="n_tokens")
    b = pack_sequences(
        df.repartition(13).sortWithinPartitions(F.desc("doc_id")),
        BUDGET, n_shards=4, tokens_col="n_tokens",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_counts_tokens_from_text(spark):
    docs = spark.createDataFrame(
        [(0, "one two three"), (1, "a,b"), (2, "x" * 5)],
        "doc_id long, text string",
    )
    asg = pack_sequences(docs, 10, n_shards=1)
    got = {r["doc_id"]: r["n_tokens"] for r in asg.collect()}
    assert got == {0: 3, 1: 3, 2: 1}  # 'a,b' -> a , b


def test_rejects_bad_budget(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
