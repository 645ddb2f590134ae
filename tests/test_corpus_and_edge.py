"""Corpus generator properties (FIXTURES.md §1) and engine edge cases."""

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.corpus import (
    HEAD_TERMS,
    generate_pandas,
    generate_spark,
    n_turns_for,
)


def test_generator_pandas_spark_parity(spark):
    pdf = generate_pandas(12, seed=42).sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    sdf = (
        generate_spark(spark, 12, seed=42)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert (pdf["text"] == sdf["text"]).all()
    assert (pdf["role"] == sdf["role"]).all()
    assert (pdf["ts"] == sdf["ts"]).all()
    assert len(pdf) == n_turns_for(12)


def test_generator_has_head_terms_and_dups():
    pdf = generate_pandas(80, seed=42)
    blob = " ".join(pdf["text"]).lower()
    for t in HEAD_TERMS[:4]:
        assert blob.count(t) > 20, t  # deliberately hot terms (skew)
    # duplicated turns exist (sha2 dedup exercise)
    assert pdf["text"].duplicated().any()
    # analyzer stressors present
    assert pdf["text"].str.contains(",").any()
    assert pdf["text"].str.contains(r"[A-Z]{2,}", regex=True).any()
    assert pdf["text"].str.contains(r"\d", regex=True).any()


def test_generator_seed_sensitivity():
    a = generate_pandas(5, seed=42)
    b = generate_pandas(5, seed=43)
    assert not (a["text"] == b["text"]).all()


def test_empty_corpus_build_and_query(spark, tmp_path):
    from search_engine_spark.index.builder import build_index
    from search_engine_spark.query.pipeline import search

    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    store = build_index(spark, empty, str(tmp_path / "ix"), n_chunks=2)
    assert store.corpus_stats()["n_docs"] == 0
    for engine in ("df", "wand"):
        got = search(
            spark, store, "anything at all", k=5, engine=engine,
            with_metadata=False,
        ).collect()
        assert got == []


def test_single_doc_corpus(spark, tmp_path):
    from search_engine_spark.index.builder import build_index
    from search_engine_spark.query.pipeline import search

    one = pd.DataFrame(
        [{
            "conv_id": "conv_00000000", "turn_idx": 0, "role": "user",
            "text": "solitary document about spark indexing",
            "tool": "", "ts": pd.Timestamp("2025-01-01"),
        }]
    )
    store = build_index(spark, spark.createDataFrame(one), str(tmp_path / "ix1"))
    for engine in ("df", "wand"):
        got = search(spark, store, "spark", k=5, engine=engine,
                     with_metadata=False).collect()
        assert [r["doc_id"] for r in got] == [0], engine
