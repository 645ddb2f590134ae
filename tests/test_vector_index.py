"""Persisted ANN indexes: build-time cell assignment, query-time partition
pruning, and result parity with the adhoc (rescan-per-query) paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(0)
    M = rng.standard_normal((300, 16))
    return spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(300)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def first16_centroids(emb):
    rows = emb.orderBy("vec_id").limit(16).collect()
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


@pytest.fixture(scope="module")
def qvec(emb):
    r = emb.filter(F.col("vec_id") == 7).first()
    return [float(x) for x in r["embedding"]]


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, first16_centroids, tmp_path_factory):
    from search_engine_spark.functions.vector_index import build_ivf_index

    d = str(tmp_path_factory.mktemp("ivf"))
    build_ivf_index(emb, d, first16_centroids)
    return d


def test_ivf_indexed_matches_adhoc(spark, emb, qvec, ivf_dir):
    from search_engine_spark.functions.similarity import ivf_topk
    from search_engine_spark.functions.vector_index import ivf_topk_indexed

    adhoc = ivf_topk(emb, qvec, k=10, n_centroids=16, n_probe=4).collect()
    indexed = ivf_topk_indexed(spark, ivf_dir, qvec, k=10, n_probe=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in adhoc] == [
        (r["vec_id"], r["cosine"]) for r in indexed
    ]


def test_ivf_probe_scan_prunes_centroid_partitions(spark, qvec, ivf_dir):
    from search_engine_spark.functions.vector_index import ivf_topk_indexed

    plan = _plan(ivf_topk_indexed(spark, ivf_dir, qvec, k=10, n_probe=4))
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_ivf_assignment_covers_every_vector_once(spark, emb, ivf_dir):
    cells = spark.read.parquet(f"{ivf_dir}/cells")
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    # nearest-centroid invariant: centroid 7's own vector sits in cell 7
    own = cells.filter(F.col("vec_id") == 7).first()
    assert int(own["centroid_id"]) == 7


@pytest.fixture(scope="module")
def lsh_dir(spark, emb, tmp_path_factory):
    from search_engine_spark.functions.vector_index import build_lsh_index

    d = str(tmp_path_factory.mktemp("lsh"))
    build_lsh_index(emb, d, n_planes=8, seed=42)
    return d


def test_lsh_indexed_matches_adhoc(spark, emb, qvec, lsh_dir):
    from search_engine_spark.functions.similarity import lsh_bucket_topk
    from search_engine_spark.functions.vector_index import lsh_topk_indexed

    adhoc = lsh_bucket_topk(emb, qvec, k=10, n_planes=8, seed=42).collect()
    indexed = lsh_topk_indexed(spark, lsh_dir, qvec, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in adhoc] == [
        (r["vec_id"], r["cosine"]) for r in indexed
    ]
    assert indexed and indexed[0]["vec_id"] == 7  # query finds itself


def test_lsh_bucket_scan_prunes_partitions(spark, qvec, lsh_dir):
    from search_engine_spark.functions.vector_index import lsh_topk_indexed

    plan = _plan(lsh_topk_indexed(spark, lsh_dir, qvec, k=10))
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_embedding_dup_pairs_finds_planted_dups(spark):
    """Planted near-duplicates (vector + tiny noise -> cosine ~0.9999) must
    survive the LSH bucket blocking and the cosine threshold; random pairs
    must not."""
    from search_engine_spark.functions.similarity import embedding_dup_pairs

    rng = np.random.default_rng(3)
    M = rng.standard_normal((100, 16))
    M[50] = M[0] + 1e-4 * rng.standard_normal(16)  # near-dup of 0
    M[51] = M[1] + 1e-4 * rng.standard_normal(16)  # near-dup of 1
    emb = spark.createDataFrame(
        [(i, M[i].astype(np.float32).tolist()) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in embedding_dup_pairs(emb, threshold=0.95).collect()}
    assert (0, 50) in pairs and (1, 51) in pairs
    assert all(c >= 0.95 for c in pairs.values())
    assert len(pairs) == 2  # random vectors don't reach 0.95


def test_lsh_index_empty_corpus(spark, tmp_path_factory):
    from search_engine_spark.functions.vector_index import (
        build_lsh_index,
        lsh_topk_indexed,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    d = str(tmp_path_factory.mktemp("lshe"))
    build_lsh_index(empty, d)
    assert lsh_topk_indexed(spark, d, [1.0, 0.0], k=5).count() == 0


def test_kmeans_ivf_index_roundtrip(spark, emb, qvec, tmp_path_factory):
    from search_engine_spark.functions.similarity import (
        cosine_topk,
        kmeans_centroids,
    )
    from search_engine_spark.functions.vector_index import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    cents = kmeans_centroids(emb, n_centroids=8, n_iter=3)
    d = str(tmp_path_factory.mktemp("ivfkm"))
    build_ivf_index(emb, d, cents)
    got = ivf_topk_indexed(spark, d, qvec, k=5, n_probe=4).collect()
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=5).collect()]
    assert got[0]["vec_id"] == 7
    assert len({r["vec_id"] for r in got} & set(exact)) >= 3
