"""Persisted ANN indexes: IVF (centroid-partitioned) and LSH (bucket-
partitioned).

The adhoc functions in ``similarity.py`` assign/signature the WHOLE corpus
per query — correct, but strictly more work than brute force. The scale
path mirrors the inverted index's build/serve split:

* build time: one pass assigns every vector to its coarse cell (nearest
  centroid, or hyperplane-sign bucket) and writes the vectors PARTITIONED BY
  the cell id — the same layout discipline as postings' ``tbucket`` dirs.
* query time: the centroid table / plane matrix is tiny (K x dim) and lives
  in a driver-side JSON sidecar; probe selection is a driver-side argsort;
  the scan reads ONLY the probed cell directories (Catalyst partition
  pruning — asserted in tests/test_plans.py) and scores exact cosine within
  them. At 10^9+ vectors the probe reads n_probe/K of the data instead of
  re-scanning and re-assigning everything.

Assignment math runs as an Arrow-batched matmul against a broadcast
centroid matrix (O(batch x K) BLAS), not a per-centroid Catalyst expression
tree — the expression form is O(K * dim) codegen and stops compiling at
production centroid counts.

Parity: nearest-centroid uses cosine rounded to 9dp with lowest-centroid-id
tiebreak — exactly the semantics of ``similarity.ivf_assign`` and the
DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import cosine_col


# ---------------------------------------------------------------------------
# assignment kernel (shared by IVF build and k-means rounds)
# ---------------------------------------------------------------------------

def assign_nearest_centroid(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, centroid_id) via broadcast-centroid matmul.
    Max cosine, 9dp rounding, lowest centroid_id tiebreak."""
    spark = emb.sparkSession
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    order = np.argsort(cids)  # ascending cid -> argmax picks lowest on ties
    cmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])[order]
    cids = cids[order]
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    b_cmat = spark.sparkContext.broadcast(cmat / cnorm[:, None])
    b_cids = spark.sparkContext.broadcast(cids)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0.0] = 1.0
            sims = np.round((M / norms[:, None]) @ b_cmat.value.T, 9)
            best = b_cids.value[np.argmax(sims, axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "embedding": pdf[vec_col],
                    "centroid_id": best.astype(np.int32),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema="vec_id long, embedding array<float>, centroid_id int"
    )


# ---------------------------------------------------------------------------
# IVF index
# ---------------------------------------------------------------------------

def _meta_path(index_dir: str) -> Path:
    return Path(index_dir) / "meta.json"


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One assignment pass -> vectors partitioned by centroid_id + a JSON
    sidecar holding the (tiny) centroid matrix."""
    assigned = assign_nearest_centroid(emb, centroids, id_col, vec_col)
    (
        assigned.repartition(max(1, len(centroids) // 4), "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(str(Path(index_dir) / "cells"))
    )
    _meta_path(index_dir).parent.mkdir(parents=True, exist_ok=True)
    _meta_path(index_dir).write_text(
        json.dumps(
            {
                "kind": "ivf",
                "n_centroids": len(centroids),
                "centroids": [[cid, [float(x) for x in v]] for cid, v in centroids],
            }
        )
    )


def ivf_probe_ids(
    centroids: list[tuple[int, list[float]]], qvec: list[float], n_probe: int
) -> list[int]:
    """Driver-side probe selection: n_probe nearest centroids to the query
    (cosine 9dp desc, cid asc — matches the SQL oracle's ORDER BY)."""
    qv = np.asarray(qvec, dtype=np.float64)
    qn = np.linalg.norm(qv) or 1.0

    def cos(v):
        u = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(u)
        return round(float(u @ qv / (n * qn)), 9) if n else -1.0

    ranked = sorted(centroids, key=lambda c: (-cos(c[1]), c[0]))
    return [c[0] for c in ranked[:n_probe]]


def ivf_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Partition-pruned IVF query: read ONLY the probed centroid cells,
    exact cosine within them. The plan's scan must show PartitionFilters on
    centroid_id (tests/test_plans.py)."""
    meta = json.loads(_meta_path(index_dir).read_text())
    centroids = [(int(c), v) for c, v in meta["centroids"]]
    probe = ivf_probe_ids(centroids, qvec, n_probe)
    cells = spark.read.parquet(str(Path(index_dir) / "cells"))
    return (
        cells.filter(F.col("centroid_id").isin(probe))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH index
# ---------------------------------------------------------------------------

def _lsh_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    from .similarity import _lsh_planes_matrix  # one definition everywhere

    return _lsh_planes_matrix(n_planes, dim, seed)


def build_lsh_index(
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Signature pass -> vectors partitioned by hyperplane-sign bucket.
    The plane matrix is regenerable from (n_planes, dim, seed) recorded in
    the sidecar — queries never rescan the corpus."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:  # empty corpus: write an empty-but-valid index
        emb.sparkSession.createDataFrame(
            [], "vec_id long, embedding array<float>, bucket int"
        ).write.mode("overwrite").parquet(str(Path(index_dir) / "buckets"))
        _meta_path(index_dir).parent.mkdir(parents=True, exist_ok=True)
        _meta_path(index_dir).write_text(
            json.dumps({"kind": "lsh", "n_planes": n_planes, "dim": 0, "seed": seed})
        )
        return
    dim = int(dim_row["d"])
    planes = _lsh_planes(n_planes, dim, seed)
    b_planes = emb.sparkSession.sparkContext.broadcast(planes)
    pows = 1 << np.arange(n_planes)

    def sig(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sigs = ((M @ b_planes.value.T) > 0).astype(np.uint8) @ pows
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "embedding": pdf[vec_col],
                    "bucket": sigs.astype(np.int32),
                }
            )

    bucketed = emb.select(id_col, vec_col).mapInPandas(
        sig, schema="vec_id long, embedding array<float>, bucket int"
    )
    (
        bucketed.repartition(max(4, 2**n_planes // 16), "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(str(Path(index_dir) / "buckets"))
    )
    _meta_path(index_dir).parent.mkdir(parents=True, exist_ok=True)
    _meta_path(index_dir).write_text(
        json.dumps({"kind": "lsh", "n_planes": n_planes, "dim": dim, "seed": seed})
    )


def lsh_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    qvec: list[float],
    k: int = 10,
) -> DataFrame:
    """Partition-pruned LSH query: hash the query driver-side, scan only its
    bucket directory."""
    meta = json.loads(_meta_path(index_dir).read_text())
    if meta["dim"] == 0:  # empty index
        return spark.createDataFrame([], "vec_id long, cosine double")
    planes = _lsh_planes(meta["n_planes"], meta["dim"], meta["seed"])
    qv = np.asarray(qvec, dtype=np.float64)
    qsig = int(((planes @ qv) > 0).astype(np.uint8) @ (1 << np.arange(meta["n_planes"])))
    buckets = spark.read.parquet(str(Path(index_dir) / "buckets"))
    return (
        buckets.filter(F.col("bucket") == qsig)
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
