"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k, JVM-side arithmetic
  (zip_with + aggregate; no Python in the row path). The scale baseline:
  a full scan that Catalyst parallelizes per partition, merged by
  TakeOrderedAndProject.
* ``ivf_topk`` — the scale path: deterministic IVF with the first
  ``n_centroids`` vectors as centroids (kmeans init step; deterministic so
  the oracle can replay it). Vectors are assigned to their nearest centroid
  at "build" time; a query probes only the ``n_probe`` nearest centroid
  cells, cutting the scan by ~n_centroids/n_probe.
* ``lsh_bucket_topk`` — random-hyperplane LSH variant (numpy, seeded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def cosine_topk(
    emb: DataFrame, qvec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k; ties by id asc."""
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_assign(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, 9dp rounding;
    centroid-id asc tiebreak). ``centroids`` = [(centroid_id, vector)].

    Implemented as an Arrow-batched matmul against a broadcast centroid
    matrix (vector_index.assign_nearest_centroid): O(batch x K) BLAS instead
    of a per-centroid Catalyst expression tree, which is O(K * dim) codegen
    and stops compiling at production centroid counts."""
    from .vector_index import assign_nearest_centroid

    return assign_nearest_centroid(emb, centroids, id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: centroids = embeddings of the ``n_centroids``
    smallest ids (deterministic); probe the n_probe centroid cells nearest
    to the query; exact cosine within the probed cells.

    This adhoc variant re-assigns the corpus per call — it is the parity
    baseline. The SERVE path is ``vector_index.ivf_topk_indexed`` over a
    persisted centroid-partitioned index (partition-pruned probes; see
    tests/test_vector_index.py for the identity assertion)."""
    cent_rows = (
        emb.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    centroids = [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in cent_rows]
    qv = np.asarray(qvec, dtype=np.float64)

    def cos(u):
        u = np.asarray(u, dtype=np.float64)
        return float(u @ qv / (np.linalg.norm(u) * np.linalg.norm(qv)))

    # round to 9dp so probe choice matches the SQL oracle's tie handling
    probe = sorted(centroids, key=lambda c: (-round(cos(c[1]), 9), c[0]))[:n_probe]
    probe_ids = [c[0] for c in probe]
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucket_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bits of dot(v, plane_j); scan the
    query's bucket only (numpy inside mapInPandas; planes seeded)."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(qvec, dtype=np.float64)
    qsig = int(((planes @ qv) > 0).astype(np.uint8) @ (1 << np.arange(n_planes)))
    b_planes = emb.sparkSession.sparkContext.broadcast(planes)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sigs = ((M @ b_planes.value.T) > 0).astype(np.uint8) @ (
                1 << np.arange(n_planes)
            )
            mask = sigs == qsig
            if not mask.any():
                continue
            sub = M[mask]
            cos = sub @ qv / (np.linalg.norm(sub, axis=1) * np.linalg.norm(qv))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy()[mask],
                    "cosine": np.round(cos, 6),
                }
            )

    return (
        emb.mapInPandas(score, schema="vec_id long, cosine double")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup op, not top-k):
    (vec_a, vec_b, cosine) with cosine >= threshold among pairs sharing a
    random-hyperplane LSH bucket.

    Scale shape: the candidate join is keyed on the bucket (like
    minhash_lsh_pairs' banded join) — cost scales with bucket collisions,
    never all-pairs. High-cosine pairs almost always share the bucket at
    modest n_planes (P[agree] = (1 - theta/pi)^n_planes); the exact cosine
    is then verified JVM-side on the candidates only."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return emb.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cosine double"
        )
    planes = _lsh_planes_matrix(n_planes, int(dim_row["d"]), seed)
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
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
        6,
    )
    return (
        cand.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _lsh_planes_matrix(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Seeded random hyperplanes (shared with vector_index.build_lsh_index
    and the inlined-literal SQL oracle)."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations for IVF coarse quantization: init =
    the n_centroids lowest-id vectors, then n_iter assign/mean rounds as
    DataFrame jobs (assignment is JVM-side; only the K centroid means are
    collected per round — nothing corpus-sized reaches the driver)."""
    cent_rows = (
        emb.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    centroids = [(int(i), [float(x) for x in r["cv"]]) for i, r in enumerate(cent_rows)]
    dim = len(centroids[0][1])
    for _ in range(n_iter):
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
        # per-dim means via posexplode + hash agg (K*dim tiny rows collected;
        # the per-dim element_at expression tree would be O(dim) codegen)
        rows = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in rows:
            new.setdefault(int(r["centroid_id"]), [0.0] * dim)[int(r["pos"])] = float(r["m"])
        centroids = [
            (cid, new.get(cid, cv)) for cid, cv in centroids  # keep empty cells
        ]
    return centroids


def ivf_kmeans_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with k-means-trained centroids (the production shape of
    ``ivf_topk``; not SQL-expressible -> verified by recall tests)."""
    centroids = kmeans_centroids(emb, n_centroids, n_iter, vec_col, id_col)
    qv = np.asarray(qvec, dtype=np.float64)

    def cos(u):
        u = np.asarray(u, dtype=np.float64)
        n = np.linalg.norm(u)
        return float(u @ qv / (n * np.linalg.norm(qv))) if n else -1.0

    probe = sorted(centroids, key=lambda c: (-round(cos(c[1]), 9), c[0]))[:n_probe]
    probe_ids = [c[0] for c in probe]
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
