"""Exact-phrase matching over the positional index (J2 + J3).

The reference intersects posting doc-sets term-by-term
(``QueryProcessor.java:150-178``) then checks positional adjacency per doc
(``QueryProcessor.java:226-273``: for each position p of term_1, term_i must
contain p+i-1). Positions are ordinals over the surviving analyzed stream
(``Indexer.java:231-247``), so "fast key" matches even when a stopword stood
between the two words in the raw text — semantics preserved here.

Spark expression: explode positions and equi-join on (doc_id, pos - offset):
each term i contributes rows keyed by (doc_id, p - i); an exact phrase
occurrence is a key present for all n terms. This is a pure shuffle-join
plan — no UDF — so Catalyst can reorder/broadcast as sizes dictate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.storage import IndexStore


def _decode_explode(postings: DataFrame) -> DataFrame:
    """(term, doc_id, tf, doc_len, positions:binary) -> one row per position
    (term, doc_id, doc_len, pos), vectorized varbyte decode per Arrow batch."""
    import numpy as np
    import pandas as pd

    from ..index.codec import varbyte_decode

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tfs = pdf["tf"].to_numpy()
            pos = (
                np.concatenate(
                    [
                        varbyte_decode(bytes(b), int(t))
                        for b, t in zip(pdf["positions"], tfs)
                    ]
                )
                if len(pdf)
                else np.empty(0, dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), tfs),
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), tfs),
                    "doc_len": np.repeat(pdf["doc_len"].to_numpy(), tfs),
                    "pos": pos,
                }
            )

    return postings.mapInPandas(
        decode, schema="term string, doc_id long, doc_len int, pos int"
    )


def decoded_positions(
    spark: SparkSession, store: IndexStore, terms: list[str]
) -> DataFrame:
    """Pruned scan + varbyte decode of the positional postings for a term
    set -> (term, doc_id, doc_len, pos). Exposed so a logical query over two
    phrases can decode the UNION of both sides' terms ONCE and share the
    materialized rows (pipeline.search) instead of running two scan+decode
    pipelines."""
    from ..index.build import term_bucket_py

    n_pos = _n_pos_buckets(store)
    uniq = sorted(set(terms))
    buckets = sorted({term_bucket_py(t, n_pos) for t in uniq})
    postings = (
        store.positions(spark)
        .filter(F.col("tbucket").isin(buckets))  # directory pruning
        .filter(F.col("term").isin(uniq))
        .select("term", "doc_id", "tf", "doc_len", "positions")
    )
    return _decode_explode(postings)


def _n_pos_buckets(store: IndexStore) -> int:
    """Positions bucket count from corpus stats (coarser than postings';
    older indexes predate the field and used the postings count)."""
    cstats = store.corpus_stats()
    return int(cstats.get("n_pos_buckets", cstats.get("n_buckets", 64)))


def phrase_matches(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    exploded: DataFrame | None = None,
) -> DataFrame:
    """Docs containing the exact phrase -> (doc_id, phrase_count, doc_len).

    ``phrase_count`` = number of distinct start positions (the reference's
    matchCount, ``QueryProcessor.java:259-268``). ``exploded`` optionally
    supplies an already-decoded (term, doc_id, doc_len, pos) superset (see
    ``decoded_positions``)."""
    if not terms:
        return spark.createDataFrame([], "doc_id long, phrase_count long, doc_len long")
    if exploded is None and len(terms) == 1:
        # single term: tf IS the match count — serve straight from the
        # compact postings row, no decode needed
        from ..index.build import term_bucket_py
        from ..index.deletes import live_filter

        only = (
            store.positions(spark)
            .filter(F.col("tbucket") == term_bucket_py(terms[0], _n_pos_buckets(store)))
            .filter(F.col("term") == terms[0])
        )
        return live_filter(
            spark,
            store,
            only.select(
                "doc_id",
                F.col("tf").cast("long").alias("phrase_count"),
                "doc_len",
            ),
        )
    if exploded is None:
        exploded = decoded_positions(spark, store, terms)
    if len(terms) == 1:
        from ..index.deletes import live_filter

        m = (
            exploded.filter(F.col("term") == terms[0])
            .groupBy("doc_id", "doc_len")
            .agg(F.count("*").cast("long").alias("phrase_count"))
            .select("doc_id", "phrase_count", "doc_len")
        )
        return live_filter(spark, store, m)
    # start-position candidates from term 0; each further term i must have a
    # position at start + i  (QueryProcessor.java:259-266)
    parts = []
    for i, t in enumerate(terms):
        cols = ["doc_id", "doc_len"] if i == 0 else ["doc_id"]
        part = (
            exploded.filter(F.col("term") == t)
            .select(*cols, (F.col("pos") - F.lit(i)).alias("start"))
        )
        parts.append(part)
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.join(p, ["doc_id", "start"], "inner")
    from ..index.deletes import live_filter

    matches = joined.groupBy("doc_id", "doc_len").agg(
        F.countDistinct("start").alias("phrase_count")
    ).select("doc_id", "phrase_count", "doc_len")
    return live_filter(spark, store, matches)


def phrase_topk(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    k: int | None = 10,
    exploded: DataFrame | None = None,
) -> DataFrame:
    """BM25-score the phrase as a synthetic term (the reference builds a
    synthetic term with its own tf/idf/importance, ``QueryProcessor.java:
    275-355,459-472``): tf = phrase_count, df = |matching docs|."""
    from ..index.codec import BM25_B, BM25_K1

    matches = phrase_matches(spark, store, terms, exploded=exploded)
    cstats = store.corpus_stats()
    n_docs, avgdl = cstats["n_docs"], cstats["avgdl"]
    # df of the synthetic phrase term: broadcast a 1-row count onto the
    # match set — same job as matching (no extra count() action; the
    # reference pays a full extra pass here, QueryProcessor.java:469-472)
    # and, unlike a global window, no single-partition shuffle of matches.
    dfc = matches.agg(F.count("*").alias("df_phrase"))
    matches = matches.crossJoin(F.broadcast(dfc))
    df_phrase = F.col("df_phrase").cast("double")
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - df_phrase + 0.5) / (df_phrase + 0.5)
    )
    tf = F.col("phrase_count").cast("double")
    dl = F.col("doc_len").cast("double")
    impact = tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )
    scored = matches.withColumn("score", idf * impact).select("doc_id", "score")
    if k is None:
        return scored
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
