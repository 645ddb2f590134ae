"""Faceted search: aggregate a query's FULL match set by metadata fields.

Lucene-parity feature (the ``facet`` module: per-dimension value counts
computed while collecting matches) plus the total-hit count
(``TotalHitCountCollector``). The reference engine returns only ranked
pages; a production fulltext index also answers "how many matches, broken
down by source / role / date" — the aggregation side of the same match
set.

Scale shape (100 TB story): the match set is the standard tbucket-pruned
posting scan -> per-doc score agg -> live filter (no top-k cut — facets
are over ALL matches). The facet dimensions join on doc_id (plain shuffle
equi-join, AQE picks broadcast when the dim side is small) and the counts
are a map-side-combinable hash aggregate on the facet values — cardinality
of the OUTPUT is |distinct facet values|, never |matches|. Nothing is
collected driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.storage import IndexStore


def facet_counts(
    matches: DataFrame,
    dims: DataFrame,
    facet_cols: list[str],
    score_col: str = "score",
    dedup_dims: bool = False,
) -> DataFrame:
    """(facet..., n_docs, max_score, sum_score) per facet-value combination.

    ``matches``: (doc_id, score) relation — typically the full live match
    set of a query. ``dims``: any doc_id-keyed relation carrying the facet
    columns (the index's doc registry, or an external metadata table).
    ``dedup_dims``: set when the dim table may repeat doc_ids — it costs a
    doc_id shuffle of the WHOLE dim table, so it stays off for the normal
    case (the doc registry is unique by construction)."""
    dim_rel = dims.select("doc_id", *facet_cols)
    if dedup_dims:
        dim_rel = dim_rel.dropDuplicates(["doc_id"])
    joined = matches.join(dim_rel, "doc_id")
    return joined.groupBy(*facet_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max(score_col).alias("max_score"),
        F.sum(score_col).alias("sum_score"),
    )


def search_facets(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    dims: DataFrame,
    facet_cols: list[str],
) -> DataFrame:
    """Facet counts over the full BM25 match set (OR semantics — every
    live document containing at least one query term, like Lucene
    collecting facets for every hit of a BooleanQuery)."""
    from .bm25 import bm25_topk

    matches = bm25_topk(spark, store, terms, k=None)
    return facet_counts(matches, dims, facet_cols)


def filtered_topk(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    allowed: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k restricted to an allowed doc set (Lucene BooleanQuery FILTER
    clause): the predicate constrains WHICH documents may match but does
    not touch scoring — tf/df/idf/avgdl stay corpus-global, exactly like
    a filter clause contributing no score.

    ``allowed``: any relation with a doc_id column (typically a pushed-
    predicate scan of the doc registry or an external metadata table).
    Scale shape: the match set is already term-pruned; the semi-join on
    doc_id is a plain equi-join AQE can broadcast when the filter side is
    small, and the top-k cut happens after it, so no ordering exchange
    runs over unfiltered candidates."""
    from .bm25 import bm25_topk

    matches = bm25_topk(spark, store, terms, k=None)
    # left_semi: emits each match at most once regardless of duplicate
    # doc_ids on the filter side — no dedup pass needed
    out = matches.join(allowed.select("doc_id"), "doc_id", "left_semi")
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def total_hits(spark: SparkSession, store: IndexStore, terms: list[str]) -> DataFrame:
    """Total live match count for the query (TotalHitCountCollector):
    one row (n_hits). The per-doc score agg is still needed to dedup
    multi-term hits to distinct documents; the count itself is a scalar
    aggregate — nothing wide ever leaves the executors."""
    from .bm25 import bm25_topk

    matches = bm25_topk(spark, store, terms, k=None)
    return matches.agg(F.count("*").cast("long").alias("n_hits"))
