"""End-to-end search: query string -> ranked, enriched top-k.

Mirrors the reference lifecycle (SURVEY.md §3.1): parse/classify
(``QueryProcessor.java:49-79``) -> retrieval -> ranking -> metadata
enrichment (``QueryProcessor.java:280-296``) -> snippets. Retrieval engine
is selectable: ``"df"`` (pure-DataFrame BM25) or ``"wand"`` (block-max WAND
over compressed segments) — both rank-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..analysis.analyzer import tokenize
from ..index.storage import IndexStore
from .bm25 import bm25_topk
from .logical import combine
from .parser import ParsedQuery, parse_query
from .phrase import phrase_topk
from .snippets import add_snippets
from .wand import bm25_topk_wand


def _score_side(
    spark: SparkSession, store: IndexStore, pq: ParsedQuery, engine: str,
    k: int | None,
) -> DataFrame:
    if pq.kind == "phrase":
        return phrase_topk(spark, store, pq.terms or [], k=k)
    if engine == "wand" and k is not None:
        return bm25_topk_wand(spark, store, pq.terms or [], k=k)
    return bm25_topk(spark, store, pq.terms or [], k=k)


def search(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    k: int = 10,
    engine: str = "df",
    with_metadata: bool = True,
) -> DataFrame:
    """Returns top-k rows: (rank, doc_id, score [, conv_id, turn_idx, role,
    ts, snippet]) — the shape of the reference's RankedDocument
    (``Ranker/RankedDocument.java:3-54``)."""
    pq = parse_query(query)
    if pq.kind == "logical":
        left = _score_side(spark, store, pq.left, engine, k=None)
        right = _score_side(spark, store, pq.right, engine, k=None)
        topk = combine(left, right, pq.op, k=k)
    else:
        topk = _score_side(spark, store, pq, engine, k=k)

    topk = topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if not with_metadata:
        return topk

    # enrich the k rows only: broadcast the top-k side of the join (J7/S6)
    docs = store.docs(spark).select(
        "doc_id", "conv_id", "turn_idx", "role", "ts", "text"
    )
    enriched = docs.join(F.broadcast(topk), "doc_id", "inner")
    raw_tokens = tokenize(pq.raw.replace('"', " "))
    enriched = add_snippets(enriched, raw_tokens)
    # Window over <= k rows — driver-size safe by construction.
    w_rank = (
        enriched.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
    )
    return w_rank.select(
        "rank", "doc_id", "score", "conv_id", "turn_idx", "role", "ts", "snippet"
    )
