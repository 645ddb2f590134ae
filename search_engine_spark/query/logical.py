"""Boolean combination of two scored candidate sets (J4/J5/J6).

The reference merges candidate maps (``QueryProcessor.java:401-432``):
AND = key intersection, OR = key union, NOT = left key difference, then the
ranker scores the merged candidates. With each side reduced to its scored
candidate DataFrame (phrase/term sides are disjoint synthetic terms), the
equivalent relational forms are:

    AND -> inner join,  score = score_l + score_r
    OR  -> full outer,  score = coalesce(l,0) + coalesce(r,0)
    NOT -> left anti,   score = score_l
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine(
    left: DataFrame, right: DataFrame, op: str, k: int | None = 10
) -> DataFrame:
    """``k=None`` returns the full combined set unordered — the inner-node
    form for nested boolean trees (only the ROOT takes the top-k cut, so
    Catalyst keeps every intermediate as a plain join with no exchange
    for ordering)."""
    l = left.select("doc_id", F.col("score").alias("score_l"))
    r = right.select("doc_id", F.col("score").alias("score_r"))
    if op == "AND":
        out = l.join(r, "doc_id", "inner").select(
            "doc_id", (F.col("score_l") + F.col("score_r")).alias("score")
        )
    elif op == "OR":
        out = l.join(r, "doc_id", "full_outer").select(
            "doc_id",
            (
                F.coalesce(F.col("score_l"), F.lit(0.0))
                + F.coalesce(F.col("score_r"), F.lit(0.0))
            ).alias("score"),
        )
    elif op == "NOT":
        out = l.join(r, "doc_id", "left_anti").select(
            "doc_id", F.col("score_l").alias("score")
        )
    else:
        raise ValueError(f"unknown logical op: {op}")
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
