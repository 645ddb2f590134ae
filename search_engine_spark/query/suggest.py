"""Dictionary-driven query assistance: wildcard (prefix) expansion and
spell suggestion over the index's term dictionary.

The reference engine looks up exact terms only
(``QueryProcessor/QueryProcessor.java:533``); these widen the query surface
the way production fulltext engines do: ``mach*`` expands to the highest-df
dictionary terms with that prefix and scores them as an OR of BM25
contributions, and a misspelled term gets edit-distance suggestions ranked
by (distance, df). Both operate on ``term_stats`` — the dictionary table,
|vocab| rows (millions at 10^12 turns, still ~10^-6 of the postings).

Scale notes:
* prefix lookup pushes a ``StartsWith`` predicate into the parquet scan —
  term_stats rows are written term-sorted within tbucket partitions, so
  row-group min/max statistics skip everything outside the prefix range;
  the result is TakeOrderedAndProject over (df desc, term), and only the
  <= ``limit`` chosen expansion terms ever reach the driver (they become
  ordinary query terms, exactly like user-typed ones).
* spell suggestion pushes a LENGTH BAND first — ``|len(t) - len(q)| <=
  max_dist`` is a provable levenshtein lower bound — so the quadratic
  edit-distance evaluator runs on the surviving sliver, JVM-side
  (``F.levenshtein``, no Python).
* in a stemmed index the dictionary holds stemmed forms; wildcard/fuzzy
  matching against stemmed terms is the standard engine behavior (the
  prefix bypasses query-time stemming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.storage import IndexStore

PREFIX_EXPAND_LIMIT = 8


def expand_prefix(
    spark: SparkSession, store: IndexStore, prefix: str,
    limit: int = PREFIX_EXPAND_LIMIT,
) -> list[str]:
    """Top-``limit`` dictionary terms starting with ``prefix``, by
    (df desc, term asc) — deterministic under df ties. Returns a plain
    term list: expansion terms join the query's analyzed terms with
    qtf = 1 each (duplicates with literal query terms accumulate qtf,
    like repeated user-typed terms)."""
    p = (prefix or "").lower()
    if not p:
        return []
    rows = (
        store.term_stats(spark)
        .filter(F.col("term").startswith(p))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(int(limit))
        .collect()
    )
    return [r["term"] for r in rows]


def spell_suggest(
    spark: SparkSession, store: IndexStore, word: str,
    max_dist: int = 2, k: int = 5,
) -> DataFrame:
    """Did-you-mean candidates for ``word``: dictionary terms within
    ``max_dist`` edits, ranked by (dist asc, df desc, term asc), top ``k``.
    Returns (term, df, dist)."""
    w = (word or "").lower()
    L = len(w)
    cand = store.term_stats(spark).filter(
        (F.length("term") >= L - max_dist) & (F.length("term") <= L + max_dist)
    )
    return (
        cand.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.levenshtein(F.col("term"), F.lit(w)).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(int(k))
    )


FUZZY_EXPAND_LIMIT = 8


def expand_fuzzy(
    spark: SparkSession, store: IndexStore, word: str,
    max_dist: int = 2, limit: int = FUZZY_EXPAND_LIMIT,
) -> list[str]:
    """Top-``limit`` dictionary terms within ``max_dist`` edits of ``word``
    (Lucene FuzzyQuery semantics), ranked (dist asc, df desc, term asc) —
    ``spell_suggest``'s scan (pushed length-band filter + JVM levenshtein)
    collected into a plain term list: expansion terms join the query with
    qtf = 1 each, exactly like wildcard expansions. ≤ ``limit`` terms ever
    reach the driver; they become ordinary query terms from there."""
    rows = spell_suggest(spark, store, word, max_dist=max_dist, k=limit)
    return [r["term"] for r in rows.collect()]
