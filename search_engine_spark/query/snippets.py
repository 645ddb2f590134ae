"""Query-time snippet extraction + highlighting (T5/T8).

The reference precomputes up to 3 snippets per (term, doc) at index time
(``Indexer/Indexer.java:261-301,363-381``) — which does not scale to 10^12
turns — then re-ranks/joins them at query time
(``QueryProcessor.java:596-707``). Here snippets are computed lazily on the
FINAL top-k rows only (SURVEY.md T5 note): ±150-char window around the first
matching token, snapped to sentence bounds, with ``<strong>`` highlighting of
query tokens preserving original case (``QueryProcessor.java:667-689``).
Runs as an Arrow-batched pandas UDF over k rows — negligible cost.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

WINDOW = 150  # chars each side, Indexer.java:266


def make_snippet(text: str, query_tokens: list[str]) -> str:
    if not text:
        return ""
    low = text.lower()
    hit = -1
    for tok in query_tokens:
        p = low.find(tok.lower())
        if p >= 0 and (hit < 0 or p < hit):
            hit = p
    if hit < 0:
        snippet = text[: 2 * WINDOW]
    else:
        start = max(0, hit - WINDOW)
        end = min(len(text), hit + WINDOW)
        # snap to sentence bounds (Indexer.java:272-287)
        dot = text.rfind(". ", 0, start)
        if dot >= 0 and start - dot < WINDOW:
            start = dot + 2
        dot = text.find(". ", end)
        if dot >= 0 and dot - end < WINDOW:
            end = dot + 1
        snippet = text[start:end]
    if query_tokens:
        pat = re.compile(
            r"\b(" + "|".join(re.escape(t) for t in query_tokens) + r")\b",
            re.IGNORECASE,
        )
        snippet = pat.sub(lambda m: f"<strong>{m.group(1)}</strong>", snippet)
    return snippet.strip()


def add_snippets(topk_with_text: DataFrame, query_tokens: list[str]) -> DataFrame:
    toks = [t for t in query_tokens if t]

    @pandas_udf("string")
    def snip(texts: pd.Series) -> pd.Series:
        return pd.Series([make_snippet(t or "", toks) for t in texts])

    return topk_with_text.withColumn("snippet", snip(F.col("text")))
