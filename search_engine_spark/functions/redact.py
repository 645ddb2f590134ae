"""PII redaction for training-data pipelines: regex masking of emails /
SSN-shaped ids / phone-shaped numbers, with per-type match counts.

A corpus headed for model training gets scrubbed before tokenization; this
is the map-only Spark pass that does it. The reference has no analog (its
crawler stores raw page text); patterns are the portable common core —
no backreferences or lookaround, so Java regex (Spark) and RE2 (DuckDB
oracle) agree byte-for-byte, and the DuckDB twin replays the same literals.

Scale: per-row Catalyst ``regexp_replace`` / ``regexp_extract_all`` — NO
shuffle, no UDF; at 100 TB it is a map-only pass bounded by scan bandwidth.
Masking runs most-specific-first (SSN before phone) so one span is never
double-counted by two patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: applied (and counted) in this sequence on the progressively
# masked text, so overlapping shapes can't double-fire
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+", "<EMAIL>"),
    ("ssn", r"\d\d\d-\d\d-\d\d\d\d", "<SSN>"),
    ("phone", r"\d\d\d[- ]\d\d\d[- ]\d\d\d\d", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean, n_email, n_ssn, n_phone): the text with every PII
    span replaced by its type tag, plus how many spans each pattern hit."""
    cur = F.col(text_col)
    counts = []
    for name, pat, tag in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tag)
    return docs.select(
        F.col(id_col).alias("doc_id"), cur.alias("clean"), *counts
    )
