"""Deterministic, engine-portable sampling for training-data pipelines.

A 100 TB dataset is sampled by HASH BUCKETS, not RNG: the keep decision is
a pure function of the row key, so it is reproducible across runs, engines,
and partitionings, needs no seed state or shuffle, and composes with
incremental rebuilds (the same row always lands on the same side). The hash
is md5 — identical in Spark and DuckDB (the same portability trick the
minhash dedup family uses) — so every sample is oracle-checkable.

Keep rule: the first 8 hex chars of ``md5(key || '|' || salt)`` compared
lexicographically against ``hex(fraction * 16^8)``; lowercase hex compares
lexicographically exactly like the underlying 32-bit integer, so the rule
keeps a ``fraction`` share of keys uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fraction_threshold(fraction: float) -> str:
    """Hex threshold for an 8-hex-char uniform hash: 'g' sorts above every
    hex string (keep all), '00000000' sorts below or equal to none."""
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return "00000000"
    return format(int(fraction * 16 ** 8), "08x")


def hash_sample_keep(key: Column, fraction: float, salt: str = "s") -> Column:
    """Boolean keep column: deterministic ``fraction``-share sample of the
    key space. Pure map-side — no shuffle, no RNG."""
    h = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, 8
    )
    return h < F.lit(_fraction_threshold(fraction))


def stratified_sample(
    df: DataFrame,
    stratum: Column,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value keeps its own
    fraction of rows (e.g. keep 50% of English docs, 10% of everything
    else). The threshold is a per-row CASE on the stratum — still one
    map-side filter, no per-stratum passes, no shuffle."""
    thr = None
    for value, frac in sorted(fractions.items()):
        lit = F.lit(_fraction_threshold(frac))
        thr = (
            F.when(stratum == value, lit)
            if thr is None
            else thr.when(stratum == value, lit)
        )
    thr_col = (
        thr.otherwise(F.lit(_fraction_threshold(default_fraction)))
        if thr is not None
        else F.lit(_fraction_threshold(default_fraction))
    )
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))),
        1,
        8,
    )
    return df.filter(h < thr_col)
