"""Proximity (NEAR/w) matching: docs where two terms co-occur within a
position window, served from the positional segment family.

The reference engine has no proximity operator (its QueryProcessor matches
exact phrases only, ``QueryProcessor.java:226-273``); this is the standard
fulltext extension (Lucene's sloppy ``PhraseQuery`` / ``SpanNearQuery``,
unordered form): ``a NEAR/3 b`` matches a doc when some position of ``a``
and some position of ``b`` differ by at most 3 ordinals (positions are
ordinals over the surviving analyzed stream — stopwords between the words
don't widen the gap, same convention as the phrase path).

Spark plan — identical shape to the phrase segment path (the 100 TB plan):
pruned columnar scan of the two terms' segment rows (tbucket partition
dirs + pushed term filter, scored blobs + positional stream only), ONE
shuffle of compressed per-(term, drange) blobs grouped by drange, then a
per-range kernel that intersects the compact docID streams, block-skip
decodes only the candidate docs' positional blocks
(``phrase.gather_candidate_keys``), and counts qualifying pairs with two
``searchsorted`` probes per occurrence of the rarer side — no pair
materialization, no per-doc Python loop.

``pair_count`` = |{(pa, pb) : |pa - pb| <= w}| per doc — the natural
tf analog for proximity scoring (``near_topk`` feeds it through the same
synthetic-term BM25 as phrase matches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.storage import IndexStore
from .phrase import (
    _POS_BITS,
    decode_segment_parts,
    gather_candidate_keys,
    score_phrase_matches,
)

# gather_candidate_keys guarantees pos < 2^_POS_BITS - 64, so a window up
# to 63 can never carry pa + w across the composite key's docID boundary
MAX_WINDOW = 63


def _near_kernel(term_a: str, term_b: str, window: int):
    """applyInPandas kernel over ONE doc-range's segment rows: emits
    (doc_id, pair_count, doc_len) for docs where ``term_a`` and ``term_b``
    co-occur within ``window`` positions."""

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "pair_count": pd.Series(dtype="int64"),
            "doc_len": pd.Series(dtype="int64"),
        }
    )

    def shard(pdf: pd.DataFrame) -> pd.DataFrame:
        parts_of = decode_segment_parts(pdf)
        if term_a not in parts_of or term_b not in parts_of:
            return empty

        def ids_of(t: str) -> np.ndarray:
            ps = parts_of[t]
            if len(ps) == 1:
                return ps[0]["ids"]
            return np.concatenate([p["ids"] for p in ps])

        cand = np.intersect1d(
            ids_of(term_a), ids_of(term_b), assume_unique=True
        )
        if cand.size == 0:
            return empty
        ga = gather_candidate_keys(parts_of[term_a], cand)
        gb = gather_candidate_keys(parts_of[term_b], cand)
        if ga is None or gb is None:
            return empty
        keys_a, dl_ids, dl_vals = ga
        keys_b = gb[0]
        # per occurrence of a: count b-positions in [pa - w, pa + w],
        # clamped to the doc's own key block (pa - w may underflow into the
        # previous doc's high positions; pa + w cannot overflow — gather
        # guarantees pos < 2^_POS_BITS - 64 and w <= 63)
        doc_floor = (keys_a >> _POS_BITS) << _POS_BITS
        lo = np.maximum(keys_a - window, doc_floor)
        hi = keys_a + window
        cnt = np.searchsorted(keys_b, hi, side="right") - np.searchsorted(
            keys_b, lo, side="left"
        )
        if not cnt.any():
            return empty
        docs = keys_a >> _POS_BITS
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.bincount(inv, weights=cnt).astype(np.int64)
        keep = sums > 0
        mdoc = uniq[keep]
        # doc_len lookup: one posting per (term, doc) -> dl_ids unique asc
        dl_idx = np.searchsorted(dl_ids, mdoc)
        return pd.DataFrame(
            {
                "doc_id": mdoc,
                "pair_count": sums[keep],
                "doc_len": dl_vals[dl_idx].astype(np.int64),
            }
        )

    return shard


def near_matches(
    spark: SparkSession,
    store: IndexStore,
    term_a: str,
    term_b: str,
    window: int,
) -> DataFrame:
    """Docs where ``term_a`` and ``term_b`` (analyzed terms) co-occur
    within ``window`` positions: (doc_id, pair_count, doc_len), tombstone-
    filtered. Served entirely from the segment family — see module doc."""
    from ..index.build import term_bucket_py
    from ..index.deletes import live_filter

    if term_a == term_b:
        raise ValueError("NEAR requires two distinct analyzed terms")
    if not (1 <= int(window) <= MAX_WINDOW):
        raise ValueError(f"NEAR window must be in [1, {MAX_WINDOW}]")
    cstats = store.corpus_stats()
    n_buckets = int(cstats.get("n_buckets", 64))
    terms = sorted({term_a, term_b})
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    segs = (
        store.segments(spark)
        .filter(F.col("tbucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "drange", "postings", "positions")
    )
    matched = segs.groupBy("drange").applyInPandas(
        _near_kernel(term_a, term_b, int(window)),
        schema="doc_id long, pair_count long, doc_len long",
    )
    return live_filter(spark, store, matched)


def near_topk(
    spark: SparkSession,
    store: IndexStore,
    term_a: str,
    term_b: str,
    window: int,
    k: int | None = 10,
) -> DataFrame:
    """Top-k NEAR/w docs scored like a synthetic phrase term (BM25 with
    tf = pair_count, df = |matching docs|) — the same scoring the phrase
    path applies to exact-adjacency matches."""
    matches = near_matches(spark, store, term_a, term_b, window).select(
        "doc_id",
        F.col("pair_count").alias("phrase_count"),
        "doc_len",
    )
    return score_phrase_matches(spark, store, matches, k=k)
