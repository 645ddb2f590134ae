"""Block-Max WAND top-k over the compressed segment index.

The reference scores EVERY candidate then globally sorts
(``Ranker/ParallelRanker.java:18-33``) — O(candidates). Block-Max WAND
(Broder et al. 2003; Ding & Suel 2011) skips documents whose score upper
bound cannot enter the top-k, using per-block max impacts stored at build
time (codec.py).

Distribution model: segments are grouped by ``drange`` (docID range shard).
Each shard holds every query term's postings restricted to its range, so
document-at-a-time traversal is shard-local; each shard emits its local
top-k and the driver merge is ``TakeOrderedAndProject`` over shards — the
two-level top-k from SURVEY.md §3.1.

Correctness with ties: docIDs are traversed ascending and ties break by
doc_id ascending, so pruning with ``upper_bound <= threshold`` (strict
keep-if-greater) is exact.
"""

from __future__ import annotations

import heapq
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import term_bucket_py
from ..index.codec import BM25_B, BM25_K1, PostingSegment, bm25_idf
from ..index.storage import IndexStore


class _TermIter:
    """Cursor over one term's decoded-on-demand segment with block skipping."""

    __slots__ = ("seg", "weight", "avgdl", "bi", "i", "doc_ids", "tfs", "dls",
                 "cur", "max_score", "exhausted")

    def __init__(self, seg: PostingSegment, weight: float, avgdl: float):
        self.seg = seg
        self.weight = weight  # qtf * idf
        self.avgdl = avgdl
        self.bi = -1
        self.exhausted = False
        self.max_score = float(weight * seg.impacts.max())
        self._load_block(0)

    def _load_block(self, bi: int):
        if bi >= self.seg.n_blocks:
            self.exhausted = True
            self.cur = np.iinfo(np.int64).max
            return
        self.bi = bi
        self.doc_ids, self.tfs, self.dls = self.seg.block(bi)
        self.i = 0
        self.cur = int(self.doc_ids[0])

    def block_max_score(self) -> float:
        if self.exhausted:
            return 0.0
        return float(self.weight * self.seg.impacts[self.bi])

    def next_geq(self, target: int):
        """Advance to the first docID >= target (block-skip via directory)."""
        if self.exhausted or self.cur >= target:
            return
        if self.seg.last_doc_ids[self.bi] < target:
            nbi = int(np.searchsorted(self.seg.last_doc_ids, target, side="left"))
            self._load_block(nbi)
            if self.exhausted:
                return
        j = int(np.searchsorted(self.doc_ids[self.i:], target, side="left"))
        self.i += j
        if self.i >= len(self.doc_ids):
            self._load_block(self.bi + 1)
        else:
            self.cur = int(self.doc_ids[self.i])

    def advance(self):
        self.next_geq(self.cur + 1)

    def score_current(self) -> float:
        tf = float(self.tfs[self.i])
        dl = float(self.dls[self.i])
        impact = tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl)
        )
        return self.weight * impact


def wand_topk_segments(
    term_segments: dict[str, list[bytes]],
    term_weights: dict[str, float],
    avgdl: float,
    k: int,
) -> list[tuple[int, float]]:
    """Block-max WAND over one drange shard. ``term_segments`` maps each
    query term to its encoded segment buffers within the shard (docID-sorted,
    disjoint). Returns [(doc_id, score)] sorted by (-score, doc_id)."""
    iters: list[_TermIter] = []
    for term, bufs in term_segments.items():
        w = term_weights[term]
        for buf in bufs:
            if buf:
                iters.append(_TermIter(PostingSegment(buf), w, avgdl))
    if not iters:
        return []

    # heap entries: (score, -doc_id); worst of top-k at heap[0]
    heap: list[tuple[float, int]] = []
    INF = np.iinfo(np.int64).max

    while True:
        live = [it for it in iters if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda it: it.cur)
        threshold = heap[0][0] if len(heap) >= k else float("-inf")

        # pivot: first position where cumulative max_score exceeds threshold
        acc = 0.0
        pivot_idx = None
        for idx, it in enumerate(live):
            acc += it.max_score
            if acc > threshold:
                pivot_idx = idx
                break
        if pivot_idx is None:
            break  # no doc can beat the threshold
        pivot_doc = live[pivot_idx].cur
        if pivot_doc == INF:
            break

        if live[0].cur == pivot_doc:
            # block-max refinement: tighter bound from current blocks
            bm = sum(
                it.block_max_score() for it in live if it.cur <= pivot_doc
            )
            if bm > threshold:
                score = 0.0
                for it in live:
                    if it.cur == pivot_doc:
                        score += it.score_current()
                if score > threshold or (
                    len(heap) < k
                ):
                    entry = (score, -pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
            for it in live:
                if it.cur == pivot_doc:
                    it.advance()
        else:
            # advance the lagging iterators up to the pivot
            for it in live:
                if it.cur < pivot_doc:
                    it.next_geq(pivot_doc)

    out = [(-nd, s) for s, nd in heap]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def bm25_topk_wand(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Distributed block-max WAND: pruned segment scan -> per-drange WAND ->
    global top-k merge. Rank-identical to ``bm25.bm25_topk``."""
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    cstats = store.corpus_stats()
    avgdl, n_docs = cstats["avgdl"], cstats["n_docs"]
    qtf = Counter(terms)
    uniq = sorted(qtf)
    buckets = sorted({term_bucket_py(t) for t in uniq})

    # tiny broadcast stats lookup (the reference's GlobalStats, J7 analog)
    stats_rows = (
        store.term_stats(spark)
        .filter(F.col("tbucket").isin(buckets))
        .filter(F.col("term").isin(uniq))
        .select("term", "df")
        .collect()
    )
    if not stats_rows:
        return spark.createDataFrame([], "doc_id long, score double")
    weights = {
        r["term"]: qtf[r["term"]] * float(bm25_idf(n_docs, r["df"]))
        for r in stats_rows
    }
    b_weights = spark.sparkContext.broadcast(weights)

    segs = (
        store.segments(spark)
        .filter(F.col("tbucket").isin(buckets))
        .filter(F.col("term").isin(uniq))
        .select("term", "drange", "postings")
    )

    def shard_wand(pdf: pd.DataFrame) -> pd.DataFrame:
        term_segments: dict[str, list[bytes]] = {}
        for term, buf in zip(pdf["term"], pdf["postings"]):
            term_segments.setdefault(term, []).append(bytes(buf))
        top = wand_topk_segments(term_segments, b_weights.value, avgdl, k)
        return pd.DataFrame(
            {
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
            }
        ).astype({"doc_id": "int64", "score": "float64"})

    local = segs.groupBy("drange").applyInPandas(
        shard_wand, schema="doc_id long, score double"
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
