"""Brute-force pandas/numpy oracle for the golden tests (FIXTURES.md §4-5).

Plays the role of the reference's captured fixture
``src/main/resources/query_results.json`` — an independent, exhaustive
scorer the engine must be rank-identical to. Shares ``analysis.analyzer``
with the engine's UDFs, so tokenisation parity holds by construction; the
scoring math is re-implemented independently (plain floats, term-sorted
summation) to actually exercise the engine's aggregation order.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from .analysis.analyzer import analyze
from .index.codec import BM25_B, BM25_K1


@dataclass
class OracleIndex:
    docs: pd.DataFrame                      # doc_id, conv_id, turn_idx, text, doc_len
    postings: dict = field(default_factory=dict)   # term -> {doc_id: tf}
    positions: dict = field(default_factory=dict)  # term -> {doc_id: [pos]}
    df: dict = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0


def build_oracle_index(transcripts: pd.DataFrame) -> OracleIndex:
    docs = (
        transcripts.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .copy()
    )
    docs["doc_id"] = docs.index.astype("int64")
    postings: dict = {}
    positions: dict = {}
    doc_lens = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        terms = analyze(text)
        doc_lens.append(len(terms))
        for pos, t in enumerate(terms):
            postings.setdefault(t, {}).setdefault(int(doc_id), 0)
            postings[t][int(doc_id)] += 1
            positions.setdefault(t, {}).setdefault(int(doc_id), []).append(pos)
    docs["doc_len"] = doc_lens
    dfc = {t: len(d) for t, d in postings.items()}
    n = len(docs)
    avgdl = float(docs["doc_len"].mean()) if n else 0.0
    return OracleIndex(docs, postings, positions, dfc, n, avgdl)


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_impact(tf: int, dl: int, avgdl: float) -> float:
    return tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


def score_terms(oix: OracleIndex, terms: list[str]) -> dict[int, float]:
    """Full exhaustive scoring — term-sorted summation for determinism."""
    qtf = Counter(terms)
    dl = dict(zip(oix.docs["doc_id"], oix.docs["doc_len"]))
    scores: dict[int, float] = {}
    for t in sorted(qtf):
        plist = oix.postings.get(t)
        if not plist:
            continue
        idf = bm25_idf(oix.n_docs, oix.df[t])
        for doc_id, tf in plist.items():
            s = qtf[t] * idf * bm25_impact(tf, dl[doc_id], oix.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    return scores


def score_terms_boosted(oix: OracleIndex, terms: list[str]) -> dict[int, float]:
    """BM25 with the role-weight boost (the reference's in-title multiplier,
    Ranker/ParallelRanker.java:86-104, transcripts analog): each term
    contribution x ROLE_WEIGHTS[doc.role]."""
    from .index.build import ROLE_WEIGHTS

    qtf = Counter(terms)
    dl = dict(zip(oix.docs["doc_id"], oix.docs["doc_len"]))
    role = dict(zip(oix.docs["doc_id"], oix.docs["role"]))
    scores: dict[int, float] = {}
    for t in sorted(qtf):
        plist = oix.postings.get(t)
        if not plist:
            continue
        idf = bm25_idf(oix.n_docs, oix.df[t])
        for doc_id, tf in plist.items():
            w = ROLE_WEIGHTS.get(role[doc_id], 1.0)
            s = qtf[t] * idf * bm25_impact(tf, dl[doc_id], oix.avgdl) * w
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    return scores


def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def phrase_match_counts(oix: OracleIndex, terms: list[str]) -> dict[int, int]:
    """Exact positional adjacency (QueryProcessor.java:259-266 semantics)."""
    if not terms:
        return {}
    first = oix.positions.get(terms[0], {})
    rest = [
        {d: set(ps) for d, ps in oix.positions.get(t, {}).items()}
        for t in terms[1:]
    ]
    out: dict[int, int] = {}
    for doc_id, starts in first.items():
        cnt = 0
        for p in starts:
            if all(p + i in rs.get(doc_id, ()) for i, rs in enumerate(rest, start=1)):
                cnt += 1
        if cnt:
            out[doc_id] = cnt
    return out


def score_phrase(oix: OracleIndex, terms: list[str]) -> dict[int, float]:
    matches = phrase_match_counts(oix, terms)
    if len(terms) == 1:
        matches = {d: tf for d, tf in oix.postings.get(terms[0], {}).items()}
    if not matches:
        return {}
    dl = dict(zip(oix.docs["doc_id"], oix.docs["doc_len"]))
    idf = bm25_idf(oix.n_docs, len(matches))
    return {
        d: idf * bm25_impact(c, dl[d], oix.avgdl) for d, c in matches.items()
    }


def score_query(oix: OracleIndex, query: str) -> dict[int, float]:
    """Route through the same parser as the engine."""
    from .query.parser import parse_query

    pq = parse_query(query)
    if pq.kind == "term":
        return score_terms(oix, pq.terms or [])
    if pq.kind == "phrase":
        return score_phrase(oix, pq.terms or [])
    sides = []
    for side in (pq.left, pq.right):
        if side.kind == "phrase":
            sides.append(score_phrase(oix, side.terms or []))
        else:
            sides.append(score_terms(oix, side.terms or []))
    l, r = sides
    if pq.op == "AND":
        return {d: l[d] + r[d] for d in l.keys() & r.keys()}
    if pq.op == "OR":
        return {d: l.get(d, 0.0) + r.get(d, 0.0) for d in l.keys() | r.keys()}
    return {d: s for d, s in l.items() if d not in r}
