"""Reference-parity ranker over the reference's query IR.

Consumes the exact ``QueryInput`` JSON shape the reference passes from query
processor to ranker (``Ranker/QueryInput.java:10-51``: ``query_terms`` +
``candidate_documents{doc_id -> {term_stats, metadata}}`` +
``global_stats``) and reproduces ``ParallelRanker`` semantics
(``Ranker/ParallelRanker.java:76-104``):

    relevance(doc) = sum over the query-term LIST (duplicates count twice)
                     of tf * idf * (in_title ? 2.0 : 1.0)
    score(doc)     = 0.7 * relevance + 0.3 * popularity
    ranking        = score desc (``ParallelRanker.java:31``)

Notes mirrored from the reference: the stored ``importance_score`` is NOT
used by the ranker; missing term stats contribute 0; idf defaults to 0 for
terms absent from ``global_stats.term_idf``.

This module is the compatibility surface for the reference's captured
fixture (``src/main/resources/query_results.json``, vendored at
``tests/fixtures/reference_query_results.json``).
"""

from __future__ import annotations

TITLE_BOOST = 2.0          # ParallelRanker.java:13
RELEVANCE_WEIGHT = 0.7     # ParallelRanker.java:14
POPULARITY_WEIGHT = 0.3    # ParallelRanker.java:15


def rank_query_input(query_input: dict, k: int | None = None) -> list[dict]:
    """Rank the reference IR -> list of RankedDocument-shaped dicts
    (``Ranker/RankedDocument.java:3-54``), score desc, doc_id asc ties."""
    terms = query_input.get("query_terms", [])
    candidates = query_input.get("candidate_documents", {})
    idf_map = (query_input.get("global_stats") or {}).get("term_idf", {})

    out = []
    for doc_id, qdoc in candidates.items():
        term_stats = qdoc.get("term_stats", {})
        meta = qdoc.get("metadata", {})
        relevance = 0.0
        for t in terms:  # duplicates intentionally counted per occurrence
            st = term_stats.get(t)
            if not st:
                continue
            boost = TITLE_BOOST if st.get("in_title") else 1.0
            relevance += float(st.get("tf", 0.0)) * float(idf_map.get(t, 0.0)) * boost
        popularity = float(meta.get("popularity", 0.0))
        score = RELEVANCE_WEIGHT * relevance + POPULARITY_WEIGHT * popularity
        out.append(
            {
                "docId": doc_id,
                "score": score,
                "relevance": relevance,
                "popularity": popularity,
                "URL": meta.get("URL", ""),
                "title": meta.get("title", ""),
                "snippet": meta.get("snippet", ""),
            }
        )
    out.sort(key=lambda r: (-r["score"], r["docId"]))
    return out[:k] if k is not None else out
