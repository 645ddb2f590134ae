"""More-like-this + faceted search vs a brute-force pandas oracle.

MLT term selection is replayed exactly (tf x bm25_idf, score desc / term
asc); retrieval is the already-parity-tested BM25 engine with qtf=1, so
the check here is end-to-end doc_id/score agreement. Facets are replayed
by grouping the exhaustive match set with pandas."""

from __future__ import annotations

from collections import Counter

import pytest

from search_engine_spark.analysis.analyzer import analyze
from search_engine_spark.oracle import bm25_idf, score_terms, topk


def _expected_mlt_terms(oix, src: int, max_terms: int) -> list[str]:
    text = oix.docs.set_index("doc_id").loc[src, "text"]
    tf = Counter(analyze(text))
    ranked = sorted(
        ((tf[t] * bm25_idf(oix.n_docs, oix.df[t]), t) for t in tf if t in oix.df),
        key=lambda x: (-x[0], x[1]),
    )
    return [t for _, t in ranked[:max_terms]]


@pytest.fixture(scope="module")
def src_doc(oracle_index):
    # longest doc: a rich term set so selection actually ranks
    d = oracle_index.docs
    return int(d.loc[d["doc_len"].idxmax(), "doc_id"])


def test_mlt_terms_match_bruteforce(spark, index_store, oracle_index, src_doc):
    from search_engine_spark.query.mlt import mlt_terms

    got = mlt_terms(spark, index_store, src_doc, max_terms=8)
    assert got == _expected_mlt_terms(oracle_index, src_doc, 8)


@pytest.mark.parametrize("engine", ["df", "wand"])
def test_more_like_this_topk(spark, index_store, oracle_index, src_doc, engine):
    from search_engine_spark.query.mlt import more_like_this

    sel = _expected_mlt_terms(oracle_index, src_doc, 8)
    scores = score_terms(oracle_index, sel)  # sel is unique -> qtf=1
    exp = [(d, s) for d, s in topk(scores, 11) if d != src_doc][:10]

    rows = more_like_this(
        spark, index_store, src_doc, k=10, max_terms=8, engine=engine
    ).collect()
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in exp]
    for r, (_, s) in zip(rows, exp):
        assert abs(float(r["score"]) - s) < 1e-9
    assert src_doc not in {int(r["doc_id"]) for r in rows}


def test_mlt_missing_doc_is_empty(spark, index_store):
    from search_engine_spark.query.mlt import more_like_this

    assert more_like_this(spark, index_store, 10**9, k=5).count() == 0


def test_facets_and_total_hits(spark, index_store, oracle_index):
    from search_engine_spark.query.facets import search_facets, total_hits

    terms = analyze("spark index query")
    scores = score_terms(oracle_index, terms)

    role = dict(zip(oracle_index.docs["doc_id"], oracle_index.docs["role"]))
    exp: dict[str, list[float]] = {}
    for doc_id, s in scores.items():
        exp.setdefault(role[doc_id], []).append(s)

    dims = spark.createDataFrame(
        oracle_index.docs[["doc_id", "role"]], "doc_id long, role string"
    )
    got = {
        r["role"]: r
        for r in search_facets(spark, index_store, terms, dims, ["role"]).collect()
    }
    assert set(got) == set(exp)
    for rname, vals in exp.items():
        assert got[rname]["n_docs"] == len(vals)
        assert abs(got[rname]["max_score"] - max(vals)) < 1e-9
        assert abs(got[rname]["sum_score"] - sum(vals)) < 1e-6

    (hits,) = total_hits(spark, index_store, terms).collect()
    assert hits["n_hits"] == len(scores)


def test_filtered_topk(spark, index_store, oracle_index):
    """FILTER clause: predicate restricts matches; scoring stays global."""
    from search_engine_spark.query.facets import filtered_topk

    terms = analyze("spark index query")
    scores = score_terms(oracle_index, terms)
    allowed_ids = set(
        oracle_index.docs.loc[
            oracle_index.docs["role"] == "assistant", "doc_id"
        ].astype(int)
    )
    exp = sorted(
        ((d, s) for d, s in scores.items() if d in allowed_ids),
        key=lambda x: (-x[1], x[0]),
    )[:10]

    allowed = spark.createDataFrame(
        [(int(d),) for d in sorted(allowed_ids)], "doc_id long"
    )
    rows = filtered_topk(spark, index_store, terms, allowed, k=10).collect()
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in exp]
    for r, (_, s) in zip(rows, exp):
        assert abs(float(r["score"]) - s) < 1e-9
