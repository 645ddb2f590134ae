"""Score-explain parity: the factor rows must recompose the engine score
exactly and match the exhaustive pandas oracle factor-for-factor."""

from __future__ import annotations

from collections import Counter

from search_engine_spark.analysis.analyzer import analyze
from search_engine_spark.oracle import bm25_idf, bm25_impact, score_terms, topk


def test_explain_factors_match_oracle(spark, index_store, oracle_index):
    from search_engine_spark.query.explain import explain_query

    query = "spark index query spark"  # duplicate term -> qtf=2 visible
    terms = analyze(query)
    qtf = Counter(terms)
    exp_top = topk(score_terms(oracle_index, terms), 5)

    rows = explain_query(spark, index_store, query, k=5, engine="wand").collect()

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    assert [d for d, _ in exp_top] == sorted(
        by_doc, key=lambda d: (-by_doc[d][0]["score"], d)
    )

    dl = dict(zip(oracle_index.docs["doc_id"], oracle_index.docs["doc_len"]))
    for doc_id, score in exp_top:
        got = by_doc[doc_id]
        assert abs(got[0]["score"] - score) < 1e-9
        # sum of contributions recomposes the score
        assert abs(sum(r["contribution"] for r in got) - score) < 1e-9
        assert {r["rank"] for r in got} == {
            1 + [d for d, _ in exp_top].index(doc_id)
        }
        for r in got:
            t = r["term"]
            tf = oracle_index.postings[t][doc_id]
            idf = bm25_idf(oracle_index.n_docs, oracle_index.df[t])
            assert r["qtf"] == float(qtf[t])
            assert r["tf"] == tf
            assert r["doc_len"] == dl[doc_id]
            assert r["df"] == oracle_index.df[t]
            assert abs(r["idf"] - idf) < 1e-12
            contrib = qtf[t] * idf * bm25_impact(tf, dl[doc_id], oracle_index.avgdl)
            assert abs(r["contribution"] - contrib) < 1e-9


def test_explain_empty_query(spark, index_store):
    from search_engine_spark.query.explain import explain_topk

    assert explain_topk(spark, index_store, [], k=5).count() == 0
