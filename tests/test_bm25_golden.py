"""End-to-end golden queries: engine top-k must be rank-identical and
score-equal (rtol 1e-9) to the brute-force oracle — the role the reference's
captured ``query_results.json`` snapshot plays (SURVEY.md §5.3).

Covers all three query classes (QueryProcessor.java:49-79) plus WAND-vs-
DataFrame-path identity.
"""

import pytest

from search_engine_spark.corpus import HEAD_TERMS, VOCAB
from search_engine_spark.oracle import score_query, topk
from search_engine_spark.query.bm25 import bm25_topk
from search_engine_spark.query.pipeline import search
from search_engine_spark.query.wand import bm25_topk_wand

GOLDEN_QUERIES = [
    # free-text
    f"{VOCAB[0]} {VOCAB[5]}",
    f"{HEAD_TERMS[0]} {HEAD_TERMS[1]} {VOCAB[10]}",
    "spark",
    f"The {VOCAB[1]} of a {VOCAB[2]}",          # stopwords mixed in
    "the of and is",                             # stopword-only -> empty
    "zzzzmissing absentterm",                    # absent from corpus -> empty
    f"{HEAD_TERMS[0]} {HEAD_TERMS[0]} {VOCAB[3]}",  # duplicate query term
    f"{VOCAB[0].upper()} {VOCAB[7]},",           # case + punctuation
    # phrase
    f'"{VOCAB[0]} {VOCAB[1]}"',
    f'"{HEAD_TERMS[0]} {HEAD_TERMS[1]}"',
    f'"{VOCAB[2]} {VOCAB[0]} {VOCAB[1]}"',
    f'"{VOCAB[0]}"',                             # 1-term phrase -> term query
    # logical
    f'"{VOCAB[0]} {VOCAB[1]}" AND "{VOCAB[2]} {VOCAB[3]}"',
    f'"{VOCAB[0]} {VOCAB[1]}" OR "{VOCAB[4]} {VOCAB[5]}"',
    f'"{VOCAB[0]} {VOCAB[1]}" NOT "{VOCAB[2]} {VOCAB[3]}"',
]

K = 10


def _assert_matches_oracle(got_rows, oracle_topk, qid=""):
    got = [(int(r["doc_id"]), float(r["score"])) for r in got_rows]
    assert len(got) == len(oracle_topk), (qid, got, oracle_topk)
    for (gd, gs), (ed, es) in zip(got, oracle_topk):
        assert gd == ed, (qid, got, oracle_topk)
        assert gs == pytest.approx(es, rel=1e-9), (qid, gd, gs, es)


@pytest.mark.parametrize("query", GOLDEN_QUERIES)
def test_golden_query_df_path(spark, index_store, oracle_index, query):
    exp = topk(score_query(oracle_index, query), K)
    got = search(spark, index_store, query, k=K, engine="df", with_metadata=False)
    _assert_matches_oracle(got.collect(), exp, query)


@pytest.mark.parametrize(
    "query",
    [q for q in GOLDEN_QUERIES if not q.startswith('"')],
)
def test_golden_query_wand_path(spark, index_store, oracle_index, query):
    exp = topk(score_query(oracle_index, query), K)
    got = search(spark, index_store, query, k=K, engine="wand", with_metadata=False)
    _assert_matches_oracle(got.collect(), exp, query)


def test_wand_identical_to_df_path_many_k(spark, index_store):
    from search_engine_spark.analysis import analyze_query

    terms = analyze_query(f"{HEAD_TERMS[0]} {VOCAB[0]} {VOCAB[9]}")
    for k in (1, 3, 25, 100):
        df_rows = bm25_topk(spark, index_store, terms, k=k).collect()
        wd_rows = bm25_topk_wand(spark, index_store, terms, k=k).collect()
        assert [(r["doc_id"], round(r["score"], 10)) for r in df_rows] == [
            (r["doc_id"], round(r["score"], 10)) for r in wd_rows
        ]


@pytest.mark.parametrize(
    "query",
    [GOLDEN_QUERIES[0], GOLDEN_QUERIES[1], GOLDEN_QUERIES[6]],
)
def test_golden_query_role_boost(spark, index_store, oracle_index, query):
    """boost=True applies the stored role weight live (reference A8/A9:
    in-title x2 -> role weights, ParallelRanker.java:86-104) and must match
    the independently-boosted oracle; it must also actually change the
    ranking vs the un-boosted path on a role-mixed corpus."""
    from search_engine_spark.analysis import analyze_query
    from search_engine_spark.oracle import score_terms_boosted

    terms = analyze_query(query)
    exp = topk(score_terms_boosted(oracle_index, terms), K)
    got = bm25_topk(spark, index_store, terms, k=K, boost=True)
    _assert_matches_oracle(got.collect(), exp, query)


@pytest.mark.parametrize(
    "query",
    [GOLDEN_QUERIES[0], GOLDEN_QUERIES[1], GOLDEN_QUERIES[6]],
)
def test_golden_query_role_boost_wand(spark, index_store, oracle_index, query):
    """The WAND path's boost (codec v2 weight stream + per-block boosted
    block-max bounds) must be rank- and score-identical to the boosted
    DataFrame path and the boosted oracle on a role-mixed corpus."""
    from search_engine_spark.analysis import analyze_query
    from search_engine_spark.oracle import score_terms_boosted

    terms = analyze_query(query)
    exp = topk(score_terms_boosted(oracle_index, terms), K)
    got = bm25_topk_wand(spark, index_store, terms, k=K, boost=True)
    _assert_matches_oracle(got.collect(), exp, query)
    df_rows = bm25_topk(spark, index_store, terms, k=K, boost=True).collect()
    wd_rows = got.collect()
    assert [(r["doc_id"], round(r["score"], 10)) for r in df_rows] == [
        (r["doc_id"], round(r["score"], 10)) for r in wd_rows
    ]


def test_role_boost_changes_scores(spark, index_store, oracle_index):
    from search_engine_spark.analysis import analyze_query

    terms = analyze_query(HEAD_TERMS[0])
    plain = {r["doc_id"]: r["score"]
             for r in bm25_topk(spark, index_store, terms, k=50).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in bm25_topk(spark, index_store, terms, k=50, boost=True).collect()}
    common = set(plain) & set(boosted)
    assert common
    ratios = {round(boosted[d] / plain[d], 9) for d in common}
    # user turns x3, tool x2, assistant x1 — all three weights must appear
    assert ratios >= {1.0, 2.0, 3.0}


def test_search_enriched_output(spark, index_store):
    rows = search(spark, index_store, HEAD_TERMS[0], k=5).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["conv_id"].startswith("conv_") for r in rows)
    assert any("<strong>" in (r["snippet"] or "") for r in rows)
