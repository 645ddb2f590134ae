"""Nested boolean queries vs a brute-force set-algebra oracle."""

from __future__ import annotations

import pytest

from search_engine_spark.analysis.analyzer import analyze
from search_engine_spark.oracle import score_phrase
from search_engine_spark.query.parser import parse_query


def _leaf_scores(oracle_index, text: str) -> dict[int, float]:
    return score_phrase(oracle_index, analyze(text))


def _fold(op: str, left: dict, right: dict) -> dict[int, float]:
    if op == "AND":
        return {d: left[d] + right[d] for d in left.keys() & right.keys()}
    if op == "OR":
        return {
            d: left.get(d, 0.0) + right.get(d, 0.0)
            for d in left.keys() | right.keys()
        }
    return {d: s for d, s in left.items() if d not in right}  # NOT


def _topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_parser_tree_shapes():
    pq = parse_query('("alpha beta" AND "gamma delta") OR "sigma omega"')
    assert (pq.kind, pq.op) == ("logical", "OR")
    assert (pq.left.kind, pq.left.op) == ("logical", "AND")
    assert pq.right.kind == "phrase"

    # precedence: AND binds tighter than OR; AND/NOT left-assoc
    pq = parse_query('"alpha beta" OR "gamma delta" AND "sigma omega"')
    assert pq.op == "OR" and pq.right.op == "AND"
    pq = parse_query('"alpha beta" NOT "gamma delta" AND "sigma omega"')
    assert pq.op == "AND" and pq.left.op == "NOT"

    # the reference's flat binary form is untouched (single op, no parens)
    pq = parse_query('"alpha beta" AND "gamma delta"')
    assert (pq.kind, pq.op) == ("logical", "AND")
    assert pq.left.kind == pq.right.kind == "phrase"

    # malformed forms degenerate like every other malformed query: never a
    # logical node. Paren-led inputs fall to free text; a quote-LED input
    # falls to the reference's leading-quote phrase dispatch (Q2).
    assert parse_query('("alpha beta" AND) OR "gamma delta"').kind == "term"
    assert parse_query('("alpha beta" OR "gamma delta"').kind == "term"
    assert parse_query('"alpha beta" AND junk OR "gamma delta"').kind == "phrase"

    # a parenthesized lone phrase folds to its leaf
    assert parse_query('("alpha beta")').kind == "phrase"


@pytest.mark.parametrize(
    "query,expr",
    [
        (
            '("spark index" OR "query model") AND "token search"',
            lambda A, B, C: _fold("AND", _fold("OR", A, B), C),
        ),
        (
            '"spark index" NOT "query model" AND "token search"',
            lambda A, B, C: _fold("AND", _fold("NOT", A, B), C),
        ),
        (
            '"spark index" OR "query model" OR "token search"',
            lambda A, B, C: _fold("OR", _fold("OR", A, B), C),
        ),
        (
            '"spark index" OR ("query model" NOT "token search")',
            lambda A, B, C: _fold("OR", A, _fold("NOT", B, C)),
        ),
    ],
)
def test_nested_boolean_matches_bruteforce(
    spark, index_store, oracle_index, query, expr
):
    from search_engine_spark.query.pipeline import search

    A = _leaf_scores(oracle_index, "spark index")
    B = _leaf_scores(oracle_index, "query model")
    C = _leaf_scores(oracle_index, "token search")
    exp = _topk(expr(A, B, C), 10)

    rows = search(spark, index_store, query, k=10, with_metadata=False).collect()
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in exp]
    for r, (_, s) in zip(rows, exp):
        assert abs(float(r["score"]) - s) < 1e-9


def test_term_leaf_inside_tree(spark, index_store, oracle_index):
    """A single-word operand degenerates to a TERM leaf inside the tree —
    BM25-scored via _score_side, not the phrase kernel."""
    from search_engine_spark.oracle import score_terms
    from search_engine_spark.query.pipeline import search

    A = _leaf_scores(oracle_index, "spark index")
    B = score_terms(oracle_index, analyze("model"))
    C = _leaf_scores(oracle_index, "token search")
    exp = _topk(_fold("AND", _fold("OR", A, B), C), 10)

    rows = search(
        spark, index_store,
        '("spark index" OR "model") AND "token search"',
        k=10, with_metadata=False,
    ).collect()
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in exp]
    for r, (_, s) in zip(rows, exp):
        assert abs(float(r["score"]) - s) < 1e-9
