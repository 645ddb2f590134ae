"""Proximity (NEAR/w) queries: parser forms, segment kernel vs the
brute-force oracle, pipeline integration, and fuzzy-token parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.query.parser import parse_query
from search_engine_spark.query.proximity import near_matches, near_topk


def test_parser_near_forms():
    pq = parse_query("table NEAR/3 filter", stem=False)
    assert pq.kind == "near"
    assert pq.terms == ["table", "filter"]
    assert pq.window == 3
    # quoted sides parse the same
    quoted = parse_query('"table" NEAR/7 "filter"', stem=False)
    assert quoted.kind == "near" and quoted.window == 7
    # stemming applies to both sides
    stemmed = parse_query("tables NEAR/2 filtering", stem=True)
    assert stemmed.kind == "near"
    assert stemmed.terms == [
        parse_query("tables", stem=True).terms[0],
        parse_query("filtering", stem=True).terms[0],
    ]


def test_parser_near_degenerates_to_free_text():
    # stopword side analyzes to zero terms -> free text
    assert parse_query("the NEAR/3 filter", stem=False).kind == "term"
    # both sides the same analyzed term -> free text
    assert parse_query("table NEAR/3 table", stem=False).kind == "term"
    # zero window -> free text
    assert parse_query("table NEAR/0 filter", stem=False).kind == "term"
    # free-text / phrase / logical surfaces unaffected
    assert parse_query("plain data", stem=False).window is None
    assert parse_query('"some words"', stem=False).kind in ("phrase", "term")


def test_parser_fuzzy_tokens():
    pq = parse_query("lin~ data", stem=False)
    assert pq.kind == "term"
    assert pq.fuzzies == ["lin"]
    assert pq.terms == ["data"]
    only = parse_query("lin~", stem=False)
    assert only.fuzzies == ["lin"] and only.terms == []
    assert parse_query("plain data", stem=False).fuzzies is None


def _near_oracle(oix, ta: str, tb: str, w: int) -> dict[int, int]:
    """Brute-force pair counts from the oracle's positional index."""
    out: dict[int, int] = {}
    pa_by_doc = oix.positions.get(ta, {})
    pb_by_doc = oix.positions.get(tb, {})
    for doc_id, pas in pa_by_doc.items():
        pbs = pb_by_doc.get(doc_id)
        if not pbs:
            continue
        n = sum(1 for pa in pas for pb in pbs if abs(pa - pb) <= w)
        if n:
            out[doc_id] = n
    return out


def _cooccurring_pair(oix, w: int) -> tuple[str, str]:
    """Two distinct analyzed terms guaranteed to co-occur within ``w``,
    both fixed points of re-analysis (so the raw query string round-trips
    through the pipeline's analyzer to the same terms)."""
    from search_engine_spark.analysis.analyzer import analyze_query

    for _, doc in oix.docs.iterrows():
        doc_id = int(doc["doc_id"])
        here = [
            (t, ps[0])
            for t, by_doc in oix.positions.items()
            if (ps := by_doc.get(doc_id))
        ]
        here.sort(key=lambda x: x[1])
        for (t1, p1), (t2, p2) in zip(here, here[1:]):
            if (
                t1 != t2
                and abs(p1 - p2) <= w
                and analyze_query(t1) == [t1]
                and analyze_query(t2) == [t2]
            ):
                return t1, t2
    pytest.skip("fixture has no co-occurring pair")


@pytest.mark.parametrize("w", [1, 3])
def test_near_matches_vs_oracle(spark, index_store, oracle_index, w):
    ta, tb = _cooccurring_pair(oracle_index, w)
    expect = _near_oracle(oracle_index, ta, tb, w)
    assert expect  # pair chosen to co-occur
    got = {
        r["doc_id"]: r["pair_count"]
        for r in near_matches(spark, index_store, ta, tb, w).collect()
    }
    assert got == expect


def test_near_matches_symmetric(spark, index_store, oracle_index):
    ta, tb = _cooccurring_pair(oracle_index, 3)
    a = {
        (r["doc_id"], r["pair_count"])
        for r in near_matches(spark, index_store, ta, tb, 3).collect()
    }
    b = {
        (r["doc_id"], r["pair_count"])
        for r in near_matches(spark, index_store, tb, ta, 3).collect()
    }
    assert a == b


def test_near_validation(spark, index_store):
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "same", "same", 3)
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "a", "b", 0)
    with pytest.raises(ValueError):
        near_matches(spark, index_store, "a", "b", 64)


def test_near_pipeline_equals_direct(spark, index_store, oracle_index):
    from search_engine_spark.query.pipeline import search

    ta, tb = _cooccurring_pair(oracle_index, 3)
    direct = [
        (r["doc_id"], round(r["score"], 9))
        for r in near_topk(spark, index_store, ta, tb, 3, k=10).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{ta} NEAR/3 {tb}", k=10,
            engine="df", with_metadata=False,
        ).collect()
    ]
    assert got == direct and got


def test_fuzzy_pipeline_equals_manual_expansion(spark, index_store):
    from search_engine_spark.query.bm25 import bm25_topk
    from search_engine_spark.query.pipeline import search
    from search_engine_spark.query.suggest import expand_fuzzy

    word = next(
        t
        for r in index_store.term_stats(spark)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(1)
        .collect()
        for t in [r["term"]]
    )[:-1] + "x"  # near-miss of the most frequent term
    terms = expand_fuzzy(spark, index_store, word, limit=3)
    assert terms
    manual = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(spark, index_store, terms, k=10)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{word}~", k=10, engine="df",
            with_metadata=False, prefix_limit=3,
        ).collect()
    ]
    assert got == manual


# ---------------------------------------------------------------------------
# oversized-window clamping (ADVICE r4: NEAR/100 crashed instead of clamping)
# ---------------------------------------------------------------------------

def test_parser_clamps_oversized_window():
    from search_engine_spark.query.proximity import MAX_WINDOW

    pq = parse_query("table NEAR/100 filter", stem=False)
    assert pq.kind == "near" and pq.window == MAX_WINDOW
    pq = parse_query("table NEAR/999 filter NEAR/999 data", stem=False)
    assert pq.kind == "near_chain" and pq.window == MAX_WINDOW


def test_near_999_pipeline_does_not_raise(spark, index_store, oracle_index):
    """Pipeline-level NEAR/999 (VERDICT r4 next #4): clamps to MAX_WINDOW
    and returns the same ranking as an explicit MAX_WINDOW query."""
    from search_engine_spark.query.pipeline import search
    from search_engine_spark.query.proximity import MAX_WINDOW

    ta, tb = _cooccurring_pair(oracle_index, 3)
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{ta} NEAR/{MAX_WINDOW} {tb}", k=10,
            engine="df", with_metadata=False,
        ).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, f"{ta} NEAR/999 {tb}", k=10,
            engine="df", with_metadata=False,
        ).collect()
    ]
    assert got == want and got


# ---------------------------------------------------------------------------
# ordered n-term span chain (VERDICT r4 next #6)
# ---------------------------------------------------------------------------

def test_parser_near_chain_forms():
    pq = parse_query("table NEAR/3 filter NEAR/3 data", stem=False)
    assert pq.kind == "near_chain"
    assert pq.terms == ["table", "filter", "data"]
    assert pq.window == 3
    # mixed window values degenerate (one slop value, Lucene model)
    assert parse_query("table NEAR/3 filter NEAR/5 data", stem=False).kind == "term"
    # repeated operand degenerates
    assert parse_query("table NEAR/3 filter NEAR/3 table", stem=False).kind == "term"
    # stopword operand degenerates
    assert parse_query("table NEAR/3 the NEAR/3 data", stem=False).kind == "term"


def _chain_oracle(oix, terms: list[str], w: int) -> dict[int, int]:
    """Independent brute force: per doc, count first-term anchors p1 for
    which ANY strictly-increasing chain p1 < p2 < ... < pn over the terms'
    positions satisfies pn - p1 <= w (exhaustive, not greedy)."""
    maps = [oix.positions.get(t, {}) for t in terms]
    docs = set(maps[0])
    for m in maps[1:]:
        docs &= set(m)
    out: dict[int, int] = {}
    for d in sorted(docs):
        lists = [sorted(m[d]) for m in maps]

        def exists(cur: int, i: int, p1: int) -> bool:
            if i == len(lists):
                return cur - p1 <= w
            return any(
                exists(p, i + 1, p1)
                for p in lists[i]
                if cur < p <= p1 + w
            )

        cnt = sum(1 for p1 in lists[0] if exists(p1, 1, p1))
        if cnt:
            out[d] = cnt
    return out


def _ordered_triple(oix, w: int):
    """Three distinct analyzed terms occurring in order within span ``w``
    in some fixture doc, each a fixed point of re-analysis."""
    from search_engine_spark.analysis.analyzer import analyze_query

    per_doc: dict[int, list[tuple[int, str]]] = {}
    for t, by_doc in oix.positions.items():
        if analyze_query(t) != [t]:
            continue
        for doc_id, ps in by_doc.items():
            for p in ps:
                per_doc.setdefault(doc_id, []).append((p, t))
    for doc_id, items in per_doc.items():
        items.sort()
        for i in range(len(items) - 2):
            (p1, t1), (p2, t2), (p3, t3) = items[i], items[i + 1], items[i + 2]
            if len({t1, t2, t3}) == 3 and p3 - p1 <= w:
                return [t1, t2, t3]
    pytest.skip("fixture has no ordered triple")


@pytest.mark.parametrize("w", [2, 5])
def test_near_chain_vs_oracle(spark, index_store, oracle_index, w):
    from search_engine_spark.query.proximity import near_chain_matches

    terms = _ordered_triple(oracle_index, w)
    expect = _chain_oracle(oracle_index, terms, w)
    assert expect  # triple chosen to match at least once
    got = {
        r["doc_id"]: r["chain_count"]
        for r in near_chain_matches(spark, index_store, terms, w).collect()
    }
    assert got == expect


def test_near_chain_order_sensitive(spark, index_store, oracle_index):
    """Reversing the chain changes (or empties) the match set whenever the
    oracle says it should — ordered semantics, unlike 2-term NEAR."""
    from search_engine_spark.query.proximity import near_chain_matches

    terms = _ordered_triple(oracle_index, 5)
    fwd_oracle = _chain_oracle(oracle_index, terms, 5)
    rev_oracle = _chain_oracle(oracle_index, terms[::-1], 5)
    rev = {
        r["doc_id"]: r["chain_count"]
        for r in near_chain_matches(spark, index_store, terms[::-1], 5).collect()
    }
    assert rev == rev_oracle
    assert fwd_oracle  # forward matches exist by construction
    # (rev may or may not match — the point is both agree with the oracle)


def test_near_chain_pipeline_equals_direct(spark, index_store, oracle_index):
    from search_engine_spark.query.pipeline import search
    from search_engine_spark.query.proximity import near_chain_topk

    terms = _ordered_triple(oracle_index, 4)
    direct = [
        (r["doc_id"], round(r["score"], 9))
        for r in near_chain_topk(spark, index_store, terms, 4, k=10).collect()
    ]
    q = f"{terms[0]} NEAR/4 {terms[1]} NEAR/4 {terms[2]}"
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_store, q, k=10, engine="df", with_metadata=False,
        ).collect()
    ]
    assert got == direct and got


def test_near_chain_validation(spark, index_store):
    from search_engine_spark.query.proximity import near_chain_matches

    with pytest.raises(ValueError):
        near_chain_matches(spark, index_store, ["a", "b", "a"], 3)
    with pytest.raises(ValueError):
        near_chain_matches(spark, index_store, ["a", "b", "c"], 0)


def test_near_snippet_skips_operator_word(spark, tmp_path):
    """ADVICE r4: the literal word 'near' in document text must not be
    highlighted for a NEAR query (operator tokens are not operands)."""
    from search_engine_spark.index.builder import build_index
    from search_engine_spark.query.pipeline import search

    rows = [
        ("c0", 0, "user", "alpha near beta words close alpha beta", "", None),
        ("c1", 0, "user", "alpha filler beta and near again", "", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    store = build_index(spark, df, str(tmp_path / "nearix"), n_chunks=1)
    res = search(spark, store, "alpha NEAR/3 beta", k=5, engine="df").collect()
    assert res
    for r in res:
        assert "<strong>near</strong>" not in r["snippet"]
        assert "<strong>alpha</strong>" in r["snippet"]
