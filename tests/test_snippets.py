"""Snippet extraction/highlight semantics (T5/T8/O3/O4)."""

from search_engine_spark.query.snippets import (
    WINDOW,
    extract_windows,
    highlight,
    make_snippet,
)


def test_highlight_preserves_case():
    out = highlight("Spark and SPARK and spark", ["spark"])
    assert out == "<strong>Spark</strong> and <strong>SPARK</strong> and <strong>spark</strong>"


def test_highlight_word_boundaries_only():
    assert highlight("sparkle spark", ["spark"]) == "sparkle <strong>spark</strong>"


def test_single_hit_window_snaps_to_sentence():
    text = "Lead sentence here. " + "x" * 200 + ". The spark term appears. Tail follows here. " + "y" * 200
    snip = make_snippet(text, ["spark"])
    assert "<strong>spark</strong>" in snip
    assert len(snip) <= 2 * (2 * WINDOW) + 50


def test_multi_term_windows_joined():
    text = ("alpha starts the text. " + "f" * 400 + ". "
            "beta lives in the middle somewhere. " + "g" * 400 + ". end.")
    snip = make_snippet(text, ["alpha", "beta"])
    assert "<strong>alpha</strong>" in snip and "<strong>beta</strong>" in snip
    assert " ... " in snip  # two disjoint windows joined


def test_overlapping_windows_merge():
    text = "alpha beta adjacent terms in one short sentence."
    snip = make_snippet(text, ["alpha", "beta"])
    assert snip.count(" ... ") == 0


def test_complete_sentence_preferred():
    ws = ["fragment without period that is long" * 2, "Short. Complete."]
    text = "Short. Complete. " + "z" * 500 + " fragmentmarker without any period at all"
    wins = extract_windows(text, ["Short", "fragmentmarker"])
    assert wins and "." in wins[0]  # sentence-bearing window ranked first


def test_no_hit_fallback_prefix():
    text = "a" * 1000
    snip = make_snippet(text, ["missing"])
    assert snip == "a" * (2 * WINDOW)


def test_empty_inputs():
    assert make_snippet("", ["x"]) == ""
    assert make_snippet("text", []) == "text"


def test_search_json_sink(spark, index_store):
    import json

    from search_engine_spark.corpus import HEAD_TERMS
    from search_engine_spark.query.pipeline import search_json

    rows = search_json(spark, index_store, HEAD_TERMS[0], k=3)
    assert 0 < len(rows) <= 3
    parsed = [json.loads(r) for r in rows]
    assert parsed[0]["rank"] == 1
    assert {"doc_id", "score", "conv_id", "snippet"} <= set(parsed[0])


def test_highlight_prefixes_match_word_starts():
    from search_engine_spark.query.snippets import highlight

    got = highlight("Spark sparkles despair spa", [], prefixes=["spar"])
    assert got == (
        "<strong>Spark</strong> <strong>sparkles</strong> despair spa"
    )
    # tokens and prefixes combine; tokens stay whole-word
    got = highlight("spa spark spas", ["spa"], prefixes=["spark"])
    assert got == "<strong>spa</strong> <strong>spark</strong> spas"


def test_window_spans_prefix_anchors_word_initial():
    from search_engine_spark.query.snippets import window_spans

    text = "despair everywhere. " + "x" * 400 + " spark here."
    spans = window_spans(text, [], prefixes=["spar"])
    assert len(spans) == 1
    term, s, e = spans[0]
    assert term == "spar"
    # anchored at the word-initial 'spark' (hit 421, window start 271),
    # not inside 'despair' (which would start the window at 0)
    assert s == 271 and "spark" in text[s:e]


def test_pipeline_wildcard_snippet_highlights_expansions(spark, index_store):
    from search_engine_spark.query.pipeline import search

    d = {
        r["term"]: r["df"]
        for r in index_store.term_stats(spark).select("term", "df").collect()
    }
    prefix = max(d, key=lambda t: d[t])[:2]
    rows = search(
        spark, index_store, f"{prefix}*", k=3, engine="wand", prefix_limit=4
    ).collect()
    assert rows
    assert any("<strong>" in (r["snippet"] or "") for r in rows)
