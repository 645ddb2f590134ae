"""Analyzer parity fixture (FIXTURES.md §6; semantics from
Tokenizer.java:24-25, StopWords.java:41-44, Stemmer.java:33-38)."""

from search_engine_spark.analysis import (
    STOPWORDS,
    analyze,
    analyze_with_positions,
    porter_stem,
    tokenize,
)


def test_stopword_list_vendored():
    # 129 distinct words: the vendored file's last line ("would") has no
    # trailing newline, so `wc -l` reports 128 but Files.readAllLines (the
    # reference loader, StopWords.java:21) and our loader both see 129.
    assert len(STOPWORDS) == 129
    assert "the" in STOPWORDS and "ourselves" in STOPWORDS and "would" in STOPWORDS


def test_tokenize_alpha_runs_only():
    assert tokenize("don't stop-me now, 123 times (really)!") == [
        "don", "t", "stop", "me", "now", "times", "really",
    ]
    assert tokenize("") == []
    assert tokenize(None) == []
    # non-ASCII letters are dropped by [a-zA-Z]+ (Tokenizer.java:25)
    assert tokenize("café naïve") == ["caf", "na", "ve"]


def test_short_and_numeric_rules():
    # len<=1 dropped (Stemmer.java:33-34); len<=3 kept lowercased unstemmed
    assert analyze("I a x GO cat running") == ["go", "cat", "run"]


def test_stopwords_removed_case_insensitive():
    assert analyze("The THE the Own oWn") == []


def test_porter_known_pairs():
    # 'mayb' confirmed by the reference's captured fixture
    # src/main/resources/query_results.json:1
    pairs = {
        "maybe": "mayb",
        "running": "run",
        "caresses": "caress",
        "ponies": "poni",
        "relational": "relat",
        "happiness": "happi",
        "electrical": "electr",
        "troubled": "troubl",
        "programming": "program",
    }
    for w, s in pairs.items():
        assert porter_stem(w) == s, (w, porter_stem(w))


def test_positions_over_surviving_stream():
    # stopwords and dropped tokens do NOT consume positions
    # (Indexer.java:231-247: wordCount++ only for kept tokens)
    out = analyze_with_positions("the quick q brown fox is running")
    assert out == [("quick", 0), ("brown", 1), ("fox", 2), ("run", 3)]


def test_query_and_index_chain_identical():
    from search_engine_spark.analysis import analyze_query

    s = "Maybe STACK java program maybe SQL"
    assert analyze_query(s) == analyze(s)
    # duplicates preserved in order (ranker counts them twice,
    # ParallelRanker.java:86-104)
    assert analyze_query(s).count("mayb") == 2


def test_analyze_batch_identical_to_per_doc():
    """The per-batch raw-token memo must be a pure speedup: output
    identical to analyze() per doc, both modes, including edge inputs."""
    from search_engine_spark.analysis.analyzer import analyze, analyze_batch

    texts = [
        "The Spark INDEX of running runners ran quickly",
        "", "   ", "a b c the of and", "x" * 5, "Connection connected CONNECTS",
        "data123data, punct!uation; mixed-Case tokens", None,
        "agreement agreements agree agreed agreeing",
    ]
    for stem in (True, False):
        assert analyze_batch(texts, stem=stem) == [
            analyze(t, stem=stem) for t in texts
        ]
