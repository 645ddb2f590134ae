"""Persisted q-gram dictionary index (query/fuzzy_index.py): row-identity
with the scan-based spell_suggest, candidate-superset guarantees for edge
word shapes, and partition pruning of the gram probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.query.fuzzy_index import (
    build_gram_index,
    expand_fuzzy_indexed,
    spell_suggest_indexed,
)
from search_engine_spark.query.suggest import expand_fuzzy, spell_suggest


@pytest.fixture(scope="module")
def gram_index(spark, index_store, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gramix"))
    build_gram_index(spark, index_store, d)
    return d


def _rows(df):
    return [(r["term"], r["df"], r["dist"]) for r in df.collect()]


def _probe_words(spark, index_store):
    """Dictionary-derived probes: a long term's misspelling (pure gram
    path), a short term's (short-sidecar path), plus fixed edge shapes."""
    terms = sorted(
        (r["term"] for r in index_store.term_stats(spark).select("term").collect()),
        key=len,
    )
    longest, shortest = terms[-1], terms[0]
    return [
        longest[:-1] + "x",          # long word: count filter active
        longest[1:],                 # deletion at the head
        shortest + "x",              # short word: sidecar path
        "ab",                        # minimal length with grams
        "a",                         # no grams at all (len < q)
        "zzzzzz",                    # matches nothing
    ]


def test_indexed_suggest_equals_scan_suggest(spark, index_store, gram_index):
    for w in _probe_words(spark, index_store):
        scan = _rows(spell_suggest(spark, index_store, w, max_dist=2, k=5))
        idx = _rows(spell_suggest_indexed(spark, gram_index, w, max_dist=2, k=5))
        assert idx == scan, f"word {w!r}: indexed {idx} != scan {scan}"


def test_indexed_expand_equals_scan_expand(spark, index_store, gram_index):
    for w in _probe_words(spark, index_store)[:3]:
        assert expand_fuzzy_indexed(spark, gram_index, w, limit=3) == \
            expand_fuzzy(spark, index_store, w, limit=3)


def test_indexed_suggest_dist1_band(spark, index_store, gram_index):
    # a tighter max_dist must also agree with the scan path
    for w in _probe_words(spark, index_store)[:2]:
        scan = _rows(spell_suggest(spark, index_store, w, max_dist=1, k=5))
        idx = _rows(spell_suggest_indexed(spark, gram_index, w, max_dist=1, k=5))
        assert idx == scan


def test_gram_probe_prunes_partitions(spark, index_store, gram_index):
    """The gram scan must read only the query word's gram directories —
    partition pruning, not a full dictionary pass."""
    terms = [r["term"] for r in index_store.term_stats(spark).select("term").collect()]
    w = max(terms, key=len)[:-1] + "x"
    df = spell_suggest_indexed(spark, gram_index, w, max_dist=2, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    head = plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "gram" in head


def test_index_rejects_wider_dist_than_built(spark, gram_index):
    with pytest.raises(ValueError):
        spell_suggest_indexed(spark, gram_index, "whatever", max_dist=3)


def test_store_serve_path_routes_through_gram_index(spark, index_store):
    """With a current-epoch gram index at the store's conventional
    location, suggest.spell_suggest must serve from it — proven by
    poisoning the term_stats dir: the scan path would fail, the indexed
    path never touches it."""
    import shutil
    from pathlib import Path

    from search_engine_spark.query.fuzzy_index import gram_index_for

    terms = [r["term"] for r in index_store.term_stats(spark).select("term").collect()]
    w = max(terms, key=len)[:-1] + "x"
    expected = _rows(spell_suggest(spark, index_store, w, max_dist=2, k=5))

    gram_dir = Path(index_store.gram_index_path)
    stats_dir = Path(index_store.term_stats_path)
    poisoned = stats_dir.with_name("terms_poisoned")
    try:
        build_gram_index(spark, index_store)  # default dir = in-store
        assert gram_index_for(index_store) == str(gram_dir)
        stats_dir.rename(poisoned)
        got = _rows(spell_suggest(spark, index_store, w, max_dist=2, k=5))
        assert got == expected
    finally:
        if poisoned.exists():
            poisoned.rename(stats_dir)
        shutil.rmtree(gram_dir, ignore_errors=True)


def test_stale_gram_index_falls_back_to_scan(spark, index_store):
    """An epoch bump (append/compaction rewrites the dictionary) must
    invalidate the in-store gram index: gram_index_for returns None and
    spell_suggest serves from the live term_stats scan."""
    import shutil
    from pathlib import Path

    from search_engine_spark.query.fuzzy_index import gram_index_for

    gram_dir = Path(index_store.gram_index_path)
    stats0 = index_store.corpus_stats()
    try:
        build_gram_index(spark, index_store)
        assert gram_index_for(index_store) is not None
        bumped = dict(stats0)
        bumped["last_append_unix"] = (stats0.get("last_append_unix") or 0) + 1
        index_store.write_corpus_stats(bumped)
        assert gram_index_for(index_store) is None
        terms = [
            r["term"] for r in index_store.term_stats(spark).select("term").collect()
        ]
        w = max(terms, key=len)[:-1] + "x"
        assert len(_rows(spell_suggest(spark, index_store, w, max_dist=2, k=5))) >= 0
    finally:
        index_store.write_corpus_stats(stats0)
        shutil.rmtree(gram_dir, ignore_errors=True)


def test_narrower_dist_serves_from_index_wider_falls_back(index_store, spark):
    """gram_index_for honors the built distance bound: requests within it
    route to the index, wider ones fall back (never ValueError from the
    serve path)."""
    import shutil
    from pathlib import Path

    from search_engine_spark.query.fuzzy_index import gram_index_for

    gram_dir = Path(index_store.gram_index_path)
    try:
        build_gram_index(spark, index_store, max_dist=1)
        assert gram_index_for(index_store, max_dist=1) is not None
        assert gram_index_for(index_store, max_dist=2) is None
        # wide request must not raise — it scans
        spell_suggest(spark, index_store, "model", max_dist=2, k=3).collect()
    finally:
        shutil.rmtree(gram_dir, ignore_errors=True)
