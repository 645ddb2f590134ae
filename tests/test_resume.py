"""Checkpoint-resume (FIXTURES/SURVEY §5.4): kill after a partial segment
write, re-run, identical index + no duplicate work."""

import os
import time

import pytest


def _segment_dump(spark, store):
    rows = (
        store.segments(spark)
        .select("term", "drange", "df_local", "first_doc_id", "last_doc_id")
        .collect()
    )
    return sorted((r["term"], r["drange"], r["df_local"], r["first_doc_id"], r["last_doc_id"]) for r in rows)


def test_resume_after_injected_failure(spark, transcripts_df, tmp_path):
    from search_engine_spark.index.builder import build_index
    from search_engine_spark.index.storage import IndexStore

    d = str(tmp_path / "ix")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, transcripts_df, d, drange_span=64, n_chunks=3,
            fail_after_chunk=0,
        )
    store = IndexStore(d)
    assert store.chunk_done(0)
    assert not store.chunk_done(1)
    chunk0_manifest = (store.manifest_dir / "chunk_0.json").stat().st_mtime

    # resume: completes, does NOT rebuild chunk 0
    store2 = build_index(spark, transcripts_df, d, drange_span=64, n_chunks=3)
    assert store2.chunk_done(1) and store2.chunk_done(2)
    assert (store2.manifest_dir / "chunk_0.json").stat().st_mtime == chunk0_manifest

    # resumed index == fresh single-shot index
    d2 = str(tmp_path / "ix_fresh")
    fresh = build_index(spark, transcripts_df, d2, drange_span=64, n_chunks=3)
    assert _segment_dump(spark, store2) == _segment_dump(spark, fresh)


def test_rerun_is_noop(spark, transcripts_df, tmp_path):
    from search_engine_spark.index.builder import build_index

    d = str(tmp_path / "ix")
    build_index(spark, transcripts_df, d, drange_span=64, n_chunks=2)
    t0 = time.time()
    build_index(spark, transcripts_df, d, drange_span=64, n_chunks=2)
    assert time.time() - t0 < 10  # stage-skip, not rebuild
