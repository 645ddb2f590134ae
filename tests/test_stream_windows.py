"""Watermarked windowed streaming aggregation (streaming/windows.py):
append-mode emission semantics, exact agreement with the batch operator on
finalized windows, and exactly-once incremental re-runs."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def _batch_hourly(ev):
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def test_stream_matches_batch_and_rerun_is_exactly_once(spark, tmp_path):
    from search_engine_spark.streaming.windows import events_hourly_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # four ts-ordered files -> four micro-batches (maxFilesPerTrigger=1),
    # so the watermark advances between batches and finalizes windows
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    q = n // 4
    bounds = [0, q, 2 * q, 3 * q, n]
    for i in range(3):  # hold the last quarter back as the "late" files
        chunk = rows[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    got1 = events_hourly_stream(
        spark, src, out, ck, watermark="2 hours", max_files_per_trigger=1
    )
    n1 = got1.count()
    assert n1 > 0
    # every finalized window agrees exactly with the batch operator over
    # the SAME prefix of the stream
    prefix = spark.createDataFrame(rows[: bounds[3]], ev.schema)
    batch = _batch_hourly(prefix)
    j = got1.alias("s").join(
        batch.alias("b"), ["window_start", "event_type"], "inner"
    )
    agree = j.filter(
        (F.col("s.n_events") == F.col("b.n_events"))
        & (F.col("s.sum_value") == F.col("b.sum_value"))
    ).count()
    assert agree == n1
    # append mode withholds the trailing windows (watermark has not passed
    # their end yet)
    assert n1 < batch.count()

    # deliver the held-back quarter and re-run the SAME checkpoint: more
    # windows finalize, nothing is emitted twice
    spark.createDataFrame(rows[bounds[3]:], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = events_hourly_stream(
        spark, src, out, ck, watermark="2 hours", max_files_per_trigger=1
    )
    n2 = got2.count()
    assert n2 > n1
    dups = (
        got2.groupBy("window_start", "event_type")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0
    # all emitted rows agree with the full-corpus batch result
    full_batch = _batch_hourly(ev)
    j2 = got2.alias("s").join(
        full_batch.alias("b"), ["window_start", "event_type"], "inner"
    )
    agree2 = j2.filter(
        (F.col("s.n_events") == F.col("b.n_events"))
        & (F.col("s.sum_value") == F.col("b.sum_value"))
    ).count()
    assert agree2 == n2
    shutil.rmtree(src, ignore_errors=True)
