"""Stateful streaming sessionization (streaming/stateful.py,
applyInPandasWithState): every finalized session must equal the batch
operator row-for-row; trailing sessions stay in state; a late-file re-run
on the same checkpoint finalizes more sessions exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_quarters(spark, ev, src, upto=3):
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    q = n // 4
    bounds = [0, q, 2 * q, 3 * q, n]
    for i in range(upto):
        chunk = rows[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return rows, bounds


def _exact_join_count(got, batch):
    j = got.alias("s").join(
        batch.alias("b"), ["user_id", "session_idx"], "inner"
    )
    return j.filter(
        (F.col("s.n_events") == F.col("b.n_events"))
        & (F.col("s.sum_value") == F.col("b.sum_value"))
        & (F.col("s.session_start") == F.col("b.session_start"))
        & (F.col("s.session_end") == F.col("b.session_end"))
    ).count()


def test_stateful_sessions_match_batch_and_rerun_exactly_once(
    spark, tmp_path
):
    from search_engine_spark.functions.sessions import sessionize
    from search_engine_spark.streaming.stateful import sessionize_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows, bounds = _write_quarters(spark, ev, src, upto=3)

    got1 = sessionize_stream(
        spark, src, out, ck, gap_minutes=30, watermark="2 hours",
        max_files_per_trigger=1,
    )
    n1 = got1.count()
    assert n1 > 0
    batch = sessionize(ev, gap_minutes=30)
    # every finalized session equals the batch twin exactly (a finalized
    # session's events are all older than the watermark, so the full-corpus
    # batch result contains the identical session under the same ordinal)
    assert _exact_join_count(got1, batch) == n1
    assert n1 < batch.count()  # trailing sessions still buffered in state

    # deliver the held-back quarter, re-run the SAME checkpoint
    spark.createDataFrame(rows[bounds[3]:], ev.schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = sessionize_stream(
        spark, src, out, ck, gap_minutes=30, watermark="2 hours",
        max_files_per_trigger=1,
    )
    n2 = got2.count()
    assert n2 > n1
    dups = (
        got2.groupBy("user_id", "session_idx")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0
    assert _exact_join_count(got2, batch) == n2


def test_stateful_sessionizer_gap_split_across_batches(spark, tmp_path):
    """A session split across micro-batch boundaries must still merge: the
    buffer-until-watermark design means batch boundaries are invisible to
    session assembly."""
    from search_engine_spark.functions.sessions import sessionize
    from search_engine_spark.streaming.stateful import sessionize_stream

    rows = [
        # one user; session A = events at 10:00 and 10:10 (split across
        # files), then a 31-min gap, session B at 10:41, then hours of
        # later traffic so the watermark finalizes A and B
        (1, 7, "2025-01-01 10:00:00", 1.0),
        (2, 7, "2025-01-01 10:10:00", 2.0),
        (3, 7, "2025-01-01 10:41:00", 4.0),
        (4, 7, "2025-01-01 18:00:00", 8.0),
        (5, 7, "2025-01-01 23:00:00", 16.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", F.lit("x").alias("event_type"), "value",
        F.lit("{}").alias("props"),
    )
    src = str(tmp_path / "src2")
    for i in range(len(rows)):  # one file per event -> one batch per event
        ev.filter(F.col("event_id") == rows[i][0]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    got = sessionize_stream(
        spark, src, str(tmp_path / "out2"), str(tmp_path / "ck2"),
        gap_minutes=30, watermark="1 hours", max_files_per_trigger=1,
    )
    finalized = {
        (int(r["user_id"]), int(r["session_idx"])): (
            int(r["n_events"]), float(r["sum_value"])
        )
        for r in got.collect()
    }
    # sessions A (2 events, split across batches) and B finalized; the
    # trailing session(s) remain in state
    assert finalized[(7, 1)] == (2, 3.0)
    assert finalized[(7, 2)] == (1, 4.0)
    batch = sessionize(ev, gap_minutes=30)
    assert _exact_join_count(got, batch) == len(finalized)
