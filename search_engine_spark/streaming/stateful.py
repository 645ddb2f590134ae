"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the streaming twin of
``functions.sessions.sessionize``.

Design (exact under the watermark contract): per user the state buffers the
not-yet-finalized events. Each invocation merges the new Arrow batches into
the buffer, splits it into gap-sessions, and emits every session whose
``session_end + gap < watermark`` — no event that could still arrive (all
future events have ts >= watermark) can extend or split such a session, so
emission is exactly-once and identical to the batch operator over the same
data. Later sessions stay buffered; an event-time timeout set to
``last_end + gap`` flushes a user's trailing session once the watermark
passes it, after which the state is removed. State per user is therefore
bounded by the lateness budget (events younger than watermark - gap), not
by the stream length — the property that makes this run against an
unbounded 100 TB event stream.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import EVENTS_DDL

_OUT_DDL = (
    "user_id long, session_idx long, session_start timestamp_ntz, "
    "session_end timestamp_ntz, n_events long, sum_value double"
)
# buffered (ts_us, event_id, value) triples + count of sessions emitted so
# far (numbers the next emitted session like the batch operator's ordinal)
_STATE_DDL = (
    "ts array<long>, eid array<long>, val array<double>, emitted long"
)


def _sessionizer(gap_us: int):
    def func(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterable[pd.DataFrame]:
        user_id = int(key[0])
        ts, eid, val, emitted = [], [], [], 0
        if state.exists:
            ts, eid, val, emitted = state.get
            ts, eid, val = list(ts), list(eid), list(val)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts += (
                (pdf["ts"].astype("int64") // 1_000).tolist()
            )  # ns -> us (events carry microsecond precision)
            eid += pdf["event_id"].astype("int64").tolist()
            val += pdf["value"].astype("float64").tolist()
        if not ts:
            return
        order = sorted(range(len(ts)), key=lambda i: (ts[i], eid[i]))
        ts = [ts[i] for i in order]
        eid = [eid[i] for i in order]
        val = [val[i] for i in order]
        wm = state.getCurrentWatermarkMs()

        # split the buffer into gap-sessions
        sessions = []  # (start_idx, end_idx_exclusive)
        start = 0
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > gap_us:
                sessions.append((start, i))
                start = i
        if ts:
            sessions.append((start, len(ts)))

        out_rows = []
        keep_from = len(ts)
        for s, e in sessions:
            if ts[e - 1] + gap_us < wm * 1000:  # wm is ms; floor is conservative
                emitted += 1
                out_rows.append(
                    (
                        user_id,
                        emitted,
                        pd.Timestamp(ts[s], unit="us"),
                        pd.Timestamp(ts[e - 1], unit="us"),
                        e - s,
                        round(sum(val[s:e]), 4),
                    )
                )
            else:
                keep_from = s
                break
        remaining = ts[keep_from:]
        # the state is NEVER removed once a user emitted a session: the
        # ordinal counter must survive an empty buffer, or a user whose
        # trailing session flushed via timeout would restart numbering at 1
        # when they return (observed as duplicate (user, session_idx) rows
        # across re-runs). An empty-buffer state is a tiny tuple and sets
        # no timeout, so it costs O(users), not O(events).
        state.update((remaining, eid[keep_from:], val[keep_from:], emitted))
        if remaining:
            # flush the trailing session once the watermark passes its end
            state.setTimeoutTimestamp((remaining[-1] + gap_us) // 1000 + 1)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "user_id", "session_idx", "session_start",
                    "session_end", "n_events", "sum_value",
                ],
            )

    return func


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint_path: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run gap-based sessionization as an ``availableNow`` stream over a
    parquet directory; returns the finalized sessions written so far.
    Output matches ``functions.sessions.sessionize`` row-for-row on every
    finalized session (tested); trailing sessions stay in state until a
    later run's watermark passes them — the same append-mode contract as
    the windowed aggregation."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = (
        reader.parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _sessionizer(gap_minutes * 60_000_000),
        outputStructType=_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    q = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start(out_path)
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
