"""Event sessionization (gap-based) — the standard windowed-analytics
operator over an event stream: consecutive events of a user belong to one
session while the gap between them stays under a threshold.

Spark plan: ONE shuffle (hash partition by user_id); the lag window, the
running session counter, and the per-session aggregation are all keyed by
user_id, so Catalyst reuses the single exchange — no second shuffle. Ties
on ts break by event_id so the ordering (and therefore session assignment)
is fully deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    sum_value) — ``session_idx`` is the user's 1-based session ordinal; a
    new session starts when the gap to the previous event exceeds
    ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # the events table stores TIMESTAMP_NTZ, which Spark will not cast to
    # long directly; going through timestamp first shifts both sides by the
    # same session-timezone offset, leaving the gap unchanged
    secs = F.col("ts").cast("timestamp").cast("long")
    prev_secs = prev.cast("timestamp").cast("long")
    new_session = F.when(
        prev.isNull() | (secs - prev_secs > gap_minutes * 60), 1
    ).otherwise(0)
    numbered = events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        # float-sum order differs between engines; 4dp matches the
        # events_hourly oracle convention
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
