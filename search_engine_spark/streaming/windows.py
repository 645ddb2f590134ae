"""Watermarked windowed aggregation over an event stream — the Structured
Streaming twin of the batch ``events_hourly`` operator.

Semantics: hourly tumbling windows per event_type, append output mode with
an event-time watermark. A window is emitted exactly once, when the
watermark (max event time seen, minus the allowed lateness) passes its
end; events later than the watermark are dropped by Spark's state cleanup
— the standard late-data contract. At 100 TB-scale ingest this is the
shape that bounds state: per-window partial aggregates live in the state
store only until the watermark finalizes them, so state size tracks the
lateness budget, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def events_hourly_stream(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the hourly windowed aggregation as an ``availableNow`` stream
    over a parquet directory and return the finalized rows written so far.

    Output columns match the batch ``events_hourly`` contract row:
    (window_start, event_type, n_events, sum_value). Append mode emits a
    window only after the watermark passes its end, so a single run over a
    static directory finalizes all but the trailing windows; appending
    newer files and re-running the same checkpoint finalizes more —
    exactly-once per window (the streaming commit log dedupes re-runs)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(events_path)
    # event-time watermarks require TIMESTAMP (not NTZ); the cast shifts by
    # the session timezone and the cast back undoes it, so hour boundaries
    # match the batch operator's date_trunc on the NTZ column
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start(out_path)
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
