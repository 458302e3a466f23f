"""Event-time windowing — tumbling / sliding / session — plus
watermarked dedup and late-data handling.

The reference has no streaming (SURVEY.md §2.10); its monthly Airflow
backfill with union+dedup late-data repair is a micro-batch cadence.
This module maps that cadence onto Structured Streaming primitives and
keeps every aggregation **batch-checkable**: ``F.window`` /
``session_window`` work identically on static DataFrames, so the
catalog oracle-tests the exact functions the streaming pipelines run.

Scale notes: streaming state is keyed by (window, key) — watermarks
bound it; the batch analogs shuffle once on the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    dec_sum,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) counts + decimal-exact value sums over
    tumbling event-time windows."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping hop windows: each event lands in width/slide
    windows (here 2). Same measure set as :func:`tumbling_agg` so the
    two compose/union cleanly."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count("*").alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization per user: a session closes after
    ``gap`` of inactivity; end = last event + gap (Spark
    ``session_window`` semantics — a new event at exactly
    last_ts + gap starts a new session)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def watermark_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon — the
    streaming form of the reference's re-delivered-rows dedup
    (``apps/process_reviews.py:147-148``). On a static frame
    ``withWatermark`` is a no-op and this degrades to exact dedup."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


# ---- true streaming entry points (exercised in tests via the
# ----  file source + memory sink, trigger availableNow) -------------


def stream_tumbling(
    spark: SparkSession,
    source_dir: str,
    width: str = "1 hour",
    watermark: str = "2 hours",
):
    """readStream(parquet) → watermark → tumbling agg. Returns the
    unstarted streaming DataFrame; callers pick sink/trigger/output
    mode (tests use memory sink + availableNow)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_dedup(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
):
    """readStream → watermarked dropDuplicates on event_id."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_dedup_within_watermark(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
):
    """readStream → ``dropDuplicatesWithinWatermark`` on event_id: the
    bounded-state variant — duplicate arrivals are collapsed only while
    their event time is inside the watermark horizon, so state for old
    keys is evicted instead of growing forever. The production choice
    when duplicates can only arrive within a known lateness bound
    (exactly the reference's monthly re-delivery window,
    ``README.md:210-213``)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(df, name: str, output_mode: str = "complete") -> None:
    """Drive a streaming DataFrame to completion synchronously into an
    in-memory table (test/smoke harness). ``output_mode``: "complete"
    for aggregations, "append" for row-wise operators like dedup."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
