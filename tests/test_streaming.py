"""Tests: true Structured Streaming runs (file source → memory sink,
availableNow) agree with their batch analogs — the property that makes
the catalog's batch oracles meaningful for the streaming pipelines."""

from __future__ import annotations

import datetime

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
    run_to_memory,
    session_agg,
    stream_dedup,
    stream_tumbling,
    tumbling_agg,
    watermark_dedup,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _write_events(spark, path):
    rows = [
        (1, ts("2024-01-01T10:05:00"), 1, "click", 1.0, "{}"),
        (2, ts("2024-01-01T10:55:00"), 1, "click", 2.0, "{}"),
        (3, ts("2024-01-01T11:05:00"), 2, "view", 3.0, "{}"),
        (3, ts("2024-01-01T11:05:00"), 2, "view", 3.0, "{}"),  # duplicate id
        (4, ts("2024-01-01T12:40:00"), 1, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_stream_tumbling_equals_batch(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    batch_df = _write_events(spark, src)
    streaming = stream_tumbling(spark, src, width="1 hour")
    run_to_memory(streaming, "tumb", output_mode="complete")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM tumb").collect()
    }
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling_agg(batch_df, "1 hour")
        .select("window_start", "event_type", "n_events")
        .collect()
    }
    assert got == expected
    assert got[(ts("2024-01-01T10:00:00"), "click")] == 2


def test_stream_dedup_drops_redelivered(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    _write_events(spark, src)
    run_to_memory(stream_dedup(spark, src), "dedup", output_mode="append")
    out = spark.sql("SELECT * FROM dedup").collect()
    assert len(out) == 4  # 5 rows, one duplicated event_id
    ids = sorted(r.event_id for r in out)
    assert ids == [1, 2, 3, 4]


def test_batch_watermark_dedup_matches(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    df = _write_events(spark, src)
    assert watermark_dedup(df).count() == 4


def test_session_agg_gap_semantics(spark, tmp_dir):
    df = _write_events(spark, f"{tmp_dir}/events")
    sessions = session_agg(df, "30 minutes").collect()
    user1 = sorted(
        [r for r in sessions if r.user_id == 1], key=lambda r: r.session_start
    )
    # user 1: 10:05 and 10:55 are 50min apart → separate sessions; 12:40 third
    assert len(user1) == 3
    assert user1[0].session_end == ts("2024-01-01T10:35:00")


def test_stream_dedup_within_watermark(spark, tmp_dir):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
        stream_dedup_within_watermark,
    )

    src = f"{tmp_dir}/events"
    _write_events(spark, src)
    run_to_memory(
        stream_dedup_within_watermark(spark, src), "dedup_wm", output_mode="append"
    )
    out = spark.sql("SELECT * FROM dedup_wm").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3, 4]


def test_append_mode_watermark_drops_late_rows(spark, tmp_dir):
    """Append-mode windowed aggregation with a 30-min watermark: a row
    arriving behind the watermark must NOT reopen its (already
    finalized) window — the streaming form of the reference's
    late-data policy."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
        stream_tumbling,
    )

    src = f"{tmp_dir}/events"
    ckpt = f"{tmp_dir}/ckpt_late"
    emitted = {}

    def sink(batch_df, _epoch):
        for r in batch_df.collect():
            key = (r.window_start, r.event_type)
            emitted[key] = emitted.get(key, 0) + r.n_events

    def run():
        q = (
            stream_tumbling(spark, src, width="1 hour", watermark="30 minutes")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    batch1 = [
        (1, ts("2024-01-01T10:05:00"), 1, "click", 1.0, "{}"),
        (2, ts("2024-01-01T12:00:00"), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    run()
    # watermark after batch1 = 12:00 - 30min = 11:30 → 10:00 window closed
    assert emitted.get((ts("2024-01-01T10:00:00"), "click")) == 1

    batch2 = [
        (3, ts("2024-01-01T10:10:00"), 2, "click", 1.0, "{}"),  # LATE: behind watermark
        (4, ts("2024-01-01T13:40:00"), 1, "click", 1.0, "{}"),  # advances watermark
    ]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    run()
    # the late row must not have re-emitted or incremented the 10:00 window
    assert emitted[(ts("2024-01-01T10:00:00"), "click")] == 1

    # one more trigger: the watermark recorded after batch2 (13:10)
    # closes the 12:00-13:00 window on the next run — WITHOUT the late
    # 10:10 row ever appearing anywhere.
    batch3 = [(5, ts("2024-01-01T15:00:00"), 1, "view", 1.0, "{}")]
    spark.createDataFrame(batch3, schema).write.mode("append").parquet(src)
    run()
    assert emitted[(ts("2024-01-01T10:00:00"), "click")] == 1
    assert emitted.get((ts("2024-01-01T12:00:00"), "click")) == 1
    # late event's own window (10:00, user2's 10:10 click) never re-emitted
    total_clicks = sum(v for (w, t), v in emitted.items() if t == "click")
    assert total_clicks == 3  # events 1, 2, 4 — late event 3 dropped


def test_stream_sliding_equals_batch(spark, tmp_dir):
    """True-stream sliding windows (1h width, 30m hop) must agree with
    the batch analog the oracle checks."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
        EVENTS_SCHEMA,
        sliding_agg,
    )

    src = f"{tmp_dir}/events"
    batch_df = _write_events(spark, src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(src)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n_events"
        )
    )
    run_to_memory(stream, "slide", output_mode="complete")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM slide").collect()
    }
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in sliding_agg(batch_df, "1 hour", "30 minutes").collect()
    }
    assert got == expected
