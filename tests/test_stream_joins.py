"""Tests: stream-static enrich and the stream-stream interval join
agree with their batch analogs (file source → memory sink,
availableNow) — and the interval join's pair semantics compose into
last-touch attribution."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
    run_to_memory,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.joins import (
    attribute_last_touch,
    enrich_with_static,
    interval_join_pairs,
    stream_interval_join,
    stream_static_enrich,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _write_events(spark, path):
    rows = [
        # user 1: view at 10:05, view at 10:20, click at 10:30
        #   → click attributes to the 10:20 view (2 candidates).
        #   The window is EXCLUSIVE at click - lag: a view at exactly
        #   10:00 would not count.
        (1, ts("2024-01-01T10:05:00"), 1, "view", 1.0, "{}"),
        (2, ts("2024-01-01T10:20:00"), 1, "view", 1.0, "{}"),
        (3, ts("2024-01-01T10:30:00"), 1, "click", 1.0, "{}"),
        # user 1: second click at 11:10 — outside 30 min of both views
        (4, ts("2024-01-01T11:10:00"), 1, "click", 1.0, "{}"),
        # user 2: view then click 29 min later (single candidate)
        (5, ts("2024-01-01T09:00:00"), 2, "view", 1.0, "{}"),
        (6, ts("2024-01-01T09:29:00"), 2, "click", 1.0, "{}"),
        # user 3: click with no view at all
        (7, ts("2024-01-01T09:29:00"), 3, "click", 1.0, "{}"),
        # user 4: view AFTER the click — must not attribute backwards
        (8, ts("2024-01-01T09:00:00"), 4, "click", 1.0, "{}"),
        (9, ts("2024-01-01T09:10:00"), 4, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_attribute_last_touch_semantics(spark, tmp_dir):
    df = _write_events(spark, f"{tmp_dir}/events")
    out = {r.click_id: r for r in attribute_last_touch(df).collect()}
    # clicks 4 (window expired), 7 (no view), 8 (view after) drop
    assert sorted(out) == [3, 6]
    assert out[3].attributed_view_ts == ts("2024-01-01T10:20:00")
    assert out[3].n_candidate_views == 2
    assert out[6].attributed_view_ts == ts("2024-01-01T09:00:00")
    assert out[6].n_candidate_views == 1


def test_stream_interval_join_equals_batch_pairs(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    df = _write_events(spark, src)
    run_to_memory(
        stream_interval_join(spark, src, lag="30 minutes"),
        "ssj",
        output_mode="append",
    )
    got = {
        (r.click_id, r.view_ts)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts")
    )
    expected = {
        (r.click_id, r.r_ts)
        for r in interval_join_pairs(clicks, views, lag="30 minutes").collect()
    }
    assert got == expected
    assert {c for c, _ in got} == {3, 6}  # same survivors as attribution


def test_stream_static_enrich(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    df = _write_events(spark, src)
    dim = spark.createDataFrame(
        [(1, "emea"), (2, "apac")], "user_id bigint, region string"
    )
    run_to_memory(
        stream_static_enrich(spark, src, dim), "sse", output_mode="append"
    )
    out = spark.sql("SELECT * FROM sse").collect()
    assert len(out) == df.count()  # left join keeps unmatched users
    regions = {r.user_id: r.region for r in out}
    assert regions[1] == "emea" and regions[2] == "apac"
    assert regions[3] is None  # no dim row
    # batch analog agrees
    batch = enrich_with_static(df, dim).collect()
    assert {(r.event_id, r.region) for r in batch} == {
        (r.event_id, r.region) for r in out
    }


def test_stream_interval_join_evicts_expired_state(spark, tmp_dir):
    """State-eviction contract: a buffered view is held only while the
    watermark allows an in-window click to still arrive (view_ts + lag
    vs watermark); once evicted, a later click finds no partner — the
    bound that keeps join state O(rate × horizon), not O(history).
    Note the guarantee's direction: Spark promises no MISSED pairs
    inside the watermark horizon; beyond it, state is gone. (A late
    pair arriving together in one batch may still match intra-batch —
    that is allowed, and why this test splits the pair across
    batches.) Sequenced with maxFilesPerTrigger=1 so each file is its
    own micro-batch (the file source orders by mtime)."""
    from tests.test_sessions_timeout import age_files as _age

    src = f"{tmp_dir}/ev_late"
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    # batch 1: an in-window pair at 11:50/12:00 (the positive control)
    # plus a lone view for user 2 at 10:00. The batch advances the
    # watermark to 12:00 - 1h = 11:00, which is past the lone view's
    # match horizon (10:00 + 30 min) — so its state is evicted.
    b1 = [
        (1, ts("2024-01-01T11:50:00"), 1, "view", 1.0, "{}"),
        (2, ts("2024-01-01T12:00:00"), 1, "click", 1.0, "{}"),
        (3, ts("2024-01-01T10:00:00"), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    _age(src, 120.0)  # explicit mtime gap: the file source sequences batches
    # batch 2: an unmatched click far ahead — emits nothing itself,
    # but runs a cleanup pass under the post-batch-1 watermark (11:00),
    # which purges user 2's view (eviction happens at batch END, so a
    # batch is needed between the watermark advance and the probe).
    b2 = [
        (9, ts("2024-01-01T13:00:00"), 9, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    _age(src, 60.0)
    # batch 3: user 2's in-window click — its view is gone from state
    # (and the click itself sits below the watermark), so no pair.
    b3 = [
        (4, ts("2024-01-01T10:15:00"), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(b3, schema).coalesce(1).write.mode("append").parquet(src)

    run_to_memory(
        stream_interval_join(
            spark, src, lag="30 minutes", watermark="1 hour",
            max_files_per_trigger=1,
        ),
        "ssj_late",
        output_mode="append",
    )
    out = spark.sql("SELECT * FROM ssj_late").collect()
    assert {r.click_id for r in out} == {2}
    assert len(out) == 1
