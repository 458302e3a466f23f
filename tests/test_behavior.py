"""Unit tests: product-analytics operators — sequential funnel
(strict ordering, conversion gap, earliest-event binding) and weekly
retention cohorts (Monday truncation, offset arithmetic)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.behavior import (
    funnel_steps,
    retention_cohorts,
)

def _steps():
    # built lazily: Column exprs need an active SparkContext
    return [
        ("view", F.col("etype") == "view"),
        ("click", F.col("etype") == "click"),
        ("purchase", F.col("etype") == "purchase"),
    ]


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _events(spark):
    rows = [
        # u1: clean view -> click -> purchase, all within the hour
        (1, "view", ts("2024-01-01 10:00:00")),
        (1, "click", ts("2024-01-01 10:10:00")),
        (1, "purchase", ts("2024-01-01 10:20:00")),
        # u2: click BEFORE the first view only -> stops at view
        (2, "click", ts("2024-01-01 09:00:00")),
        (2, "view", ts("2024-01-01 09:30:00")),
        # u3: click 2h after view -> converts only without the 1h gap
        (3, "view", ts("2024-01-01 08:00:00")),
        (3, "click", ts("2024-01-01 10:00:00")),
        # u4: never views -> reaches nothing
        (4, "click", ts("2024-01-01 11:00:00")),
        (4, "purchase", ts("2024-01-01 11:05:00")),
    ]
    return spark.createDataFrame(rows, "uid bigint, etype string, at timestamp")


def test_funnel_strict_order_and_gap(spark):
    out = funnel_steps(_events(spark), "uid", "at", _steps(), max_gap="1 HOUR")
    rows = {r.step: (r.step_idx, r.users) for r in out.collect()}
    assert rows == {"view": (1, 3), "click": (2, 1), "purchase": (3, 1)}


def test_funnel_without_gap_admits_slow_conversion(spark):
    out = funnel_steps(_events(spark), "uid", "at", _steps())
    rows = {r.step: r.users for r in out.collect()}
    # u3's 2h-later click now counts; u2's click is still too early
    assert rows == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_binds_to_earliest_qualifying_event(spark):
    # Second view at 10:50 is irrelevant: step 1 binds to 10:00, so
    # the 11:30 click is outside the 1h gap even though it is within
    # an hour of the later view.
    rows = [
        (1, "view", ts("2024-01-01 10:00:00")),
        (1, "view", ts("2024-01-01 10:50:00")),
        (1, "click", ts("2024-01-01 11:30:00")),
    ]
    df = spark.createDataFrame(rows, "uid bigint, etype string, at timestamp")
    out = funnel_steps(df, "uid", "at", _steps(), max_gap="1 HOUR")
    assert {r.step: r.users for r in out.collect()} == {
        "view": 1, "click": 0, "purchase": 0,
    }


def test_retention_matrix_offsets_and_distinct_users(spark):
    # 2024-01-01 is a Monday. u1 cohort = week of Jan 1, active that
    # week (twice -> still one distinct) and in week 2; u2 cohort =
    # week of Jan 8, active in weeks 0 and 1.
    rows = [
        (1, ts("2024-01-02 10:00:00")),
        (1, ts("2024-01-03 10:00:00")),
        (1, ts("2024-01-16 10:00:00")),
        (2, ts("2024-01-08 00:00:00")),
        (2, ts("2024-01-14 23:59:59")),
        (2, ts("2024-01-15 00:00:00")),
    ]
    df = spark.createDataFrame(rows, "uid bigint, at timestamp")
    out = retention_cohorts(df, "uid", "at")
    got = {
        (str(r.cohort_week), r.week_offset): r.active_users
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }
