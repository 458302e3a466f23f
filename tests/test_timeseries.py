"""Unit tests: time-series resample + forward-fill (per-key grid
anchoring, gap filling, sub-day steps, single-observation keys)."""

from __future__ import annotations

import datetime

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.timeseries import (
    resample_ffill,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_resample_fills_gaps_per_key(spark):
    rows = [
        (1, ts("2024-01-01 06:30:00"), 10.0),
        (1, ts("2024-01-04 06:30:00"), 40.0),
        (2, ts("2024-01-02 00:00:00"), 99.0),  # single obs -> one row
    ]
    df = spark.createDataFrame(rows, "k bigint, at timestamp, v double")
    out = resample_ffill(df, "k", "at", "1 DAY", ["v"])
    got = sorted((r.k, str(r.at), r.v) for r in out.collect())
    assert got == [
        # grid anchored at the key's first observation, not midnight
        (1, "2024-01-01 06:30:00", 10.0),
        (1, "2024-01-02 06:30:00", 10.0),
        (1, "2024-01-03 06:30:00", 10.0),
        (1, "2024-01-04 06:30:00", 40.0),
        (2, "2024-01-02 00:00:00", 99.0),
    ]


def test_resample_subday_step_and_multiple_payloads(spark):
    rows = [
        (1, ts("2024-01-01 00:00:00"), 1.0, "a"),
        (1, ts("2024-01-01 09:00:00"), 2.0, "b"),
    ]
    df = spark.createDataFrame(rows, "k bigint, at timestamp, v double, s string")
    out = resample_ffill(df, "k", "at", "6 HOUR", ["v", "s"])
    got = sorted((str(r.at), r.v, r.s) for r in out.collect())
    # grid = 00:00, 06:00 (the 09:00 bound is not itself a grid step);
    # both points forward-fill from the 00:00 observation
    assert got == [
        ("2024-01-01 00:00:00", 1.0, "a"),
        ("2024-01-01 06:00:00", 1.0, "a"),
    ]
