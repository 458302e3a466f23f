"""Tests: event-time-timeout sessionization — sessions close on the
watermark passing last_event + gap (emission without new data for
the key), agree with session_window's session bounds, and stay open
while the watermark hasn't reached the horizon."""

from __future__ import annotations

import datetime
import time as _time

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
    run_to_memory,
)
import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.sessions import (
    stream_sessions,
    tws_available,
)

# Both stateful APIs must emit identical sessions; the TWS leg needs
# google.protobuf in the Python workers (absent in this container,
# present on typical cluster images) so it skips rather than fails.
APIS = ["classic"] + (
    ["tws"]
    if tws_available()
    else [
        pytest.param(
            "tws",
            marks=pytest.mark.skip(
                reason="transformWithStateInPandas needs google.protobuf"
            ),
        )
    ]
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def age_files(path: str, seconds: float = 60.0) -> None:
    """Push every file currently under ``path`` ``seconds`` into the
    past, so the NEXT write's natural mtime sorts strictly after it.
    The file source batches by modification time; a wall-clock sleep
    between writes is fragile on a loaded host (writes can straddle
    the sleep), an explicit mtime gap is not."""
    import glob
    import os

    t = _time.time() - seconds
    for f in glob.glob(f"{path}/**", recursive=True):
        if os.path.isfile(f):
            # only ever push mtimes BACK: an earlier batch aged further
            # into the past must keep its older stamp on later calls
            t_eff = min(t, os.path.getmtime(f))
            os.utime(f, (t_eff, t_eff))


SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@pytest.mark.parametrize("api", APIS)
def test_timeout_sessions_close_on_watermark(spark, tmp_dir, api):
    src = f"{tmp_dir}/ev_tws"
    # batch 1: user 1 has one session's worth of events; user 2 one.
    b1 = [
        (1, ts("2024-01-01T10:00:00"), 1, "click", 1.0, "{}"),
        (2, ts("2024-01-01T10:10:00"), 1, "click", 2.0, "{}"),
        (3, ts("2024-01-01T09:00:00"), 2, "view", 5.0, "{}"),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src)
    # batch 2: a far-future event advances the watermark past every
    # session horizon — user 1 and 2's sessions must CLOSE even
    # though neither key received new data. User 9's own session
    # stays open (nothing advances the watermark past it).
    b2 = [
        (9, ts("2024-01-01T20:00:00"), 9, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    run_to_memory(
        stream_sessions(
            spark, src, api=api, gap="30 minutes", watermark="1 hour",
            max_files_per_trigger=1,
        ),
        "tws_sessions",
        output_mode="append",
    )
    out = {r.user_id: r for r in spark.sql("SELECT * FROM tws_sessions").collect()}
    assert set(out) == {1, 2}  # user 9's session is still open
    # session_window semantics: end = last event + gap
    assert out[1].session_start == ts("2024-01-01T10:00:00")
    assert out[1].session_end == ts("2024-01-01T10:40:00")
    assert out[1].n_events == 2 and out[1].total_value == 3.0
    assert out[2].session_start == ts("2024-01-01T09:00:00")
    assert out[2].session_end == ts("2024-01-01T09:30:00")
    assert out[2].n_events == 1 and out[2].total_value == 5.0


@pytest.mark.parametrize("api", APIS)
def test_timeout_sessions_merge_across_batches(spark, tmp_dir, api):
    """Events for one user split across micro-batches within the gap
    fold into ONE session (state carries); the close emits once."""
    src = f"{tmp_dir}/ev_tws2"
    b1 = [(1, ts("2024-01-01T10:00:00"), 1, "click", 1.0, "{}")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src, 120.0)
    b2 = [(2, ts("2024-01-01T10:20:00"), 1, "click", 1.0, "{}")]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src, 60.0)  # b1 keeps its older stamp; b2 lands between
    b3 = [(9, ts("2024-01-01T20:00:00"), 9, "view", 0.0, "{}")]
    spark.createDataFrame(b3, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    run_to_memory(
        stream_sessions(
            spark, src, api=api, gap="30 minutes", watermark="1 hour",
            max_files_per_trigger=1,
        ),
        "tws_merge",
        output_mode="append",
    )
    out = [r for r in spark.sql("SELECT * FROM tws_merge").collect()]
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n_events == 2
    assert r.session_start == ts("2024-01-01T10:00:00")
    assert r.session_end == ts("2024-01-01T10:50:00")


@pytest.mark.parametrize("api", APIS)
def test_timeout_sessions_split_within_one_batch(spark, tmp_dir, api):
    """A backfill batch carrying several gap-separated runs for ONE
    key must emit one session per run, not a single min/max blob."""
    src = f"{tmp_dir}/ev_tws3"
    b1 = [
        (1, ts("2024-01-01T10:00:00"), 1, "click", 1.0, "{}"),
        (2, ts("2024-01-01T10:10:00"), 1, "click", 2.0, "{}"),
        # > 30 min after 10:10 — a distinct session
        (3, ts("2024-01-01T11:30:00"), 1, "click", 4.0, "{}"),
        # and a third
        (4, ts("2024-01-01T13:00:00"), 1, "click", 8.0, "{}"),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src)
    b2 = [(9, ts("2024-01-01T20:00:00"), 9, "view", 0.0, "{}")]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    run_to_memory(
        stream_sessions(
            spark, src, api=api, gap="30 minutes", watermark="1 hour",
            max_files_per_trigger=1,
        ),
        "tws_split",
        output_mode="append",
    )
    rows = sorted(
        spark.sql("SELECT * FROM tws_split WHERE user_id = 1").collect(),
        key=lambda r: r.session_start,
    )
    assert [(r.session_start, r.session_end, r.n_events, r.total_value)
            for r in rows] == [
        (ts("2024-01-01T10:00:00"), ts("2024-01-01T10:40:00"), 2, 3.0),
        (ts("2024-01-01T11:30:00"), ts("2024-01-01T12:00:00"), 1, 4.0),
        (ts("2024-01-01T13:00:00"), ts("2024-01-01T13:30:00"), 1, 8.0),
    ]


@pytest.mark.parametrize("api", APIS)
def test_timeout_sessions_split_against_stored_state(spark, tmp_dir, api):
    """A later batch whose earliest event exceeds state.last + gap
    closes the stored session instead of merging into it."""
    src = f"{tmp_dir}/ev_tws4"
    b1 = [(1, ts("2024-01-01T10:00:00"), 1, "click", 1.0, "{}")]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src, 120.0)
    # arrives before the watermark closes session 1 (wm lag 1h > gap
    # 30m), but 50 min after it — distinct session.
    b2 = [(2, ts("2024-01-01T10:50:00"), 1, "click", 2.0, "{}")]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    age_files(src, 60.0)
    b3 = [(9, ts("2024-01-01T20:00:00"), 9, "view", 0.0, "{}")]
    spark.createDataFrame(b3, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    run_to_memory(
        stream_sessions(
            spark, src, api=api, gap="30 minutes", watermark="1 hour",
            max_files_per_trigger=1,
        ),
        "tws_state_split",
        output_mode="append",
    )
    rows = sorted(
        spark.sql("SELECT * FROM tws_state_split WHERE user_id = 1").collect(),
        key=lambda r: r.session_start,
    )
    assert [(r.session_start, r.session_end, r.n_events, r.total_value)
            for r in rows] == [
        (ts("2024-01-01T10:00:00"), ts("2024-01-01T10:30:00"), 1, 1.0),
        (ts("2024-01-01T10:50:00"), ts("2024-01-01T11:20:00"), 1, 2.0),
    ]


def test_gap_parsing_units_and_errors():
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.sessions import (
        _gap_to_ms,
    )
    import pytest as _pytest

    assert _gap_to_ms("1 day") == 86_400_000
    assert _gap_to_ms("90 secs") == 90_000
    assert _gap_to_ms("2 Hours") == 7_200_000
    with _pytest.raises(ValueError, match="supported units"):
        _gap_to_ms("3 fortnights")
    with _pytest.raises(ValueError, match="expected"):
        _gap_to_ms("soon")
    with _pytest.raises(ValueError, match="positive"):
        _gap_to_ms("0 minutes")
