"""Unit tests: warehouse merge operators — CDC apply (latest-wins,
delete folding, insert, passthrough) and SCD Type-2 interval builds
(island collapse, half-open coverage, null-safe attribute changes)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
    apply_cdc,
    scd2_intervals,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _snapshot(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id bigint, name string, bal double",
    )


def test_apply_cdc_latest_wins_and_deletes(spark):
    changes = spark.createDataFrame(
        [
            # key 1: U then D -> deleted
            (1, "a1", 11.0, 1, "U"),
            (1, "a1", 11.0, 2, "D"),
            # key 2: D then U -> survives with the update payload
            (2, "b0", 0.0, 1, "D"),
            (2, "b2", 22.0, 2, "U"),
            # key 5: pure insert
            (5, "e", 50.0, 1, "I"),
            # key 3: single update
            (3, "c9", 33.0, 1, "U"),
        ],
        "id bigint, name string, bal double, seq int, op string",
    )
    out = apply_cdc(_snapshot(spark), changes, ["id"], "seq", "op")
    rows = {r.id: (r.name, r.bal) for r in out.collect()}
    assert set(rows) == {2, 3, 4, 5}  # 1 deleted, 4 untouched
    assert rows[2] == ("b2", 22.0)
    assert rows[3] == ("c9", 33.0)
    assert rows[4] == ("d", 40.0)
    assert rows[5] == ("e", 50.0)
    assert out.columns == ["id", "name", "bal"]


def test_apply_cdc_empty_feed_is_identity(spark):
    snap = _snapshot(spark)
    changes = spark.createDataFrame(
        [], "id bigint, name string, bal double, seq int, op string"
    )
    out = apply_cdc(snap, changes, ["id"], "seq", "op")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, snap.collect()))


def test_scd2_collapses_runs_with_half_open_intervals(spark):
    hist = spark.createDataFrame(
        [
            (1, "gold", ts("2024-01-01"), 1),
            (1, "gold", ts("2024-02-01"), 2),  # same value: merges
            (1, "silver", ts("2024-03-01"), 3),
            (1, "gold", ts("2024-04-01"), 4),  # value returns: NEW island
            (2, "bronze", ts("2024-01-15"), 5),
        ],
        "uid bigint, tier string, at timestamp, eid bigint",
    )
    out = scd2_intervals(hist, "uid", "tier", "at", "eid")
    rows = sorted(
        [(r.uid, r.tier, r.effective_from, r.effective_to, r.is_current)
         for r in out.collect()]
    )
    assert rows == [
        (1, "gold", ts("2024-01-01"), ts("2024-03-01"), False),
        (1, "gold", ts("2024-04-01"), None, True),
        (1, "silver", ts("2024-03-01"), ts("2024-04-01"), False),
        (2, "bronze", ts("2024-01-15"), None, True),
    ]
    # Half-open coverage: each non-current interval closes exactly at
    # the next interval's start, so the timeline has no gaps/overlaps.


def test_scd2_null_attribute_is_null_safe(spark):
    hist = spark.createDataFrame(
        [
            (1, None, ts("2024-01-01"), 1),
            (1, None, ts("2024-02-01"), 2),   # NULL->NULL: no change
            (1, "x", ts("2024-03-01"), 3),    # NULL->x: change
        ],
        "uid bigint, tier string, at timestamp, eid bigint",
    )
    out = scd2_intervals(hist, "uid", "tier", "at", "eid")
    rows = sorted(
        [(r.tier, r.effective_from, r.is_current) for r in out.collect()],
        key=str,
    )
    assert rows == [
        ("x", ts("2024-03-01"), True),
        (None, ts("2024-01-01"), False),
    ]


def test_scd2_tie_breaks_on_unique_column(spark):
    # Two events at the SAME timestamp: eid orders them, so the
    # interval sequence is deterministic.
    hist = spark.createDataFrame(
        [
            (1, "a", ts("2024-01-01"), 2),
            (1, "b", ts("2024-01-01"), 1),
        ],
        "uid bigint, tier string, at timestamp, eid bigint",
    )
    out = scd2_intervals(hist, "uid", "tier", "at", "eid")
    rows = {r.tier: r.is_current for r in out.collect()}
    assert rows == {"b": False, "a": True}


def test_agg_state_merge_equals_full_recompute(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.25), ("a", -3.0), ("b", 7.0), ("b", 0.5)],
        "k string, x double",
    )
    parts = [
        df.filter("x > 1"), df.filter("x <= 1"),
        df.filter("1 = 0"),  # empty part folds as identity
    ]
    merged = merge_agg_states(
        ["k"], *[agg_state(p, ["k"], "x") for p in parts]
    )
    got = {
        r.k: (r.cnt, r.sum_x, r.avg_x, r.min_x, r.max_x)
        for r in finalize_agg_state(merged, ["k"], "x").collect()
    }
    direct = {
        r.k: (r.cnt, r.sum_x, r.avg_x, r.min_x, r.max_x)
        for r in finalize_agg_state(
            agg_state(df, ["k"], "x"), ["k"], "x"
        ).collect()
    }
    assert got == direct
    assert got["a"] == (3, 0.75, 0.25, -3.0, 2.25)
    assert got["b"] == (2, 7.5, 3.75, 0.5, 7.0)


def test_snapshot_diff_classifies_i_d_u(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        "k bigint, s string, v double",
    )
    rows = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 deleted (old payload), 2 updated (new payload), 3 unchanged
    # (null-safe equal — no row), 4 inserted
    assert set(rows) == {1, 2, 4}
    assert rows[1].op == "D" and rows[1].v == 10.0
    assert rows[2].op == "U" and rows[2].v == 25.0
    assert rows[2].changed_cols == ["v"]
    assert rows[4].op == "I" and rows[4].changed_cols == []


def test_snapshot_diff_null_transitions_and_compare_subset(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None, 1.0), (2, "x", 2.0)], "k bigint, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "now", 1.0), (2, None, 99.0)], "k bigint, s string, v double"
    )
    rows = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    # null -> value and value -> null both count as changes
    assert rows[1].op == "U" and rows[1].changed_cols == ["s"]
    assert sorted(rows[2].changed_cols) == ["s", "v"]
    # restricting compare_cols hides the v change
    only_s = {
        r.k: r
        for r in snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    }
    assert only_s[2].changed_cols == ["s"]


def test_snapshot_diff_roundtrips_through_apply_cdc(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        apply_cdc,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k bigint, s string, v double",
    )
    feed = snapshot_diff(old, new, ["k"]).withColumn(
        "seq", F.lit(1)
    )
    rebuilt = apply_cdc(old, feed, ["k"], "seq", "op", delete_op="D")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
