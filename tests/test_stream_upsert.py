"""Tests: streaming CDC upsert loop — micro-batch folds must equal
the one-shot batch fold of the whole feed, survive a second
availableNow run from the same checkpoint (only new files processed),
and be idempotent under batch replay."""

from __future__ import annotations

from pathlib import Path

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
    apply_cdc,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.upsert import (
    stream_upsert_snapshot,
)

CHANGES_SCHEMA = "id bigint, name string, bal double, seq int, op string"


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, bal double",
    )


def _write_changes(spark, path, rows):
    spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, changes, snap_path, ckpt):
    q = stream_upsert_snapshot(
        spark, changes, CHANGES_SCHEMA, snap_path, ["id"], "seq", "op", ckpt
    )
    q.awaitTermination()


def test_stream_upsert_equals_batch_fold(spark, tmp_dir):
    changes = f"{tmp_dir}/changes"
    snap_path = f"{tmp_dir}/snapshot"
    ckpt = f"{tmp_dir}/ckpt"
    Path(changes).mkdir(parents=True)
    atomic_publish(_snap(spark), snap_path)

    b1 = [(1, "a1", 11.0, 1, "U"), (4, "d", 40.0, 2, "I")]
    b2 = [(2, "b0", 0.0, 3, "D"), (1, "a2", 12.0, 4, "U")]

    _write_changes(spark, changes, b1)
    _run(spark, changes, snap_path, ckpt)
    mid = {r.id: (r.name, r.bal) for r in spark.read.parquet(snap_path).collect()}
    assert mid[1] == ("a1", 11.0) and mid[4] == ("d", 40.0)

    # second availableNow run, same checkpoint: only the NEW files fold
    _write_changes(spark, changes, b2)
    _run(spark, changes, snap_path, ckpt)
    got = {r.id: (r.name, r.bal) for r in spark.read.parquet(snap_path).collect()}

    full_feed = spark.createDataFrame(b1 + b2, CHANGES_SCHEMA)
    want = {
        r.id: (r.name, r.bal)
        for r in apply_cdc(_snap(spark), full_feed, ["id"], "seq", "op").collect()
    }
    assert got == want
    assert 2 not in got and got[1] == ("a2", 12.0)


def test_stream_upsert_replay_is_idempotent(spark, tmp_dir):
    """Re-merging an already-applied batch (at-least-once replay) must
    leave the snapshot unchanged."""
    changes = f"{tmp_dir}/changes"
    snap_path = f"{tmp_dir}/snapshot"
    Path(changes).mkdir(parents=True)
    atomic_publish(_snap(spark), snap_path)

    batch = [(1, "a1", 11.0, 1, "U"), (3, "c", 30.0, 2, "D")]
    feed = spark.createDataFrame(batch, CHANGES_SCHEMA)
    once = apply_cdc(spark.read.parquet(snap_path), feed, ["id"], "seq", "op")
    atomic_publish(once, snap_path)
    first = sorted(map(tuple, spark.read.parquet(snap_path).collect()))

    twice = apply_cdc(spark.read.parquet(snap_path), feed, ["id"], "seq", "op")
    atomic_publish(twice, snap_path)
    second = sorted(map(tuple, spark.read.parquet(snap_path).collect()))
    assert first == second
