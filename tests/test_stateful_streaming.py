"""Tests: custom stateful operator (applyInPandasWithState) — state
must carry across micro-batches AND across a query restart from the
same checkpoint."""

from __future__ import annotations

import datetime
from pathlib import Path

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.stateful import (
    stream_running_totals,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def _write_batch(spark, path, rows, part):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src, ckpt, name):
    # memory sink cannot recover from a checkpoint; foreachBatch can —
    # it is also the production shape for exactly-once custom sinks.
    collected: dict[int, tuple] = {}

    def sink(batch_df, _epoch):
        for r in batch_df.collect():
            collected[r.user_id] = (r.n_events, r.total_value)

    q = (
        stream_running_totals(spark, src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_state_survives_restart(spark, tmp_dir):
    src = f"{tmp_dir}/events"
    ckpt = f"{tmp_dir}/ckpt"
    Path(src).mkdir(parents=True)

    _write_batch(spark, src, [
        (1, ts("2024-01-01T10:00:00"), 1, "click", 2.0, "{}"),
        (2, ts("2024-01-01T10:01:00"), 1, "click", 3.0, "{}"),
        (3, ts("2024-01-01T10:02:00"), 2, "view", 10.0, "{}"),
    ], "b1")
    got1 = _run_once(spark, src, ckpt, "totals1")
    assert got1[1] == (2, 5.0)
    assert got1[2] == (1, 10.0)

    # second run, NEW query, same checkpoint: state must continue
    _write_batch(spark, src, [
        (4, ts("2024-01-01T10:10:00"), 1, "click", 1.0, "{}"),
    ], "b2")
    got2 = _run_once(spark, src, ckpt, "totals2")
    assert got2[1] == (3, 6.0)  # cumulative across restart, not (1, 1.0)
    assert 2 not in got2        # update mode: untouched keys not re-emitted
