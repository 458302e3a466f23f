"""Streaming HLL-ledger maintenance: micro-batch ledgers folded at
read time must equal the one-shot batch ledger; only NEW files process
on a second availableNow run; a replayed batch must not double
n_rows."""

from __future__ import annotations

import os

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
    hll_ledger,
    ledger_estimates,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
    read_streamed_ledger,
    stream_ledger_maintenance,
)

SCHEMA = "event_id bigint, event_type string, user_id bigint"

_BATCH1 = [(1, "click", 10), (2, "click", 11), (3, "view", 10)]
_BATCH2 = [(4, "click", 10), (5, "view", 12), (6, "view", 12)]


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, led, ckpt):
    q = stream_ledger_maintenance(
        spark, src, SCHEMA, led, ["event_type"], ["user_id"], ckpt
    )
    q.awaitTermination()


def _est(spark, led_df):
    return sorted(
        map(tuple, ledger_estimates(led_df, ["event_type"]).collect())
    )


def test_streamed_ledger_equals_batch_build(spark, tmp_dir):
    src, led, ckpt = (
        f"{tmp_dir}/ev",
        f"{tmp_dir}/ledger",
        f"{tmp_dir}/ckpt",
    )
    _write(spark, src, _BATCH1)
    _run(spark, src, led, ckpt)
    _write(spark, src, _BATCH2)
    _run(spark, src, led, ckpt)  # only batch 2 is new

    got = _est(spark, read_streamed_ledger(spark, led, ["event_type"]))
    want = _est(
        spark,
        hll_ledger(
            spark.createDataFrame(_BATCH1 + _BATCH2, SCHEMA),
            ["event_type"],
            ["user_id"],
        ),
    )
    assert got == want


def test_streamed_ledger_replayed_batch_keeps_exact_row_counts(
    spark, tmp_dir
):
    """Distinct estimates would survive a duplicated batch anyway
    (set-union semantics), but n_rows is raw-additive — the
    batch_id=/overwrite layout must keep it exact under replay."""
    src, led, ckpt = (
        f"{tmp_dir}/ev",
        f"{tmp_dir}/ledger",
        f"{tmp_dir}/ckpt",
    )
    _write(spark, src, _BATCH1)
    _run(spark, src, led, ckpt)
    os.remove(f"{ckpt}/commits/0")
    crc = f"{ckpt}/commits/.0.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, src, led, ckpt)  # replays batch 0 with the same id

    got = _est(spark, read_streamed_ledger(spark, led, ["event_type"]))
    want = _est(
        spark,
        hll_ledger(
            spark.createDataFrame(_BATCH1, SCHEMA),
            ["event_type"],
            ["user_id"],
        ),
    )
    assert got == want  # n_rows exact AND estimates unchanged


def test_streamed_hitters_bounds_sound_and_replay_exact(spark, tmp_dir):
    """Streamed heavy-hitters: the served fold must bound the true
    all-batches counts (lb <= true <= ub — a one-shot exact top-k is
    not recoverable across the per-batch cut, so bounds ARE the
    contract), and a replayed batch must not inflate any of the raw
    additive fields (cnt/other_max/other_mass/n_rows)."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
        read_streamed_hitters,
        stream_hitters_maintenance,
    )

    src, led, ckpt = (
        f"{tmp_dir}/hh_ev",
        f"{tmp_dir}/hh_ledger",
        f"{tmp_dir}/hh_ckpt",
    )

    def _run_hh():
        q = stream_hitters_maintenance(
            spark, src, SCHEMA, led, ["event_type"], "user_id", ckpt, k=2
        )
        q.awaitTermination()

    _write(spark, src, _BATCH1)
    _run_hh()
    _write(spark, src, _BATCH2)
    _run_hh()  # only batch 2 is new

    served = read_streamed_hitters(spark, led, ["event_type"], k=2).collect()
    exact = {
        (r["event_type"], r["user_id"]): r["c"]
        for r in spark.createDataFrame(_BATCH1 + _BATCH2, SCHEMA)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    }
    assert served
    for r in served:
        true = exact[(r["event_type"], r["item"])]
        assert r["lb"] <= true <= r["ub"], (r, true)

    # replay batch 0: served rows must be unchanged (batch_id layout)
    before = sorted(map(tuple, served))
    os.remove(f"{ckpt}/commits/1")
    crc = f"{ckpt}/commits/.1.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run_hh()  # replays batch 1 with the same id
    after = sorted(
        map(
            tuple,
            read_streamed_hitters(spark, led, ["event_type"], k=2).collect(),
        )
    )
    assert after == before


def _replay_last_batch(ckpt, batch_id):
    os.remove(f"{ckpt}/commits/{batch_id}")
    crc = f"{ckpt}/commits/.{batch_id}.crc"
    if os.path.exists(crc):
        os.remove(crc)


def test_streamed_histogram_equals_batch_build_and_replay_exact(
    spark, tmp_dir
):
    """Streamed histogram ledger: bin vectors are exactly additive, so
    the served fold must equal the one-shot batch build bit for bit —
    including the raw-additive n_rows/n_null under an at-least-once
    replay (batch_id overwrite layout)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
        histogram_ledger,
        ledger_quantiles,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
        read_streamed_histogram,
        stream_histogram_maintenance,
    )

    src, led, ckpt = (
        f"{tmp_dir}/hg_ev",
        f"{tmp_dir}/hg_ledger",
        f"{tmp_dir}/hg_ckpt",
    )

    def _run_hg():
        q = stream_histogram_maintenance(
            spark, src, SCHEMA, led, ["event_type"], "user_id",
            0.0, 16.0, ckpt, n_bins=8,
        )
        q.awaitTermination()

    _write(spark, src, _BATCH1)
    _run_hg()
    _write(spark, src, _BATCH2)
    _run_hg()  # only batch 2 is new

    folded = read_streamed_histogram(spark, led, ["event_type"])
    want_led = histogram_ledger(
        spark.createDataFrame(_BATCH1 + _BATCH2, SCHEMA),
        ["event_type"], "user_id", 0.0, 16.0, n_bins=8,
    )
    got = sorted(map(tuple, folded.collect()))
    want = sorted(map(tuple, want_led.collect()))
    assert got == want  # bins, n_rows, n_null, vmin, vmax — all exact

    # quantiles served from the streamed fold match the one-shot build
    qgot = sorted(map(tuple, ledger_quantiles(
        folded, ["event_type"], 0.0, 16.0, [0.5]).collect()))
    qwant = sorted(map(tuple, ledger_quantiles(
        want_led, ["event_type"], 0.0, 16.0, [0.5]).collect()))
    assert qgot == qwant

    # replay batch 1: the fold must be unchanged (overwrite layout)
    _replay_last_batch(ckpt, 1)
    _run_hg()
    after = sorted(map(tuple, read_streamed_histogram(
        spark, led, ["event_type"]).collect()))
    assert after == want


def test_streamed_bottomk_equals_batch_build_and_replay_exact(
    spark, tmp_dir
):
    """Streamed bottom-k sample: the bottom-k of a union IS the
    bottom-k of the merged per-batch bottom-k sets, so the served
    sample must equal the one-shot build; n_rows stays exact under
    replay because batch_id overwrite keeps periods disjoint."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
        bottomk_ledger,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
        read_streamed_bottomk,
        stream_bottomk_maintenance,
    )

    src, led, ckpt = (
        f"{tmp_dir}/bk_ev",
        f"{tmp_dir}/bk_ledger",
        f"{tmp_dir}/bk_ckpt",
    )

    def _run_bk():
        q = stream_bottomk_maintenance(
            spark, src, SCHEMA, led, ["event_type"], "user_id", ckpt, k=2
        )
        q.awaitTermination()

    _write(spark, src, _BATCH1)
    _run_bk()
    _write(spark, src, _BATCH2)
    _run_bk()  # only batch 2 is new

    got = sorted(map(tuple, read_streamed_bottomk(
        spark, led, ["event_type"], k=2).collect()))
    want = sorted(map(tuple, bottomk_ledger(
        spark.createDataFrame(_BATCH1 + _BATCH2, SCHEMA),
        ["event_type"], "user_id", k=2,
    ).collect()))
    assert got == want  # sample AND n_rows — one-shot equivalence

    # replay batch 1: sample is set-union-proof, n_rows must not double
    _replay_last_batch(ckpt, 1)
    _run_bk()
    after = sorted(map(tuple, read_streamed_bottomk(
        spark, led, ["event_type"], k=2).collect()))
    assert after == want


def test_streamed_aggstate_equals_batch_build_and_replay_exact(
    spark, tmp_dir
):
    """Streamed counts/sum/min/max state: merge(state(A), state(B)) ==
    state(A ∪ B) exactly, so the served fold must equal the one-shot
    state — and survive an at-least-once replay unchanged."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        agg_state,
        finalize_agg_state,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
        read_streamed_aggstate,
        stream_aggstate_maintenance,
    )

    src, led, ckpt = (
        f"{tmp_dir}/as_ev",
        f"{tmp_dir}/as_state",
        f"{tmp_dir}/as_ckpt",
    )

    def _run_as():
        q = stream_aggstate_maintenance(
            spark, src, SCHEMA, led, ["event_type"], "user_id", ckpt
        )
        q.awaitTermination()

    _write(spark, src, _BATCH1)
    _run_as()
    _write(spark, src, _BATCH2)
    _run_as()  # only batch 2 is new

    folded = read_streamed_aggstate(spark, led, ["event_type"])
    want_state = agg_state(
        spark.createDataFrame(_BATCH1 + _BATCH2, SCHEMA),
        ["event_type"], "user_id",
    )
    got = sorted(map(tuple, folded.collect()))
    want = sorted(map(tuple, want_state.collect()))
    assert got == want

    # finalized serving view matches the one-shot build too
    fgot = sorted(map(tuple, finalize_agg_state(
        folded, ["event_type"], "user_id").collect()))
    fwant = sorted(map(tuple, finalize_agg_state(
        want_state, ["event_type"], "user_id").collect()))
    assert fgot == fwant

    # replay batch 1: raw-additive cnt/sum must not inflate
    _replay_last_batch(ckpt, 1)
    _run_as()
    after = sorted(map(tuple, read_streamed_aggstate(
        spark, led, ["event_type"]).collect()))
    assert after == want


def test_streamed_windowed_histogram_equals_batch_build(spark, tmp_dir):
    """Event-time windowed quantile maintenance: the prepare seam
    derives the window key in-batch, and the streamed fold of
    per-(window, type) bin vectors equals the one-shot windowed
    build — including a late event landing in an old window on a
    later batch (integer adds into anchored bins)."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
        histogram_ledger,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.ledger import (
        read_streamed_histogram,
        stream_histogram_maintenance,
    )

    schema = "event_id bigint, day string, event_type string, value double"
    b1 = [(1, "2024-01-01", "click", 10.0), (2, "2024-01-01", "view", 50.0),
          (3, "2024-01-02", "click", 90.0)]
    # batch 2 carries a LATE event for the 01-01 window
    b2 = [(4, "2024-01-02", "view", 70.0), (5, "2024-01-01", "click", 30.0)]
    src, led, ckpt = f"{tmp_dir}/wh_ev", f"{tmp_dir}/wh_led", f"{tmp_dir}/wh_ck"

    def _write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)

    def _prepare(b):
        return b.withColumn("window_start", F.to_date("day"))

    def _run():
        q = stream_histogram_maintenance(
            spark, src, schema, led, ["window_start", "event_type"],
            "value", 0.0, 100.0, ckpt, n_bins=10, prepare=_prepare,
        )
        q.awaitTermination()

    _write(b1); _run()
    _write(b2); _run()

    got = sorted(map(tuple, read_streamed_histogram(
        spark, led, ["window_start", "event_type"]).collect()))
    want = sorted(map(tuple, histogram_ledger(
        _prepare(spark.createDataFrame(b1 + b2, schema)),
        ["window_start", "event_type"], "value", 0.0, 100.0, n_bins=10,
    ).collect()))
    assert got == want
