"""Tests: retention-delete orchestration for the monotone (sketch)
ledger families (operators.retention) — HLL registers have no
inverse, so deletes recompute the affected period partitions from the
surviving source; the folded ledger afterwards must equal a full
rebuild from the survivors, and unaffected history is never read."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retention import (
    periods_touched_by_keys,
    rebuild_ledger_periods,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
    hll_ledger,
    ledger_estimates,
    merge_hll_ledgers,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
)

PERIODS = [(0, 100), (100, 200), (200, 300)]


def _source(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        F.concat(F.lit("L"), (F.col("id") % 7).cast("string")).alias("lang"),
    )


def _publish_all(spark, src, root):
    for lo, hi in PERIODS:
        delta = hll_ledger(
            src.filter(F.col("doc_id").between(lo, hi - 1)),
            ["source"], ["doc_id", "lang"],
        )
        atomic_publish(delta, f"{root}/period={lo}_{hi}")


def _estimates(spark, root):
    full = spark.read.parquet(root).drop("period")
    folded = merge_hll_ledgers([full], ["source"])
    return sorted(
        map(tuple, ledger_estimates(folded, ["source"]).collect())
    )


def test_periods_touched_is_pure_arithmetic():
    assert periods_touched_by_keys([5, 150], PERIODS) == ["0_100", "100_200"]
    assert periods_touched_by_keys([], PERIODS) == []
    assert periods_touched_by_keys([299], PERIODS) == ["200_300"]
    assert periods_touched_by_keys([300], PERIODS) == []  # out of range


def test_sketch_ledger_delete_equals_rebuild_from_survivors(
    spark, tmp_path_factory
):
    base = str(tmp_path_factory.mktemp("ret"))
    root = f"{base}/hll_ledger"
    src = _source(spark)
    _publish_all(spark, src, root)

    # retention: drop every doc_id % 5 inside period 1 AND the entire
    # period 2 — one partition rebuilds, one drops
    deleted = [k for k in range(100, 200) if k % 5 == 0] + list(
        range(200, 300)
    )
    survivors = src.filter(~F.col("doc_id").isin(deleted))
    touched = periods_touched_by_keys(deleted, PERIODS)
    assert touched == ["100_200", "200_300"]

    def build(period: str):
        lo, hi = (int(x) for x in period.split("_"))
        return hll_ledger(
            survivors.filter(F.col("doc_id").between(lo, hi - 1)),
            ["source"], ["doc_id", "lang"],
        )

    import os

    untouched_before = sorted(os.listdir(f"{root}/period=0_100"))
    actions = rebuild_ledger_periods(spark, root, touched, build)
    assert actions == {"100_200": "rebuilt", "200_300": "dropped"}
    # unaffected history untouched on disk (never read, never written)
    assert sorted(os.listdir(f"{root}/period=0_100")) == untouched_before
    assert not os.path.exists(f"{root}/period=200_300")

    # the folded post-delete ledger == a full rebuild from survivors
    fresh_root = f"{base}/fresh"
    _publish_all(spark, survivors, fresh_root)
    # the fresh rebuild also never creates the emptied partition
    assert os.path.exists(f"{fresh_root}/period=200_300")  # delta empty...
    got = _estimates(spark, root)
    want = _estimates(spark, fresh_root)
    assert got == want
    # sanity: the delete actually changed the estimates
    spark.catalog.refreshByPath(root)
    assert got != _estimates_noassert_helper(spark, src, base)


def _estimates_noassert_helper(spark, src, base):
    pre_root = f"{base}/pre"
    _publish_all(spark, src, pre_root)
    return _estimates(spark, pre_root)


def test_rebuild_is_replay_idempotent(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ret2"))
    root = f"{base}/hll_ledger"
    src = _source(spark, n=200)
    for lo, hi in PERIODS[:2]:
        atomic_publish(
            hll_ledger(
                src.filter(F.col("doc_id").between(lo, hi - 1)),
                ["source"], ["doc_id", "lang"],
            ),
            f"{root}/period={lo}_{hi}",
        )
    survivors = src.filter("doc_id % 2 = 0")

    def build(period: str):
        lo, hi = (int(x) for x in period.split("_"))
        return hll_ledger(
            survivors.filter(F.col("doc_id").between(lo, hi - 1)),
            ["source"], ["doc_id", "lang"],
        )

    rebuild_ledger_periods(spark, root, ["0_100", "100_200"], build)
    first = _estimates(spark, root)
    # replaying the same rebuild converges (deterministic builders,
    # atomic republish)
    rebuild_ledger_periods(spark, root, ["0_100", "100_200"], build)
    spark.catalog.refreshByPath(root)
    assert _estimates(spark, root) == first
