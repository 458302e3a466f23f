"""Tests: feature-store example DAG — leakage gate enforced, features
strictly precede labels, deterministic republish, Z-ordered output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.features import (
    build_pipeline,
    no_leakage,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("features"))
    return build_pipeline(SF_DIR, wd).run(spark, "2024-01"), wd


def test_pipeline_runs_all_stages_and_gates(spark, run):
    r, _ = run
    assert r.executed == [
        "ingest", "features", "labels", "training_set", "published",
    ] or set(r.executed) == {
        "ingest", "features", "labels", "training_set", "published",
    }
    out = r.results["published"]
    assert out.count() > 0
    # every row: feature instant strictly before the label instant
    assert out.filter(F.col("feat_ts") >= F.col("ts")).count() == 0
    # features are real history: clicks_before counts only prior clicks
    assert out.filter(F.col("clicks_before") < 0).count() == 0


def test_training_set_matches_manual_strict_lookup(spark, run):
    """Spot-check: for the 20 earliest labels, the joined feature row
    is exactly the user's newest click strictly before the label."""
    r, _ = run
    ts_set = r.results["training_set"]
    ingest = r.results["ingest"]
    clicks = {
        (row.user_id, row.ts)
        for row in ingest.filter("event_type = 'click'")
        .select("user_id", "ts")
        .collect()
    }
    for row in ts_set.orderBy("ts", "event_id").limit(20).collect():
        prior = [t for (u, t) in clicks if u == row.user_id and t < row.ts]
        assert prior, row
        assert row.feat_ts == max(prior)


def test_republish_is_deterministic(spark, run, tmp_path_factory):
    r, _ = run
    wd2 = str(tmp_path_factory.mktemp("features2"))
    r2 = build_pipeline(SF_DIR, wd2).run(spark, "2024-01")
    a = sorted(map(tuple, r.results["published"].collect()))
    b = sorted(map(tuple, r2.results["published"].collect()))
    assert a == b


def test_no_leakage_gate_rejects_contaminated_frame(spark):
    bad = spark.createDataFrame(
        [(1, 10, 10)], "event_id bigint, ts bigint, feat_ts bigint"
    )
    assert not no_leakage(bad)
