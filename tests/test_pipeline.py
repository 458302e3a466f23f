"""Tests: stage runner (DAG semantics §2.11), quality gates, gated
idempotent writes, atomic publish."""

from __future__ import annotations

import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
    Pipeline,
    Stage,
    no_nulls,
    non_empty,
    unique_key,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
    idempotent_write,
    model_exists,
)


def test_pipeline_runs_in_dependency_order(spark):
    seen = []

    def mk(name):
        def fn(_spark, period, ctx):
            seen.append(name)
            return f"{name}@{period}"
        return fn

    pipe = Pipeline(
        [
            Stage("reviews", mk("reviews"), deps=("preprocess", "listings")),
            Stage("preprocess", mk("preprocess")),
            Stage("weather", mk("weather"), deps=("preprocess",)),
            Stage("listings", mk("listings"), deps=("preprocess",)),
            Stage("reviewers", mk("reviewers"), deps=("reviews",)),
        ]
    )
    run = pipe.run(spark, "2021-01")
    assert seen.index("preprocess") < seen.index("listings")
    assert seen.index("listings") < seen.index("reviews")
    assert seen.index("reviews") < seen.index("reviewers")
    assert run.results["reviews"] == "reviews@2021-01"


def test_pipeline_gate_failure_aborts(spark):
    df_dup = spark.createDataFrame([(1,), (1,)], "k int")
    pipe = Pipeline(
        [Stage("bad", lambda s, p, c: df_dup, gates=(("k unique", unique_key("k")),))]
    )
    with pytest.raises(RuntimeError, match="quality gate failed"):
        pipe.run(spark, "2021-01")


def test_gate_helpers(spark):
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert non_empty(ok)
    assert unique_key("k")(ok)
    assert no_nulls("k", "v")(ok)
    with_null = spark.createDataFrame([(None, "a")], "k int, v string")
    assert not no_nulls("k")(with_null)


def test_idempotent_write_skips_existing(spark, tmp_dir):
    df = spark.createDataFrame([(1,)], "k int")
    path = f"{tmp_dir}/model"
    assert idempotent_write(df, path) is True
    assert model_exists(path)
    assert idempotent_write(df, path) is False  # gated: create-if-absent
    assert idempotent_write(df, path, force=True) is True


def test_atomic_publish_swaps_and_protects(spark, tmp_dir):
    v1 = spark.createDataFrame([(1,)], "k int")
    v2 = spark.createDataFrame([(2,)], "k int")
    path = f"{tmp_dir}/published"
    atomic_publish(v1, path)
    assert [r.k for r in spark.read.parquet(path).collect()] == [1]
    # failing validation must leave v1 in place
    with pytest.raises(RuntimeError, match="validation"):
        atomic_publish(v2, path, validate=lambda p: False)
    assert [r.k for r in spark.read.parquet(path).collect()] == [1]
    atomic_publish(v2, path, validate=model_exists)
    assert [r.k for r in spark.read.parquet(path).collect()] == [2]


def test_stage_checkpoint_cuts_lineage_and_keeps_types(spark, tmp_dir):
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        stage_checkpoint,
    )

    df = spark.createDataFrame([(1, "2021-01-02")], "k int, d string").withColumn(
        "d", F.to_date("d")
    )
    out = stage_checkpoint(df, f"{tmp_dir}/ckpt_stage")
    assert dict(out.dtypes)["d"] == "date"  # no CSV-style type loss
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan  # lineage starts at the files
    assert out.collect()[0].k == 1


def test_skipped_stage_with_dependents_fails_fast(spark):
    """A stage returning None (skip) while having dependents must fail
    at the skip, not as a KeyError in the dependent."""
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
        Pipeline,
        Stage,
    )

    p = Pipeline(
        [
            Stage("a", lambda s, per, ctx: None),
            Stage("b", lambda s, per, ctx: ctx["a"], deps=("a",)),
        ]
    )
    with pytest.raises(RuntimeError, match="skipped .* consume its result"):
        p.run(spark, "p1")
    # a skip WITHOUT dependents stays a plain skip
    p2 = Pipeline([Stage("a", lambda s, per, ctx: None)])
    run = p2.run(spark, "p1")
    assert run.skipped == ["a"]


def test_observed_write_collects_metrics_in_write_job(spark, tmp_dir):
    """Quality metrics ride the write's own job (zero extra scans) and
    match a recount of the committed output."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        observed_write,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id bigint, v double"
    )
    got = observed_write(
        df,
        f"{tmp_dir}/observed",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.lit(1)) - F.count("v"),
            "max_id": F.max("id"),
        },
    )
    assert got == {"n_rows": 3, "n_null_v": 1, "max_id": 3}
    back = spark.read.parquet(f"{tmp_dir}/observed")
    assert back.count() == 3


def test_versioned_publish_pointer_rollback_prune(spark, tmp_dir):
    """Versions are immutable, the pointer flips atomically, rollback
    is a pointer rewrite, pruning keeps the newest `keep` and never
    the pointed-at version."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        read_latest,
        read_version_pointer,
        rollback_version,
        versioned_publish,
    )

    root = f"{tmp_dir}/versioned"

    def df_of(tag):
        return spark.createDataFrame([(1, tag)], "id bigint, tag string")

    assert versioned_publish(df_of("a"), root, keep=2) == 1
    assert read_latest(spark, root).collect()[0].tag == "a"

    # a reader that resolved v=1 keeps working across a later publish
    # (immutable until pruned — unlike a delete-and-rename swap)
    held = read_latest(spark, root)
    assert versioned_publish(df_of("b"), root, keep=2) == 2
    assert held.collect()[0].tag == "a"
    assert versioned_publish(df_of("c"), root, keep=2) == 3
    assert read_version_pointer(root) == 3
    assert read_latest(spark, root).collect()[0].tag == "c"

    # keep=2 → v=2 and v=3 survive, v=1 pruned
    import pathlib

    alive = sorted(p.name for p in pathlib.Path(root).glob("v=*"))
    assert alive == ["v=2", "v=3"]

    rollback_version(root, 2)
    assert read_latest(spark, root).collect()[0].tag == "b"
    # pruned version cannot be rolled back to
    import pytest

    with pytest.raises(RuntimeError):
        rollback_version(root, 1)
    # next publish after rollback continues the monotone sequence and
    # never prunes the pointed-at version
    assert versioned_publish(df_of("d"), root, keep=1) == 4
    assert read_latest(spark, root).collect()[0].tag == "d"


def test_no_drift_gate_blocks_corrupted_delivery(spark, tmp_dir):
    """The pre-publish drift gate: a candidate snapshot matching the
    published distribution passes; a unit-change corruption (prices
    x100) is blocked; the first publish (no reference) passes
    vacuously."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
        no_drift,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        atomic_publish,
    )
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ref_path = f"{tmp_dir}/orders_model"
    gate = no_drift(
        ref_path, numeric_cols=["o_totalprice"], cat_cols=["o_orderstatus"]
    )
    # no published reference yet -> vacuous pass
    assert gate(orders)
    atomic_publish(orders, ref_path)
    # same distribution (disjoint half) -> pass
    assert gate(orders.filter("o_orderkey % 2 = 1"))
    # unit-change corruption -> blocked
    corrupted = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") * 100
    )
    assert not gate(corrupted)
