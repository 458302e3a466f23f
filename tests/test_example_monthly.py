"""End-to-end test of the reference-shaped monthly pipeline example —
including the incremental re-run (delta filter + merge) path."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.monthly import (
    build_pipeline,
)
from tests.conftest import SF_DIR


def test_monthly_pipeline_full_and_incremental(spark, tmp_dir):
    pipe = build_pipeline(SF_DIR, tmp_dir)
    run1 = pipe.run(spark, "1998-01")
    fact1 = run1.results["orders_fact"]
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert fact1.count() == n_orders
    assert "customer_nation" in fact1.columns  # FK enrichment happened
    hist = {r.n_attr: r.num_entities for r in run1.results["warehouse"].collect()}
    assert sum(hist.values()) > 0

    # Incremental re-run: preprocess gated (skip), fact takes the
    # delta-filter + merge path against the published model; the merge
    # must be idempotent on re-delivered rows.
    run2 = pipe.run(spark, "1998-01")
    fact2 = run2.results["orders_fact"]
    assert fact2.count() == n_orders
    assert (
        fact2.select("o_orderkey").distinct().count() == n_orders
    )  # still PK-unique after merge
