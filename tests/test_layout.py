"""Tests: physical-layout strategies — bucketed co-located joins
(shuffle-free), repartition/coalesce semantics."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
    write_bucketed_table,
)
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed_table(spark, orders, "b_orders", "o_orderkey", 4)
    write_bucketed_table(spark, lineitem, "b_lineitem", "l_orderkey", 4)
    # Co-bucketed inputs: sort-merge join with ZERO exchanges (disable
    # broadcast so the join strategy is visible at this tiny SF).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey
            == spark.table("b_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "Exchange" not in plan, plan[:500]
    assert joined.count() == lineitem.count()
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_repartition_and_coalesce_counts(spark):
    df = spark.range(1000)
    assert df.repartition(8, "id").rdd.getNumPartitions() == 8
    assert df.repartition(8).coalesce(2).rdd.getNumPartitions() == 2
    rng = df.repartitionByRange(4, "id")
    assert rng.rdd.getNumPartitions() == 4
