"""The reference's monthly ETL workflow, end to end, on the testdata.

Mirrors the Airflow DAG stage graph (``airbnb-etl-airflow.py:536-551``:
preprocess → {dims ∥ small-dims} → fact merge → per-entity rollup →
warehouse → analytics) with the engine's operators, mapped onto the
TPC-H-ish tables per FIXTURES.md:

- raw CSV ingest with the reference's dialect (S1) from a simulated
  landing zone, normalized (P2) and re-laid-out as partitioned parquet
  (S7, year/month pruning index)
- dimension build: latest-snapshot-per-key (W1) for the customer dim
- fact build: delta filter (J7) against the published model, broadcast
  FK enrichment (J1/J3), incremental merge (U1+A9+W1)
- per-entity rollup: collect_set per key (A10/W3) — the reviewers stage
- staged atomic publish + quality gates (S11/S12, §2.11)
- warehouse tables + the analytical query set (S10, entry point 3→2)

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.monthly [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    collect_set_csv,
    nested_histogram,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
    broadcast_enrich,
    delta_filter,
    incremental_merge,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    normalize_columns,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
    latest_per_key_rn,
)
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
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
    create_warehouse_table,
    read_csv_dialect,
    write_csv,
    write_parquet,
)


def build_pipeline(sf_dir: str, workdir: str) -> Pipeline:
    landing = f"{workdir}/landing"
    lake = f"{workdir}/lake"
    model = f"{workdir}/model"

    def land_raw(spark: SparkSession, period: str, ctx):
        """Simulated landing zone: the month's raw deliveries as quoted
        CSV (what the reference scrapes from S3)."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        write_csv(orders, f"{landing}/orders")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        write_csv(
            customer.toDF(*[c.upper().replace("_", " ") for c in customer.columns]),
            f"{landing}/customer",
        )
        return landing

    def preprocess(spark: SparkSession, period: str, ctx):
        """S1 CSV dialect ingest → P2 normalize → S7 partitioned parquet."""
        orders = read_csv_dialect(
            spark,
            f"{landing}/orders",
            schema=(
                "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
                " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
            ),
        )
        staged = orders.withColumn("order_year", F.year("o_orderdate")).withColumn(
            "order_month", F.month("o_orderdate")
        )
        idempotent_write(
            staged,
            f"{lake}/orders",
            writer=lambda df, p: write_parquet(
                df, p, partition_by=["order_year", "order_month"]
            ),
        )
        customer = normalize_columns(
            read_csv_dialect(spark, f"{landing}/customer")
        ).withColumn("load_period", F.lit(period))
        idempotent_write(customer, f"{lake}/customer")
        return lake

    def build_customer_dim(spark: SparkSession, period: str, ctx):
        """W1 latest-per-key over the (re-delivered) customer rows.
        Recency = the delivery period stamped at ingest; a full-row
        content hash is the unique tie-break among same-period
        re-deliveries (ordering by the partition key itself would make
        the survivor arbitrary)."""
        customer = spark.read.parquet(f"{lake}/customer")
        payload = [c for c in customer.columns if c != "load_period"]
        dim = latest_per_key_rn(
            customer, ["c_custkey"], [F.col("load_period"), F.xxhash64(*payload)]
        ).drop("load_period")
        atomic_publish(dim, f"{model}/customer_dim", validate=model_exists)
        return spark.read.parquet(f"{model}/customer_dim")

    def build_fact(spark: SparkSession, period: str, ctx):
        """J7 delta filter vs the published model + J1 broadcast FK
        enrichment + incremental merge, atomically published."""
        orders = spark.read.parquet(f"{lake}/orders")
        dim = ctx["customer_dim"].select(
            "c_custkey", F.col("c_nationkey").alias("customer_nation")
        )
        if model_exists(f"{model}/orders_fact"):
            published = spark.read.parquet(f"{model}/orders_fact")
            delta = delta_filter(orders, published, "o_orderdate", "o_orderdate")
            enriched = broadcast_enrich(
                delta, dim, F.col("o_custkey") == F.col("c_custkey")
            ).drop("c_custkey")
            merged = incremental_merge(
                published,
                enriched,
                ["o_orderkey"],
                ["o_orderdate", "o_totalprice"],
            )
        else:
            merged = broadcast_enrich(
                orders, dim, F.col("o_custkey") == F.col("c_custkey")
            ).drop("c_custkey")
        atomic_publish(merged, f"{model}/orders_fact", validate=model_exists)
        return spark.read.parquet(f"{model}/orders_fact")

    def build_entity_rollup(spark: SparkSession, period: str, ctx):
        """The reviewers stage: per-entity attribute set + last seen."""
        fact = ctx["orders_fact"]
        sets = collect_set_csv(
            fact, ["o_custkey"], "o_orderpriority", "priorities_seen"
        )
        latest = latest_per_key_rn(
            fact.select("o_custkey", "o_orderdate", "o_orderkey"),
            ["o_custkey"],
            ["o_orderdate", "o_orderkey"],
        ).select("o_custkey", F.col("o_orderdate").alias("last_ordered"))
        rollup = sets.join(latest, "o_custkey")
        atomic_publish(rollup, f"{model}/customer_rollup", validate=model_exists)
        return spark.read.parquet(f"{model}/customer_rollup")

    def warehouse(spark: SparkSession, period: str, ctx):
        """S10: managed tables + the analytical query set."""
        create_warehouse_table(spark, ctx["orders_fact"], "wh_orders")
        create_warehouse_table(spark, ctx["customer_rollup"], "wh_customer_rollup")
        histogram = nested_histogram(
            spark.table("wh_orders").select("o_custkey", "o_orderpriority"),
            "o_custkey",
            "o_orderpriority",
        )
        return histogram

    return Pipeline(
        [
            Stage("landing", land_raw),
            Stage("preprocess", preprocess, deps=("landing",)),
            Stage(
                "customer_dim",
                build_customer_dim,
                deps=("preprocess",),
                gates=(
                    ("non-empty", non_empty),
                    ("pk unique", unique_key("c_custkey")),
                    ("pk not null", no_nulls("c_custkey")),
                ),
            ),
            Stage(
                "orders_fact",
                build_fact,
                deps=("preprocess", "customer_dim"),
                gates=(
                    ("non-empty", non_empty),
                    ("pk unique", unique_key("o_orderkey")),
                ),
            ),
            Stage(
                "customer_rollup",
                build_entity_rollup,
                deps=("orders_fact",),
                gates=(("non-empty", non_empty), ("pk unique", unique_key("o_custkey"))),
            ),
            Stage("warehouse", warehouse, deps=("orders_fact", "customer_rollup")),
        ]
    )


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else ".tmp/monthly_demo"
    spark = get_spark("monthly-pipeline")
    run = build_pipeline(sf_dir, workdir).run(spark, "1998-01")
    print("executed:", run.executed)
    run.results["warehouse"].orderBy("n_attr").show()


if __name__ == "__main__":
    main()
