"""End-to-end feature-store training-set build on the testdata.

Third composition example, next to :mod:`examples.monthly` (the
reference's ETL DAG) and :mod:`examples.corpus` (pretraining-corpus
curation): the supervised-learning counterpart — build a leakage-free
training set from an event log, the job every feature store runs:

- **labels** — one row per prediction instant (here: each purchase,
  labeled by whether it beats the user's typical spend)
- **features** — per-user running behavioral aggregates (click
  count / value sum / last-gap) computed with a window frame ending
  at ``-1`` row: each feature row describes the state STRICTLY BEFORE
  its own instant, so a feature row is itself point-in-time safe
- **training set** — ``asof_join(strict=True)``: every label takes
  the newest feature row strictly before the label instant; a
  same-instant feature can never describe its own label
- **leakage gate** — the pipeline FAILS if any joined feature
  timestamp is >= its label timestamp (point-in-time correctness as a
  quality gate, not a code comment)
- **layout** — Z-order the published set by (user, time) so
  backtesting scans (user range × time range) skip files on both
  dimensions

Every stage is a deterministic DataFrame plan; the whole DAG runs
through the same :mod:`pipeline` machinery (dependency order, gates,
atomic publish) as the other examples.

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.features [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
    asof_join,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.layout import (
    zorder_layout,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
    Pipeline,
    Stage,
    non_empty,
    unique_key,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
)


def no_leakage(df: DataFrame) -> bool:
    """Point-in-time gate: no joined feature may be at-or-after its
    label instant."""
    return df.filter(F.col("feat_ts") >= F.col("ts")).limit(1).count() == 0


def build_pipeline(sf_dir: str, workdir: str) -> Pipeline:
    """Feature DAG: ingest → {labels ∥ features} → training set
    (strict as-of) → Z-ordered publish."""

    def ingest(spark: SparkSession, period: str, ctx):
        (events,) = load(spark, sf_dir, "events")
        return events.select("event_id", "ts", "user_id", "event_type", "value")

    def labels(spark: SparkSession, period: str, ctx):
        """One label row per purchase: did it beat the user's median
        purchase? (any deterministic labeling works; the point is the
        join discipline around it)"""
        purchases = ctx["ingest"].filter(F.col("event_type") == "purchase")
        med = Window.partitionBy("user_id")
        return purchases.select(
            "event_id",
            "user_id",
            "ts",
            (F.col("value") > F.expr("percentile(value, 0.5D)").over(med))
            .cast("int")
            .alias("label"),
        )

    def features(spark: SparkSession, period: str, ctx):
        """Per-click running behavior, frame ending at -1 row: the
        feature row at instant t describes the user's history BEFORE
        t (cumulative click count, value sum, seconds since the
        previous click)."""
        clicks = ctx["ingest"].filter(F.col("event_type") == "click")
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        lagw = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return clicks.select(
            "user_id",
            "ts",
            F.col("ts").alias("feat_ts"),
            F.count(F.lit(1)).over(w).alias("clicks_before"),
            F.coalesce(F.sum("value").over(w), F.lit(0.0)).alias(
                "click_value_before"
            ),
            (
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(lagw)
            ).alias("secs_since_prev_click"),
        )

    def training_set(spark: SparkSession, period: str, ctx):
        feats = ctx["features"]
        return asof_join(
            ctx["labels"],
            feats,
            "user_id",
            "ts",
            [
                "feat_ts",
                "clicks_before",
                "click_value_before",
                "secs_since_prev_click",
            ],
            strict=True,
        ).filter(F.col("feat_ts").isNotNull())

    def published(spark: SparkSession, period: str, ctx):
        path = f"{workdir}/training_set/{period}"
        n_users = 1 << 10
        laid_out = zorder_layout(
            ctx["training_set"].withColumn(
                "__t", F.col("ts").cast("double")
            ),
            [("user_id", 0.0, float(n_users)), ("__t", 1.7e9, 1.8e9)],
            bits=10,
            num_partitions=4,
        ).drop("__t")
        atomic_publish(laid_out, path)
        return spark.read.parquet(path)

    return Pipeline(
        [
            Stage("ingest", ingest),
            Stage("labels", labels, deps=("ingest",), gates=(
                ("non-empty", non_empty),
                ("pk unique", unique_key("event_id")),
            )),
            Stage("features", features, deps=("ingest",), gates=(
                ("non-empty", non_empty),
            )),
            Stage(
                "training_set",
                training_set,
                deps=("labels", "features"),
                gates=(
                    ("non-empty", non_empty),
                    ("pk unique", unique_key("event_id")),
                    ("no label leakage", no_leakage),
                ),
            ),
            Stage("published", published, deps=("training_set",), gates=(
                ("non-empty", non_empty),
            )),
        ]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/features_example"
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    spark = get_spark("features-example")
    run = build_pipeline(sf_dir, workdir).run(spark, "2024-01")
    out = run.results["published"]
    print(f"training set rows: {out.count()}, stages: {run.executed}")


if __name__ == "__main__":
    main()
