"""End-to-end lakehouse table lifecycle — the round-9 table-format
layer composed into one periodic DAG: batch INGEST with incrementally
maintained skipping manifests, merge-on-read CDC, metadata-pruned +
change-merged SERVING, and the periodic OPTIMIZE that materializes
everything into a fresh versioned layout.

Per period (a ``lo:hi`` event_id slice standing in for the day's
landed files):

- **ingest** — the slice lands under ``data/batch_id=<lo>``
  (idempotent overwrite: a replayed period rewrites its own
  partition), and the zone + bloom manifests RECONCILE to the new
  listing (:func:`sources.skipping.update_zone_manifest` /
  :func:`update_bloom_manifest` read only the new files — O(batch),
  and readers keep passing the fail-closed staleness checks);
- **changes** — the period's CDC lands as an op-tagged batch pinned
  to the period id (:func:`sources.deletes.apply_changes` with
  ``batch_id=lo`` — replay rewrites, never double-appends): every
  event_id % 101 == 0 deletes, every % 103 == 0 upserts with a
  corrected ``value``;
- **serve** — the reader stack in one call chain:
  :func:`sources.skipping.combined_pruned_read` (zone range ∧ bloom
  IN-list, keep-sets intersect) piped through
  :func:`sources.deletes.read_with_changes` (latest-op-per-key fold)
  — metadata-plane skipping UNDER merge-on-read correctness, equal to
  the full scan + filters + sequential MERGE replay (test-pinned);
- **optimize** — :func:`sources.optimize.optimize_table` over the
  full merged table Z-orders + compacts into ``table_v/v=N``, commits,
  flips the pointer — a MATERIALIZED SNAPSHOT of the merged table
  whose own manifests never saw a deleted row. The CDC sidecar stays:
  it belongs to the LIVE ingest directory, which keeps its original
  rows (clearing it would resurrect deleted rows there; a sidecar
  clear is only sound when the rewrite replaces the live data itself,
  the ``tests/test_deletes.py`` materialization case).

100 TB shape: every stage is O(batch) except optimize, which is the
deliberate periodic rewrite (one range exchange + manifest builds
over the fresh files); serving never plans a file both manifests can
rule out, and never re-shuffles the data for the CDC merge (the
change fold is change-sized, the anti-join build side delete-sized).

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.lakehouse [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
    Pipeline,
    Stage,
    non_empty,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
    apply_changes,
    read_with_changes,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    model_exists,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
    build_bloom_manifest,
    build_zone_manifest,
    combined_pruned_read,
    update_bloom_manifest,
    update_zone_manifest,
)

ZONE_COLS = ["value", "user_id"]
BLOOM_COLS = ["event_id"]


def build_pipeline(sf_dir: str, workdir: str) -> Pipeline:
    data_path = f"{workdir}/data"
    zone_mf_path = f"{workdir}/zones"
    bloom_mf_path = f"{workdir}/bloom"
    changes_path = f"{workdir}/changes"
    table_v_path = f"{workdir}/table_v"

    def ingest(spark: SparkSession, period: str, ctx) -> DataFrame:
        """Land the period's slice as its own batch partition and
        reconcile BOTH skipping manifests to the new listing —
        O(batch) each; a replayed period rewrites its partition and
        the reconcile converges to the same state."""
        lo, hi = (int(x) for x in period.split(":"))
        (ev,) = load(spark, sf_dir, "events")
        batch = ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        ).select("event_id", "user_id", "event_type", "value")
        batch.write.mode("overwrite").parquet(
            f"{data_path}/batch_id={lo}"
        )
        spark.catalog.refreshByPath(data_path)
        if model_exists(zone_mf_path):
            zprev = spark.read.parquet(zone_mf_path)
        else:
            zprev = build_zone_manifest(
                spark.read.parquet(data_path), ZONE_COLS
            ).limit(0)
        zmf = update_zone_manifest(
            spark, data_path, zprev, ZONE_COLS
        ).localCheckpoint()
        zmf.coalesce(1).write.mode("overwrite").parquet(zone_mf_path)
        spark.catalog.refreshByPath(zone_mf_path)
        if model_exists(bloom_mf_path):
            bprev = spark.read.parquet(bloom_mf_path)
        else:
            bprev = build_bloom_manifest(
                spark.read.parquet(data_path), BLOOM_COLS
            ).limit(0)
        bmf = update_bloom_manifest(
            spark, data_path, bprev, BLOOM_COLS
        ).localCheckpoint()
        bmf.coalesce(1).write.mode("overwrite").parquet(bloom_mf_path)
        spark.catalog.refreshByPath(bloom_mf_path)
        return spark.read.parquet(data_path)

    def changes(spark: SparkSession, period: str, ctx) -> DataFrame:
        """The period's CDC batch, pinned to the period id so a
        replay rewrites instead of double-appending: % 101 ids
        delete, % 103 ids upsert with a corrected value."""
        lo, hi = (int(x) for x in period.split(":"))
        batch = ctx["ingest"].filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        dels = batch.filter("event_id % 101 = 0").select(
            "event_id",
            F.lit(None).cast("bigint").alias("user_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
            F.lit("delete").alias("op"),
        )
        ups = batch.filter(
            "event_id % 103 = 0 AND event_id % 101 <> 0"
        ).select(
            "event_id", "user_id", "event_type",
            (F.col("value") * 2).alias("value"),
            F.lit("upsert").alias("op"),
        )
        cdc = dels.unionByName(ups).localCheckpoint()
        apply_changes(cdc, changes_path, "event_id", batch_id=lo)
        return cdc

    def serve(spark: SparkSession, period: str, ctx) -> DataFrame:
        """The full reader stack: zone ∧ bloom metadata pruning UNDER
        the merge-on-read CDC fold. The pruned frame must carry the
        batch_id partition column and exclude deleted / reflect
        upserted rows — equality with the unpruned + replayed form is
        pinned in tests."""
        _ = ctx["changes"]
        ids = list(range(0, 4000, 103))
        pruned = combined_pruned_read(
            spark,
            data_path,
            zone_manifest=spark.read.parquet(zone_mf_path),
            bloom_manifest=spark.read.parquet(bloom_mf_path),
            range_predicates=[("value", 0.0, 400.0)],
            in_predicates=[("event_id", ids)],
        )
        merged = read_with_changes(
            pruned.drop("batch_id"), changes_path, "event_id"
        )
        # Filter-under-CDC algebra: filter(CDC(data)) =
        # (filter(data) ∖ touched) ∪ filter(upserts) — the pruned read
        # serves filter(data), the fold removes touched keys, and the
        # RE-APPLIED residual filter drops upserted rows whose NEW
        # values left the predicate box (an upsert doubling `value`
        # can cross the range bound in either direction; without the
        # re-filter those rows would leak in unfiltered).
        return merged.filter(
            (F.col("value") >= 0.0) & (F.col("value") <= 400.0)
        ).filter(F.col("event_id").isin(*ids))

    def optimize(spark: SparkSession, period: str, ctx) -> DataFrame:
        """Periodic merge-on-write: OPTIMIZE the full merged table
        into a fresh committed snapshot version (Z-order by the zone
        dims, bloom over the id), flip the pointer. The sidecar stays
        — see the module docstring."""
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
            optimize_table,
            read_optimized_data,
        )

        _ = ctx["serve"]
        merged = read_with_changes(
            spark.read.parquet(data_path).drop("batch_id"),
            changes_path,
            "event_id",
        )
        max_uid = merged.agg(F.max("user_id")).head()[0] or 1
        optimize_table(
            merged,
            table_v_path,
            [("value", 0.0, 500.0), ("user_id", 0.0, float(max_uid) + 1)],
            bloom_cols=BLOOM_COLS,
            target_rows_per_file=100_000,
        )
        return read_optimized_data(spark, table_v_path)

    return Pipeline(
        [
            Stage("ingest", ingest, gates=(("non-empty", non_empty),)),
            Stage("changes", changes, deps=("ingest",)),
            Stage("serve", serve, deps=("changes",)),
            Stage(
                "optimize",
                optimize,
                deps=("serve",),
                gates=(("non-empty", non_empty),),
            ),
        ]
    )


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lakehouse_demo"
    spark = get_spark("lakehouse-example")
    pipe = build_pipeline(sf_dir, workdir)
    for period in ("0:1500", "1500:3000"):
        run = pipe.run(spark, period)
        print(
            f"period {period}: table now "
            f"{run.results['optimize'].count()} rows"
        )


if __name__ == "__main__":
    main()
