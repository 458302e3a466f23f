"""End-to-end lakehouse table lifecycle on the unified Table facade
(``sources.table``) — the round-9 layers (incrementally maintained
skipping manifests, merge-on-read CDC, metadata-pruned + change-merged
serving, periodic versioned OPTIMIZE) that this example previously
composed BY HAND are now one handle: the DAG's stages reduce to
``append`` / ``write_changes`` / ``read_table`` / ``optimize``, and
the facade resolves the version pointer, stacks zone ∧ bloom pruning
over bulk and tail, folds the un-materialized changes, and re-applies
the predicates (the filter-under-CDC law) internally.

Per period (a ``lo:hi`` event_id slice standing in for the day's
landed files):

- **ingest** — ``Table.append(batch, batch_id=lo+1)``: the slice
  lands as one live batch pinned to its period (a replayed period
  rewrites its own batch idempotently; once the batch is folded into
  a version, the rewrite falls at-or-below the live watermark and is
  simply invisible — replay convergence by construction), and BOTH
  skipping manifests reconcile to the new listing, O(batch);
- **changes** — ``Table.write_changes(cdc, batch_id=lo+1)``: the
  period's corrections land as one op-tagged change batch (every
  event_id % 101 == 0 deletes, every % 103 == 0 upserts with a
  corrected ``value``), same pinned-replay discipline;
- **serve** — ``read_table(spark, root, range_predicates=...,
  in_predicates=...)``: ONE call does what four hand-wired steps did
  in the round-9 version of this example — equal to the full scan +
  filters + sequential MERGE replay (test-pinned);
- **optimize** — ``Table.optimize()``: fold live tail + changes into
  a fresh committed version (Z-order, manifests, FOLDED watermarks,
  pointer flip), then vacuum the folded live batches. Change batches
  stay for downstream ``Table.changes()`` feed consumers.

100 TB shape: every stage is O(batch) except optimize, the deliberate
periodic rewrite; serving never plans a file both manifests can rule
out, and never re-shuffles the data for the CDC merge (the change
fold is change-sized, the anti-join build side delete-sized).

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
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
    Table,
    read_table,
)

ZONE_COLS = ["value", "user_id"]
BLOOM_COLS = ["event_id"]


def build_pipeline(sf_dir: str, workdir: str) -> Pipeline:
    root = f"{workdir}/table"

    def _period_slice(spark: SparkSession, period: str) -> DataFrame:
        lo, hi = (int(x) for x in period.split(":"))
        (ev,) = load(spark, sf_dir, "events")
        return ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        ).select("event_id", "user_id", "event_type", "value")

    def _table(spark: SparkSession) -> Table:
        return Table.create(
            spark, root, "event_id",
            zone_cols=ZONE_COLS, bloom_cols=BLOOM_COLS,
        )

    def ingest(spark: SparkSession, period: str, ctx) -> DataFrame:
        """Land the period's slice as its pinned live batch — manifest
        reconciliation is inside Table.append, O(batch)."""
        lo, hi = (int(x) for x in period.split(":"))
        batch = _period_slice(spark, period)
        _table(spark).append(batch, batch_id=lo + 1)
        # gate on the CUMULATIVE table (the reference's
        # check_redshift_loaded semantics), not the period slice —
        # late periods may legitimately be empty at small SFs
        return read_table(spark, root)

    def changes(spark: SparkSession, period: str, ctx) -> DataFrame:
        """The period's correction batch, pinned to the period id so a
        replay rewrites instead of double-appending: % 101 ids delete,
        % 103 ids upsert with a corrected value."""
        lo, hi = (int(x) for x in period.split(":"))
        _ = ctx["ingest"]
        # corrections derive from the period's RAW source slice (the
        # immutable input), so a replayed period rewrites its pinned
        # change batch with IDENTICAL content — content-idempotent
        # replay, not just watermark-invisible replay
        batch = _period_slice(spark, period)
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
        _table(spark).write_changes(cdc, batch_id=lo + 1)
        return cdc

    def serve(spark: SparkSession, period: str, ctx) -> DataFrame:
        """ONE facade call: pointer → pruned bulk ∪ pruned tail →
        change fold → re-applied predicates. Equality with the
        unpruned + sequentially replayed form is pinned in tests."""
        _ = ctx["changes"]
        ids = list(range(0, 4000, 103))
        served = read_table(
            spark, root,
            range_predicates=[("value", 0.0, 400.0)],
            in_predicates=[("event_id", ids)],
        )
        # materialize: the downstream optimize stage VACUUMS the live
        # batches this lazy handle still references (a frame created
        # before a vacuum points at deleted files afterwards)
        return served.localCheckpoint()

    def optimize(spark: SparkSession, period: str, ctx) -> DataFrame:
        """Periodic merge-on-write: fold everything un-materialized
        into a fresh committed version, flip the pointer, vacuum the
        folded live batches."""
        _ = ctx["serve"]
        t = _table(spark)
        t.optimize(target_rows_per_file=100_000)
        return t.snapshot()

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
