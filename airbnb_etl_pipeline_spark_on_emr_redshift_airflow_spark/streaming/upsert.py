"""Streaming CDC upsert: a ``foreachBatch`` micro-batch merge loop
that folds a change stream into a published parquet snapshot.

This is the reference's monthly merge cadence
(``apps/process_reviews.py:146-148`` — union the delta, dedup, publish)
promoted to its genuinely-streaming form: Structured Streaming tails
the change feed, each micro-batch folds into the snapshot with
``operators.merge.apply_cdc`` (MERGE semantics — latest change per key
wins, deletes drop rows), and the result cuts over via the staged
``sources.gating.atomic_publish`` swap, so readers never observe a
half-written snapshot.

Delivery semantics: checkpointing makes the source exactly-once per
batch; on failure-replay of a batch the merge is IDEMPOTENT — the
snapshot already reflects the batch's winners, reapplying them
upserts identical payloads and re-deletes absent keys. Sequence
numbers must be globally monotone across batches for latest-wins to
equal the one-shot batch fold (the unit test asserts that equality).

Scale notes: each micro-batch costs one window over the (delta-sized)
batch plus one keyed anti-join against the snapshot — the snapshot is
scanned once and never windowed. For snapshots too large to rewrite
per batch, partition the snapshot and rewrite only the partitions the
batch touches (the anti-join's key set); the merge algebra is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
    apply_cdc,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
)


def stream_upsert_snapshot(
    spark: SparkSession,
    changes_dir: str,
    changes_schema: str,
    snapshot_path: str,
    keys: list[str],
    seq_col: str,
    op_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Tail parquet change files in ``changes_dir`` and fold each
    micro-batch into the parquet snapshot at ``snapshot_path``.
    ``availableNow`` trigger: processes everything new since the last
    checkpoint, then stops — the incremental-backfill cadence. The
    snapshot must exist before the first run (publish the initial
    model with ``atomic_publish``)."""

    def _merge(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        snap = sess.read.parquet(snapshot_path)
        # staging write executes while the published dir is intact;
        # the swap happens only after the staged copy commits.
        atomic_publish(
            apply_cdc(snap, batch_df, keys, seq_col, op_col), snapshot_path
        )

    return (
        spark.readStream.schema(changes_schema)
        .format("parquet")
        .load(changes_dir)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
