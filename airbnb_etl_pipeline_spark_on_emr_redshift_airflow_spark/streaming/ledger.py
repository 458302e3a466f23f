"""Streaming ledger maintenance: keep the mergeable distinct-count
ledger (``operators.sketches``) and the heavy-hitters top-k ledger
(``operators.heavyhitters``) current as event batches arrive.

Composition of two proven patterns in this engine:

- the ledger contract — per-(dimension) sketch rows are ADDITIVE under
  ``hll_union_agg`` (set-union semantics), so each micro-batch's
  ledger rows simply LAND beside the existing ones; the serving side
  folds at read time, no read-modify-write;
- the idempotent sink — ``foreachBatch`` is at-least-once, so each
  batch writes under a ``batch_id=<id>`` subdirectory with
  ``mode("overwrite")`` (same recipe as ``streaming.index``): a
  replayed batch rewrites its own directory instead of appending a
  second copy. Note HLL union would absorb a duplicated batch's
  DISTINCT estimates anyway (set semantics) — but ``n_rows`` is a raw
  additive count and WOULD double, so the idempotent layout is still
  load-bearing.

Per batch the cost is one groupBy over the BATCH alone (map-side
partial sketches); the persisted ledger grows by (dimensions) rows per
batch and ``read_streamed_ledger`` folds batches into one ledger row
per key at read time — O(batches × dimensions), never O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
    hll_ledger,
    merge_hll_ledgers,
)


def stream_ledger_maintenance(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    ledger_path: str,
    keys: list[str],
    distinct_cols: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Tail parquet event batches in ``events_dir`` and land each
    micro-batch's ledger rows under ``ledger_path/batch_id=<id>``.
    ``availableNow`` trigger: ledger everything new since the last
    checkpoint, then stop — the periodic-ingest cadence."""

    def _append(batch_df, batch_id: int) -> None:
        led = hll_ledger(batch_df, keys, distinct_cols)
        led.write.mode("overwrite").parquet(
            f"{ledger_path}/batch_id={batch_id}"
        )

    return (
        spark.readStream.schema(events_schema)
        .format("parquet")
        .load(events_dir)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_ledger(
    spark: SparkSession, ledger_path: str, keys: list[str]
) -> DataFrame:
    """Fold the per-batch ledger rows into one ledger row per key —
    the serving view. Partition discovery surfaces ``batch_id``; the
    fold drops it (sketches union across batches)."""
    raw = spark.read.parquet(ledger_path).drop("batch_id")
    return merge_hll_ledgers([raw], keys)


def stream_hitters_maintenance(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    ledger_path: str,
    keys: list[str],
    item_col: str,
    checkpoint_dir: str,
    k: int = 16,
) -> StreamingQuery:
    """Streaming heavy-hitters maintenance — the same two patterns as
    the HLL stream, for the top-k ledger (``operators.heavyhitters``):
    each micro-batch lands its EXACT per-batch top-k rows (plus the
    dropped-mass scalars) under ``ledger_path/batch_id=<id>`` with
    ``mode("overwrite")``. Idempotency is load-bearing twice over
    here: every stored quantity (cnt, other_max, other_mass, n_rows)
    is a raw additive count, so a replayed at-least-once batch landing
    as an append would inflate ALL of them; rewriting its own
    ``batch_id=`` directory keeps the fold exact. Per batch the cost
    is a word-count over the batch alone; the serving fold
    (:func:`read_streamed_hitters`) is O(batches × k) per key, never
    O(events)."""

    def _append(batch_df, batch_id: int) -> None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
            heavyhitters_ledger,
        )

        led = heavyhitters_ledger(batch_df, keys, item_col, k=k)
        led.write.mode("overwrite").parquet(
            f"{ledger_path}/batch_id={batch_id}"
        )

    return (
        spark.readStream.schema(events_schema)
        .format("parquet")
        .load(events_dir)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_hitters(
    spark: SparkSession, ledger_path: str, keys: list[str], k: int = 16
) -> DataFrame:
    """Serve the streamed top-k with sound bounds: fold the per-batch
    ledger rows with the threshold-algorithm merge —
    ``lb ≤ true ≤ ub`` per served item and any item whose true total
    beats the folded ``other_max`` is guaranteed present (the batch
    cut means a one-shot exact top-k is NOT recoverable, unlike the
    additive HLL fold — bounds are the honest serving contract)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        ledger_topk_bounds,
    )

    raw = spark.read.parquet(ledger_path).drop("batch_id")
    return ledger_topk_bounds([raw], keys, k=k)
