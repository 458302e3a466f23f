"""Streaming ledger maintenance: keep every member of the mergeable
ledger family current as event batches arrive — counts/sum/min/max
state (``operators.aggregates.agg_state``), distinct
(``operators.sketches``), quantile histograms
(``operators.histogram``), bottom-k samples (``operators.bottomk``)
and heavy-hitters top-k (``operators.heavyhitters``).

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
    weight_col: str | None = None,
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

        led = heavyhitters_ledger(
            batch_df, keys, item_col, k=k, weight_col=weight_col
        )
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


def stream_histogram_maintenance(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    ledger_path: str,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    checkpoint_dir: str,
    n_bins: int = 40,
    prepare=None,
) -> StreamingQuery:
    """Streaming histogram-ledger maintenance — closes the ledger
    family's streaming gap for the QUANTILE member
    (``operators.histogram``): each micro-batch bins its own rows over
    the PRE-ANCHORED edges (the anchoring discipline is what makes
    per-batch vectors commensurable — edges never move after the
    reference anchor, exactly like the PSI drift report) and lands one
    length-``n_bins`` bigint vector per key under
    ``ledger_path/batch_id=<id>`` with ``mode("overwrite")``. Every
    stored field (bins, n_rows, n_null) except vmin/vmax is a raw
    additive count, so at-least-once replay landing as an append would
    inflate all of them — the idempotent ``batch_id=`` overwrite is
    load-bearing, same recipe as the HLL and heavy-hitters streams
    above. Unlike heavy-hitters there is NO batch-cut information
    loss: bin vectors are exactly additive, so the served fold equals
    the one-shot batch build bit for bit (pinned in
    ``tests/test_stream_ledger.py``). Per batch the cost is one
    map-side-combinable groupBy over the batch alone.

    ``prepare`` (optional) is a DataFrame→DataFrame transform applied
    to each micro-batch BEFORE the ledger build — the seam for
    event-time windowed maintenance: derive the window key in-batch
    (e.g. ``lambda b: b.withColumn("window_start",
    F.col("ts").cast("date"))``) and pass it in ``keys``, and the
    stream maintains the per-(window, dims) quantile ledger the
    ``e_windowed_quantiles`` catalog query serves — late events fold
    into their window's anchored bins with integer adds, so the
    streamed fold still equals the one-shot windowed build exactly
    (pinned in ``tests/test_stream_ledger.py``)."""

    def _append(batch_df, batch_id: int) -> None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
            histogram_ledger,
        )

        if prepare is not None:
            batch_df = prepare(batch_df)
        led = histogram_ledger(batch_df, keys, col, lo, hi, n_bins=n_bins)
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


def read_streamed_histogram(
    spark: SparkSession, ledger_path: str, keys: list[str]
) -> DataFrame:
    """Fold the per-batch histogram rows into one ledger row per key —
    ``zip_with`` integer adds over the fixed anchored bins, additive
    sidecars, min/max folds. The result is a normal histogram ledger:
    feed it straight to ``operators.histogram.ledger_quantiles`` for
    quantile serving that never rescans events."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
        merge_histogram_ledgers,
    )

    raw = spark.read.parquet(ledger_path).drop("batch_id")
    return merge_histogram_ledgers([raw], keys)


def stream_bottomk_maintenance(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    ledger_path: str,
    keys: list[str],
    id_col: str,
    checkpoint_dir: str,
    k: int = 64,
) -> StreamingQuery:
    """Streaming bottom-k sample maintenance — the last ledger-family
    member to gain a stream leg (``operators.bottomk``): each
    micro-batch computes its own bottom-k (priority, id) sample per
    key and lands it under ``ledger_path/batch_id=<id>`` with
    ``mode("overwrite")``. The sample itself is replay-PROOF twice
    over (priorities are deterministic hashes, and the merge is a
    set-union over (priority, id) — a duplicated batch's structs
    collapse), but the additive ``n_rows`` sidecar requires disjoint
    periods (module contract, see ``merge_bottomk_ledgers``) — the
    ``batch_id=`` overwrite layout is precisely what guarantees that
    disjointness under at-least-once replay. No batch-cut loss: the
    bottom-k of a union IS the bottom-k of the merged per-batch
    bottom-k sets, so the served sample equals the one-shot batch
    build exactly (pinned in ``tests/test_stream_ledger.py``). Per
    batch the cost is one slim-projection exchange over the batch."""

    def _append(batch_df, batch_id: int) -> None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
            bottomk_ledger,
        )

        led = bottomk_ledger(batch_df, keys, id_col, k=k)
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


def read_streamed_bottomk(
    spark: SparkSession, ledger_path: str, keys: list[str], k: int = 64
) -> DataFrame:
    """Fold the per-batch sample rows into one bottom-k ledger row per
    key (set-union, sort, slice k). The result is a normal bottom-k
    ledger: serve it with ``ledger_sample`` /
    ``ledger_distinct_estimate`` / ``ledger_jaccard``."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
        merge_bottomk_ledgers,
    )

    raw = spark.read.parquet(ledger_path).drop("batch_id")
    return merge_bottomk_ledgers([raw], keys, k=k)


def stream_aggstate_maintenance(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    state_path: str,
    keys: list[str],
    measure: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Streaming counts/sum/min/max state maintenance — the FIRST
    ledger-family member (``operators.aggregates.agg_state``, the
    incremental-rollup state) gains the same stream leg as the other
    four, completing streaming maintenance for the whole family:
    counts/sum (here), distinct (HLL), quantiles (histogram), samples
    (bottom-k), top-k (heavy-hitters). Each micro-batch lands its own
    partial state rows under ``state_path/batch_id=<id>`` with
    ``mode("overwrite")``; every stored field except min/max is raw
    additive (and the fixed-point sum is order-independent integer
    arithmetic), so the idempotent layout carries replay exactness as
    usual. No batch-cut loss: ``merge(state(A), state(B)) ==
    state(A ∪ B)`` exactly, so the served fold equals the one-shot
    batch state (pinned in ``tests/test_stream_ledger.py``)."""

    def _append(batch_df, batch_id: int) -> None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
            agg_state,
        )

        st = agg_state(batch_df, keys, measure)
        st.write.mode("overwrite").parquet(
            f"{state_path}/batch_id={batch_id}"
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


def read_streamed_aggstate(
    spark: SparkSession, state_path: str, keys: list[str]
) -> DataFrame:
    """Fold the per-batch state rows into one state row per key — a
    normal ``agg_state`` table: resolve it with
    ``operators.aggregates.finalize_agg_state`` for serving."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        merge_agg_states,
    )

    raw = spark.read.parquet(state_path).drop("batch_id")
    return merge_agg_states(keys, raw)
