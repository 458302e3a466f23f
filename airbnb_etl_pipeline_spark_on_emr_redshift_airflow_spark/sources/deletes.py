"""Key-based deletion vectors over plain parquet — merge-on-read
DELETE, the missing DML leg of the table-format layer (zone/bloom
skipping, OPTIMIZE lifecycle, versioned pointers).

Rewriting data files per DELETE is O(table) for an O(batch) change;
the lakehouse answer (Delta deletion vectors, Iceberg delete files,
Hive ACID delete deltas) is a TOMBSTONE SIDECAR: deletes append a
tiny file of deleted keys, readers anti-join it at scan time
(merge-on-read), and the periodic OPTIMIZE rewrite materializes the
deletes away (merge-on-write) and resets the sidecar. This module is
that model in its simplest sound form — keyed tombstones:

- :func:`delete_keys` appends one parquet partition of deleted key
  values per call under ``<sidecar>/batch=<n>`` — O(batch) write,
  idempotent to re-deletes (tombstones are a SET under anti-join
  semantics; duplicate keys across batches change nothing);
- :func:`read_with_deletes` serves ``data ⟕̸ tombstones`` (left-anti
  on the key) — the tombstone side is delete-sized, so AQE broadcasts
  it and the scan stays one pass with no extra shuffle of the data;
- :func:`compact_deletes` folds the sidecar's batches into one
  distinct-key partition when many small delete batches accrue;
- the OPTIMIZE integration: pass ``read_with_deletes(...)`` as the
  frame into :func:`sources.optimize.optimize_table` and drop the
  sidecar after the pointer flip — deletes are then physically gone
  and the skipping manifests of the new version never saw the
  deleted rows.

Correctness note: tombstones are by KEY, so the key must identify
the logical row (the table's primary key — ``doc_id``, ``event_id``);
deleting by non-unique key removes every matching row, which is the
SQL ``DELETE WHERE key IN (...)`` semantics the oracle-checked
``u_delete_vectors`` catalog query certifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil


def _key_list(key_col) -> list[str]:
    """Normalize a key spec to a column list — every function here
    accepts a single column name OR a composite key (list of names);
    the PySpark groupBy/partitionBy/join/select primitives the folds
    are built on take lists natively, so composite keys cost nothing
    (the reference had to synthesize concat(city,'_',date) surrogate
    keys for its weather dimension — apps/process_reviews.py:111 —
    exactly the workaround a real composite key removes)."""
    return [key_col] if isinstance(key_col, str) else list(key_col)


def _batches(spark: SparkSession, sidecar: str) -> list[int]:
    return sorted(
        int(name.split("=", 1)[1])
        for name in fsutil.list_subdirs(spark, sidecar, "batch=*")
        if fsutil.is_committed(spark, f"{sidecar}/{name}")
    )


def _claim_batch(spark: SparkSession, sidecar: str, floor: int = 0) -> int:
    """Allocate the next batch number with an ATOMIC EXCLUSIVE CLAIM
    (``fsutil.create_exclusive``, the same primitive
    ``optimize_table`` uses for version numbers): two concurrent
    writers — delete_keys vs delete_keys, delete_keys vs
    compact_deletes — can then never pick the same number and
    silently overwrite each other's tombstones (lost deletes =
    resurrected rows). A crashed claimant burns its number: the
    committed-batch scan skips the uncommitted dir and the claim file
    keeps later writers off it. Claims for batches dropped by
    compaction are swept there. ``floor``: never allocate at-or-below
    this number — callers whose vacuum removed materialized batches
    (and their claims) pass the fold watermark, or a fresh append
    would be reborn under it and be invisible."""
    existing = _batches(spark, sidecar)
    n = max(existing[-1] if existing else 0, floor) + 1
    for _ in range(1000):
        if fsutil.create_exclusive(spark, f"{sidecar}/__claim_batch={n}"):
            return n
        n += 1
    raise RuntimeError(  # pragma: no cover - 1000 live writers
        f"could not claim a batch number under {sidecar}"
    )


def delete_keys(
    keys: DataFrame, sidecar: str, key_col: str,
    batch_id: int | None = None,
) -> int:
    """Append one tombstone batch (the distinct values of
    ``keys[key_col]``) under ``sidecar/batch=<n>``. Returns n.
    O(batch): nothing else is read or touched — the data files are
    immutable, the delete is visible to every subsequent
    :func:`read_with_deletes`. Pass ``batch_id`` to pin the batch
    number (a replayed pipeline period then REWRITES its own batch
    instead of double-appending — the ledger replay discipline)."""
    spark = keys.sparkSession
    sidecar = sidecar.rstrip("/")
    fsutil.mkdirs(spark, sidecar)
    n = batch_id if batch_id is not None else _claim_batch(spark, sidecar)
    keys.select(*_key_list(key_col)).distinct().coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sidecar}/batch={n}")
    return n


def read_deletes(
    spark: SparkSession, sidecar: str, key_col: str,
    key_type: str = "bigint",
) -> DataFrame:
    """The tombstone key set (distinct across batches); empty frame
    of ``key_type`` when no deletes exist (the type only matters for
    that empty case — real batches carry their written type)."""
    sidecar = sidecar.rstrip("/")
    ks = _key_list(key_col)
    parts = [f"{sidecar}/batch={b}" for b in _batches(spark, sidecar)]
    if not parts:
        kt = [key_type] * len(ks) if isinstance(key_type, str) else key_type
        return spark.createDataFrame(
            [], ", ".join(f"{k} {t}" for k, t in zip(ks, kt))
        )
    return spark.read.parquet(*parts).select(*ks).distinct()


def read_with_deletes(
    data: DataFrame, sidecar: str, key_col: str
) -> DataFrame:
    """Merge-on-read: the data minus tombstoned keys — one left-anti
    join whose build side is delete-sized (AQE broadcasts it; the
    data never re-shuffles). Compose freely with the pruned readers:
    ``read_with_deletes(combined_pruned_read(...), sidecar, key)``."""
    spark = data.sparkSession
    if not _batches(spark, sidecar.rstrip("/")):
        return data  # no sidecar yet — nothing to subtract (and no
        # schema to guess: string-keyed tables short-circuit here too)
    dels = read_deletes(spark, sidecar, key_col)
    return data.join(dels, key_col, "left_anti")


def compact_deletes(
    spark: SparkSession, sidecar: str, key_col: str
) -> None:
    """Fold all tombstone batches into one distinct-key batch —
    bounds the reader's union when many small DELETEs accrue. The
    fold lands as the NEXT batch number first and old batches drop
    only after it commits, so a concurrent reader sees a superset
    (harmless under anti-join semantics), never a subset."""
    sidecar = sidecar.rstrip("/")
    old = _batches(spark, sidecar)
    if len(old) <= 1:
        return
    merged = read_deletes(spark, sidecar, key_col).localCheckpoint()
    n = _claim_batch(spark, sidecar)
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{sidecar}/batch={n}"
    )
    for b in old:
        fsutil.delete(spark, f"{sidecar}/batch={b}")
        # the dropped batch's claim marker goes with it (keeps the
        # sidecar listing bounded across compaction cycles)
        fsutil.delete(spark, f"{sidecar}/__claim_batch={b}")


def clear_deletes(spark: SparkSession, sidecar: str) -> None:
    """Drop the sidecar — call ONLY after an OPTIMIZE rewrite
    materialized the deletes into a committed new version (the
    pointer flip already happened, so no reader needs the tombstones
    for the old version it may still be scanning... unless it re-reads
    the OLD version by explicit pin — pinned-version readers should
    resolve the sidecar state they captured with the pin)."""
    fsutil.delete(spark, sidecar.rstrip("/"))


# ----- op-tagged change batches (merge-on-read UPSERT + DELETE) --------
#
# The tombstone sidecar above serves pure DELETE; real CDC needs
# UPDATE/UPSERT too. Same model, richer rows: each change batch holds
# full-width rows tagged op ∈ {'upsert', 'delete'}; the reader folds
# LATEST-op-per-key across batches (batch number = commit order) and
# applies it — delete drops the key, upsert replaces-or-inserts the
# row. This is the table-level form of the ``u_merge_apply_cdc``
# catalog query's MERGE semantics, over immutable parquet: O(batch)
# writes, one change-sized fold + one anti-join + one union at read,
# and the periodic OPTIMIZE over ``read_with_changes(...)``
# materializes everything away (same lifecycle as the delete-only
# sidecar).


def apply_changes(
    changes: DataFrame, sidecar: str, key_col: str, op_col: str = "op",
    batch_id: int | None = None,
) -> int:
    """Append one op-tagged change batch. ``changes`` carries the full
    data schema plus ``op_col`` ('upsert' | 'delete'; delete rows may
    leave non-key columns NULL). One row per key per batch (enforced —
    two ops for one key in one batch have no defined order). Pass
    ``batch_id`` to pin the batch number — a replayed pipeline period
    rewrites its own batch idempotently instead of double-appending."""
    spark = changes.sparkSession
    bad_ops = changes.filter(
        ~F.col(op_col).isin("upsert", "delete")
    ).limit(1).collect()
    if bad_ops:
        raise ValueError(
            f"apply_changes: unknown op {bad_ops[0][op_col]!r} "
            "(expected 'upsert' or 'delete')"
        )
    ks = _key_list(key_col)
    dup = (
        changes.groupBy(*ks)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        dk = tuple(dup[0][k] for k in ks)
        raise ValueError(
            f"apply_changes: key {dk if len(ks) > 1 else dk[0]!r} "
            "appears more than once in one batch — ops within a batch "
            "are unordered; split into sequential batches"
        )
    sidecar = sidecar.rstrip("/")
    fsutil.mkdirs(spark, sidecar)
    n = batch_id if batch_id is not None else _claim_batch(spark, sidecar)
    changes.coalesce(1).write.mode("overwrite").parquet(
        f"{sidecar}/batch={n}"
    )
    return n


def _latest_per_key(
    spark: SparkSession,
    sidecar: str,
    key_col: str,
    from_batch: int | None = None,
    as_of_batch: int | None = None,
    read_schema=None,
) -> DataFrame | None:
    """Latest op per key over the committed change batches in
    ``(from_batch, as_of_batch]`` (either side unbounded when None —
    ``from_batch`` is EXCLUSIVE: "changes after batch N", the
    consumer-cursor convention). Returns None when no batch
    qualifies. One window over the CHANGE rows only; the ``batch``
    column survives as the winning op's commit batch."""
    from pyspark.sql import Window

    sidecar = sidecar.rstrip("/")
    ids = [
        b for b in _batches(spark, sidecar)
        if (from_batch is None or b > from_batch)
        and (as_of_batch is None or b <= as_of_batch)
    ]
    if not ids:
        return None
    parts = [f"{sidecar}/batch={b}" for b in ids]
    rd = spark.read.option("basePath", sidecar)
    if read_schema is not None:
        # schema evolution: batches written before a widening are
        # narrower on disk — the explicit schema null-fills the
        # missing columns (the ``batch`` partition col still appends)
        rd = rd.schema(read_schema)
    ch = rd.parquet(*parts)
    w = Window.partitionBy(key_col).orderBy(F.col("batch").desc())
    return (
        ch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def read_with_changes(
    data: DataFrame, sidecar: str, key_col: str, op_col: str = "op",
    from_batch: int | None = None, as_of_batch: int | None = None,
    schema=None,
) -> DataFrame:
    """Merge-on-read CDC: fold the latest op per key across change
    batches (higher batch number wins) and apply — deleted keys drop,
    upserted rows replace-or-insert. Cost shape: the fold is one
    window over the CHANGE rows only (change-sized, never the data);
    the data pays one delete-sized anti-join; upserts re-enter by
    union. Equivalent to replaying every batch through a MERGE —
    pinned in tests against the sequential replay.

    ``as_of_batch=N`` pins the fold to batches ≤ N — the CDC-plane
    mirror of ``read_optimized(version=)`` time travel: committed
    change batches are immutable, so a pinned read is stable across
    later changes. ``from_batch=M`` (exclusive) folds only batches
    > M — for serving on top of a base that already materialized
    everything ≤ M (the versioned-snapshot watermark discipline of
    ``sources.table``).

    Composing with a FILTERED/PRUNED ``data`` frame: upserted rows
    re-enter UNFILTERED, so re-apply the filters after the fold —
    ``filter(CDC(data)) = (filter(data) ∖ touched) ∪ filter(upserts)``
    (the lakehouse example's ``serve`` stage shows the pattern; an
    upsert can move a row across a predicate bound in either
    direction, so skipping the re-filter silently leaks rows)."""
    spark = data.sparkSession
    rs = None
    if schema is not None:
        from pyspark.sql.types import StringType, StructField, StructType

        rs = StructType(
            list(schema.fields) + [StructField(op_col, StringType())]
        )
    latest = _latest_per_key(
        spark, sidecar, key_col, from_batch=from_batch,
        as_of_batch=as_of_batch, read_schema=rs,
    )
    if latest is None:
        return data
    latest = latest.drop("batch")
    touched = latest.select(key_col)
    ups = latest.filter(F.col(op_col) == "upsert").drop(op_col).select(
        *data.columns
    )
    return data.join(touched, key_col, "left_anti").unionByName(ups)


def table_changes(
    spark: SparkSession,
    sidecar: str,
    key_col: str,
    from_batch: int | None = None,
    to_batch: int | None = None,
    op_col: str = "op",
    schema=None,
) -> DataFrame:
    """The CHANGE-DATA-FEED read: the op-tagged NET effect per key of
    the committed change batches in ``(from_batch, to_batch]``
    (``from_batch`` exclusive — pass the last batch you consumed;
    ``to_batch`` inclusive — your new cursor). One row per touched
    key: the LATEST op in the range wins (upsert→delete nets to the
    delete; delete→re-upsert nets to the upsert carrying the new
    row), with ``batch`` = the winning op's commit batch. Empty frame
    when nothing qualifies (schema requires at least one committed
    batch to infer from — raises otherwise, there is nothing to
    describe).

    This is the primitive that lets every derived artifact (LM count
    ledgers, BM25 postings, minhash signature indexes — each with an
    incremental add AND remove path) consume table changes
    incrementally instead of diffing snapshots: apply removals for
    net-deleted keys and for the OLD versions of net-upserted keys,
    then adds for the new versions — O(changes), never O(table).
    Cost shape: one window over the change rows in range; nothing
    data-sized participates."""
    sidecar = sidecar.rstrip("/")
    all_ids = _batches(spark, sidecar)
    if not all_ids:
        raise ValueError(
            f"table_changes: no committed change batches under "
            f"{sidecar} — nothing to read (and no schema to serve an "
            "empty feed with)"
        )
    rs = None
    if schema is not None:
        from pyspark.sql.types import StringType, StructField, StructType

        rs = StructType(
            list(schema.fields) + [StructField(op_col, StringType())]
        )
    latest = _latest_per_key(
        spark, sidecar, key_col, from_batch=from_batch,
        as_of_batch=to_batch, read_schema=rs,
    )
    if latest is None:
        # valid empty range over a real sidecar: schema from batch 1
        head = spark.read.option("basePath", sidecar)
        if rs is not None:
            head = head.schema(rs)
        return head.parquet(f"{sidecar}/batch={all_ids[0]}").limit(0)
    return latest


def stream_changes_sink(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    sidecar: str,
    key_col: str,
    checkpoint_dir: str,
    op_col: str = "op",
):
    """Streaming CDC ingest: continuously drain op-tagged change rows
    from ``source_dir`` into the change sidecar — each micro-batch
    lands via :func:`apply_changes` PINNED to its stream batch id, so
    a replay from an earlier checkpoint REWRITES its own batches
    instead of double-appending (the same idempotent-replay
    discipline as :func:`sources.skipping.stream_sink_with_manifest`;
    stream batch ids are offset by +1 — sidecar batches are
    1-based). Readers compose as always:
    ``read_with_changes(data, sidecar, key)`` reflects everything
    drained so far. ``availableNow`` trigger: drain, then stop. The
    in-batch one-op-per-key contract is enforced per micro-batch by
    :func:`apply_changes` (use ``maxFilesPerTrigger`` at the source
    to keep independently-written change files in separate
    batches)."""

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes(
            batch_df, sidecar, key_col, op_col=op_col,
            batch_id=batch_id + 1,
        )

    return (
        spark.readStream.schema(source_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
