"""Warehouse merge operators: CDC apply (MERGE/upsert) and SCD
Type-2 interval builds.

The reference's incremental loop is append-only — union the monthly
delta, then latest-per-key dedup (``apps/process_reviews.py:146-148``,
rebuilt in ``operators.windows.latest_per_key``). These operators
extend that surface to the two merge shapes every warehouse ETL
eventually needs and Redshift-era pipelines hand-roll in SQL:

- ``apply_cdc``: a change feed with insert/update/delete ops folded
  into a snapshot — MERGE INTO semantics, latest change per key wins,
  deletes drop the row.
- ``scd2_intervals``: collapse an event/attribute history into
  effective-dated Type-2 dimension rows (gaps-and-islands) with
  half-open ``[effective_from, effective_to)`` intervals and an
  ``is_current`` flag.

Scale notes: ``apply_cdc`` shuffles the *change feed* on the merge key
(window dedup), then joins the snapshot once on the same key — the
snapshot is never windowed; with AQE on, a delta-sized change feed
becomes a broadcast/shuffle-hash join automatically (no forced
broadcast here — change feeds can be large on backfill days).
``scd2_intervals`` is two window passes and one aggregation, all keyed
on the entity id — Catalyst reuses one hash partitioning for the lag
and running-sum windows (same partition spec), so the history is
shuffled once, plus one exchange for the island roll-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Fold a CDC change feed into a snapshot (MERGE INTO semantics).

    ``changes`` carries the full payload plus ``op_col`` (e.g.
    'I'/'U'/'D') and a monotonically increasing ``seq_col``; for each
    key the change with the highest ``(seq_col, op_col)`` wins — ties
    on ``seq_col`` break on ``op_col`` descending so the order is
    total and deterministic (callers with a genuinely unique sequence
    never hit the tie-break). A winning delete removes the row; any
    other winning op upserts its payload. Keys untouched by the feed
    pass through from the snapshot unchanged.

    Returns the new snapshot with exactly the snapshot's columns.
    """
    payload = [c for c in snapshot.columns]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = snapshot.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(*payload)
    return untouched.unionByName(upserts)


def scd2_intervals(
    history: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tie: str,
) -> DataFrame:
    """Collapse an attribute history into SCD Type-2 dimension rows.

    Consecutive rows (per ``key``, ordered by ``ts`` then the unique
    ``tie`` column) holding the same ``attr`` value merge into one
    interval; each value change opens a new one. Output columns:
    ``key, attr, effective_from, effective_to, is_current`` with
    half-open intervals (``effective_to`` = next interval's start,
    NULL on the current row). Null-safe on ``attr`` (a NULL→'x'
    transition is a change; NULL→NULL is not), so sparse attributes
    version correctly.
    """
    w_seq = Window.partitionBy(key).orderBy(ts, tie)
    changed = (
        ~F.lag(attr).over(w_seq).eqNullSafe(F.col(attr))
    ).cast("int")
    islands = (
        history.withColumn("__chg", F.coalesce(changed, F.lit(1)))
        .withColumn("__island", F.sum("__chg").over(w_seq))
    )
    runs = islands.groupBy(key, "__island").agg(
        F.first(attr).alias(attr),  # constant within an island
        F.min(ts).alias("effective_from"),
    )
    w_isl = Window.partitionBy(key).orderBy("__island")
    return (
        runs.withColumn(
            "effective_to", F.lead("effective_from").over(w_isl)
        )
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("__island")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshot versions of the same table into a change feed
    — the inverse of :func:`apply_cdc` (and the audit step between a
    versioned publish and its predecessor): one row per key that was
    inserted, deleted, or updated, with ``op`` ('I'/'D'/'U') and
    ``changed_cols`` (the updated columns, sorted; empty for I/D).

    ``compare_cols`` defaults to every non-key column shared by both
    sides. Null-safe on VALUES: a null→value or value→null transition
    counts as a change (eqNullSafe), and a key present in both with
    identical compared values emits nothing. Contract on KEYS: unique
    and non-null per side (the snapshot invariant ``apply_cdc``
    maintains) — duplicate keys would fan out through the join, and a
    null key never equi-matches, so it would misreport as one D plus
    one I.

    Returns the NEW side's payload for I/U rows and the OLD side's for
    D rows, under the new schema's shared columns.

    Scale shape: one full-outer join co-partitioned on the key — both
    sides shuffle once on the same key (two 100 TB snapshots diff as a
    sort-merge join, never a collect); the change classification and
    column comparison are scan-stage expressions over the joined row.
    """
    shared = [c for c in new.columns if c in set(old.columns)]
    if compare_cols is None:
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        F.struct(*[F.col(c) for c in shared]).alias("__old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        F.struct(*[F.col(c) for c in shared]).alias("__new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("__old").isNotNull()
    in_new = F.col("__new").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__old.{c}").eqNullSafe(F.col(f"__new.{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(F.size(diffs) > 0, F.lit("U"))
    )
    payload = F.when(in_new, F.col("__new")).otherwise(F.col("__old"))
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("op") == "U", diffs).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .select(
            *[payload.getField(c).alias(c) for c in shared],
            "op",
            "changed_cols",
        )
    )
