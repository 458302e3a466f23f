"""Window operators — the reference's signature dedup plus moving frames.

Reference behaviors rebuilt (SURVEY.md §2.5):

- **latest-record-per-key** via ``F.last`` over an unbounded frame +
  filter + dropDuplicates (``apps/process_listings_hosts.py:121-125``,
  ``apps/process_reviewers.py:85-92``) — kept as ``latest_per_key``
  for behavioral parity, plus the idiomatic ``row_number``-desc
  variant ``latest_per_key_rn`` (provably equivalent when the order
  key is unique; see tests).
- moving average / moving sum over bounded ROWS frames
  (``redshift-etl-notebook.ipynb`` cells 43, 45).

Scale note: every window here shuffles once on its partition keys.
A `row_number`-based latest-per-key is preferred at 100 TB over the
reference's last()+filter+dropDuplicates because it dedups in a single
window pass (no second shuffle for dropDuplicates) and AQE handles
skewed partition keys.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Iterable[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in names]


def latest_per_key(
    df: DataFrame, keys: list[str], order: list[str | Column]
) -> DataFrame:
    """Reference-parity latest-snapshot-per-key.

    Exactly the reference's move (``apps/process_listings_hosts.py:
    121-125``): ``F.last(order_key)`` over an unbounded frame per key,
    keep rows whose order key equals that latest value, then
    ``dropDuplicates(keys)`` to absorb ties. With a non-unique order
    key the survivor among ties is arbitrary — use
    :func:`latest_per_key_rn` with tie-breaks for determinism.
    """
    order_col = order[0] if isinstance(order[0], str) else None
    if order_col is None:
        raise ValueError("latest_per_key needs a named order column")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        df.withColumn("__latest", F.last(order_col).over(w))
        .filter(F.col(order_col) == F.col("__latest"))
        .drop("__latest")
        .dropDuplicates(keys)
    )


def latest_per_key_rn(
    df: DataFrame, keys: list[str], order_desc: list[str | Column]
) -> DataFrame:
    """Deterministic latest-per-key: ``row_number() == 1`` over a
    descending order that must include a unique tie-break column.
    One shuffle, one pass — the 100 TB-preferred form.
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in _cols(order_desc)])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_versions(
    df: DataFrame,
    keys: list[str],
    change_ts: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Derive an SCD2 (slowly-changing-dimension type 2) version table
    from a change history: per key, each row becomes a version valid
    from its change timestamp until the next change; the last version
    per key is current.

    The reference only keeps SCD1 (newest row wins — W1); this is the
    history-preserving extension, built from one ``lead()`` window —
    the MERGE-free Spark idiom (guide: emulate CDC/SCD2 with window +
    union when no Delta MERGE is available). One shuffle on ``keys``.

    Adds: ``valid_from`` (= change_ts), ``valid_to`` (next change's ts,
    NULL while current), ``is_current``.
    """
    order = [change_ts] + list(order_tiebreak or [])
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    return (
        df.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def global_distribution_ranks(
    df: DataFrame,
    value_col: str,
    tiebreak: list[str],
    n_tiles: int = 4,
    n_buckets: int = 32,
    rel_err: float = 0.001,
) -> DataFrame:
    """Global ntile/percent_rank/cume_dist WITHOUT a single-partition
    window — the fact-scale form of ``Window.orderBy(...)`` (which
    Spark executes as one Exchange SinglePartition + sort: a driver-
    sized bottleneck at 100 TB).

    Three-phase distributed global rank:

    1. Bucket every row by value against ``n_buckets`` approximate
       quantile boundaries — a scan-stage CASE expression, no shuffle.
       Equal values land in the same bucket, so bucketing is monotone
       w.r.t. the global order even though boundaries are approximate.
    2. Count rows per bucket (tiny aggregate, ≤ n_buckets rows) and
       turn the counts into cumulative offsets + grand total — a
       window over the tiny frame, then a broadcast join back.
    3. Rank locally inside each bucket (one shuffle, partitioned by
       bucket — sizes bounded by the quantile spacing) and add the
       bucket offset: ``global_rn = offset + local_rn``.

    Requires ``(value_col, *tiebreak)`` to be a unique total order
    (same contract the oracle needs): then row_number == rank, so
    ``percent_rank = (rn-1)/(N-1)`` and ``cume_dist = rn/N`` match the
    SQL functions exactly. ``value_col`` must be non-null: engines
    disagree on default null ordering (Spark NULLS FIRST vs DuckDB
    NULLS LAST), and the bucket expression would lump nulls into
    bucket 1 — filter or coalesce nulls upstream.

    Skew note: a single value spanning > 1/n_buckets of the data
    collapses into one bucket; AQE's skew handling splits the sort,
    but the offset math stays correct regardless.

    Adds columns: ``global_rn``, ``quartile`` (ntile(n_tiles)),
    ``pct_rank``, ``cdist``.
    """
    boundaries = df.stat.approxQuantile(
        value_col, [i / n_buckets for i in range(1, n_buckets)], rel_err
    )
    # Monotone value-based bucket id: 1 + #boundaries strictly below x.
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + F.when(F.col(value_col) > F.lit(b), 1).otherwise(0)
    bucketed = df.withColumn("__bucket", bucket)

    counts = bucketed.groupBy("__bucket").agg(F.count("*").alias("__cnt"))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )

    w_local = Window.partitionBy("__bucket").orderBy(
        F.col(value_col), *_cols(tiebreak)
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn("__rn", F.col("__offset") + F.row_number().over(w_local))
    )
    n = F.col("__total")
    rn = F.col("__rn")
    # SQL ntile: the first (N % n_tiles) buckets get ceil(N/n_tiles)
    # rows, the rest floor(N/n_tiles).
    q = (n / n_tiles).cast("long")
    r0 = n % n_tiles
    big = r0 * (q + 1)
    quartile = (
        F.when(rn <= big, ((rn - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r0 + ((rn - big - 1) / q).cast("long") + 1)
        .cast("int")
    )
    return (
        ranked.withColumn("global_rn", rn)
        .withColumn("quartile", quartile)
        .withColumn(
            "pct_rank",
            F.when(n > 1, (rn - 1).cast("double") / (n - 1)).otherwise(0.0),
        )
        .withColumn("cdist", rn.cast("double") / n)
        .drop("__bucket", "__cnt", "__offset", "__total", "__rn")
    )


def moving_agg(
    df: DataFrame,
    partition: list[str],
    order: list[str | Column],
    preceding: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Bounded-frame moving aggregates: ``ROWS <preceding> PRECEDING``
    to current row, per partition (reference cells 43/45:
    ``avg(temperature) OVER (... ROWS 7 PRECEDING)``).

    ``aggs`` maps output name -> aggregate Column (un-windowed); the
    frame is applied here. ``order`` must be a deterministic total
    order within each partition for cross-engine reproducibility.
    """
    w = (
        Window.partitionBy(*partition)
        .orderBy(*_cols(order))
        .rowsBetween(-preceding, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
