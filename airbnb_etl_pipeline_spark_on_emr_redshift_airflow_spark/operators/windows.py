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
