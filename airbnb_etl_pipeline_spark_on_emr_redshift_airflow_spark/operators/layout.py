"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The reference's only layout tool is hive-style ``partitionBy``
(year/month/city — SURVEY §1.1), which prunes on ONE dimension
hierarchy. At 100 TB, scans filtered on several independent columns
(e.g. ``date`` AND ``user_id`` ranges) need the file layout itself to
co-locate rows that are close in EVERY filtered dimension, so parquet
row-group min/max stats can skip files: that is Z-ordering — interleave
the bits of the bucketized dimensions into one sort key, then
range-partition + sort by it. A run of consecutive Z values is a
hypercube-ish block, so each file's bounding box is tight in all
dimensions at once (a plain lexicographic sort is tight in the first
dimension and unbounded in the rest).

Everything here is pure column bit-arithmetic — codegen'd JVM
expressions, no UDFs, no driver work beyond building the expression
tree (``bits × dims`` shift-mask-or terms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto the ``[0, 2^bits)`` integer grid by
    equal-width bucketing over ``[lo, hi]`` (values outside clamp to
    the edge cells). Deterministic, engine-portable arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    raw = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * n).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved-bit (Morton) key over already-bucketized integer
    columns, each in ``[0, 2^bits)`` (see :func:`bucketize`). Bit ``i``
    of column ``d`` lands at position ``i * n_dims + d`` (column 0
    takes the most significant slot of each round), so consecutive key
    values walk a space-filling curve that keeps every dimension's
    extent within a run of length ``L`` at most ``~L^(1/n_dims)``
    grid cells. ``n_dims * bits`` must fit the 64-bit key (≤ 63)."""
    n_dims = len(cols)
    if n_dims * bits > 63:
        raise ValueError(
            f"zorder_key: {n_dims} dims × {bits} bits exceeds a 64-bit key"
        )
    key = F.lit(0).cast("bigint")
    for d, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("bigint")
        for i in range(bits):
            target = i * n_dims + (n_dims - 1 - d)
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), target)
            )
    return key


def zorder_layout(
    df: DataFrame,
    dims: list[tuple[str, float, float]],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional data skipping: bucketize
    each ``(col, lo, hi)`` dim, range-partition on the interleaved
    Z key and sort within partitions by it, then drop the key. Write
    the result with a plain parquet sink — every file's min/max stats
    are then tight in ALL ``dims`` (see ``tests/test_layout.py`` for
    the bounding-box proof), so engines skip files on any conjunction
    of dim predicates. One range exchange (sampled boundaries), same
    cost shape as a global sort."""
    if not dims:
        # no cluster dims (e.g. an all-string composite key with no
        # configured zone columns): plain compaction — size the file
        # count, skip the range exchange entirely
        return df.repartition(num_partitions) if num_partitions else df
    z = zorder_key(
        [bucketize(c, lo, hi, bits) for c, lo, hi in dims], bits
    )
    keyed = df.withColumn("__z", z)
    parted = (
        keyed.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else keyed.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
