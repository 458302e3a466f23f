"""Column profiling — the data-quality summary a warehouse load gate
runs (generalizes the reference's notebook sanity checks: row counts,
null-key checks, distribution peeks — ``emr-etl-test-notebook.ipynb``
cells 4-54 — into one operator).

One pass over the data: all per-column aggregates compute in a single
hash-aggregate stage (no per-column scans), then unpivot driver-side
via a literal stack — the profile output is O(columns), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats: rows, nulls, approx distinct, min/max (as
    strings, to keep one schema across column types). Returns one row
    per column: (column, n_rows, n_nulls, approx_distinct, min, max).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            "__n",
            f"__nulls_{c}",
            f"__dist_{c}",
            f"__min_{c}",
            f"__max_{c}",
        ]
    stack = (
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_rows, n_nulls, approx_distinct, min_value, max_value)"
    )
    return wide.selectExpr(stack)


def exact_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Variant with exact distinct counts (one extra shuffle per
    column's distinct — use :func:`profile` at scale)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            "__n",
            f"__nulls_{c}",
            f"__dist_{c}",
            f"__min_{c}",
            f"__max_{c}",
        ]
    stack = (
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_rows, n_nulls, exact_distinct, min_value, max_value)"
    )
    return wide.selectExpr(stack)
