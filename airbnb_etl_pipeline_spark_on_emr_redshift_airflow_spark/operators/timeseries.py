"""Time-series regularization operators: per-key resampling onto a
fixed-step grid with forward-fill.

The reference treats time series as plain rows with a date column
windowed at query time (SURVEY.md §1.1); this extends the surface
with the one operation that model requires but SQL windows alone
don't give you: converting an IRREGULAR observation stream into a
REGULAR grid (gap filling), the precondition for moving averages,
seasonal decomposition, and feature tensors with fixed time axes.

Spark has no native resample; this composes two operators the engine
already owns: per-key bounds → ``F.sequence`` grid explode (scan-side,
no shuffle beyond the bounds agg) → :func:`operators.joins.asof_join`
(union + one window pass, a single shuffle on the key). Nothing is
collected to the driver and no per-key Python runs, so a key with
years of history costs sort time, not memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
    asof_join,
)


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str,
    payload_cols: list[str],
) -> DataFrame:
    """Resample each key's observations onto a regular ``step`` grid
    (e.g. ``"1 DAY"``), forward-filling every payload column from the
    most recent observation at-or-before each grid instant.

    The grid spans each key's own [min(ts), max(ts)], anchored at the
    key's first observation — so grid row 0 always carries real values
    and the fill never fabricates data before a key existed. Callers
    with same-timestamp duplicate observations should reduce them
    first (e.g. ``groupBy(key, ts).agg(...)``); the as-of tie rule
    would otherwise pick an arbitrary one.

    Returns ``key_col, ts_col`` (grid instants) + ``payload_cols``.
    """
    bounds = df.groupBy(key_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(__lo, __hi, interval {step})")).alias(
            ts_col
        ),
    )
    obs = df.select(key_col, ts_col, *payload_cols)
    return asof_join(grid, obs, key_col, ts_col, payload_cols)
