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


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str,
) -> DataFrame:
    """Resample each key's observations onto a regular ``step`` grid
    with LINEAR interpolation between the bracketing observations —
    the numeric sibling of :func:`resample_ffill` (step-function fill
    is right for states; linear is right for continuously-varying
    measurements like sensor values or prices).

    Semantics: at grid instant t with previous observation (tp, vp)
    and next strictly-later observation (tn, vn),
    ``v = vp + (vn − vp) · (t − tp)/(tn − tp)`` over microsecond
    epochs; a grid instant that HITS an observation returns that
    value exactly (t = tp ⇒ the fraction is 0); past the last
    observation the fill degrades to forward-fill (no extrapolation —
    fabricating a trend after the series ended is how dashboards
    lie). The grid anchors at each key's first observation, so row 0
    is always real data.

    Plan shape: per-key bounds agg → scan-side ``sequence`` grid
    explode → UNION with the observations → ONE key-partitioned
    window pass computing the previous and next observation via
    ignore-nulls ``last``/``first`` over asymmetric frames (the same
    single-shuffle union trick as the as-of join — never a per-row
    range join, never Python). Same-timestamp duplicate observations
    should be reduced upstream (the bracketing pick would otherwise
    be arbitrary).
    """
    from pyspark.sql import Window

    bounds = df.groupBy(key_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(__lo, __hi, interval {step})")).alias(
            ts_col
        ),
    )
    obs = df.select(
        key_col, ts_col, F.col(value_col).cast("double").alias("__v")
    )
    u = grid.select(
        key_col, ts_col,
        F.lit(None).cast("double").alias("__v"),
        F.lit(True).alias("__is_grid"),
    ).unionByName(obs.withColumn("__is_grid", F.lit(False)))
    # observations sort BEFORE the grid row at the same instant, so
    # the trailing frame's last() sees them (exactness at hits) and
    # the strictly-following frame's first() skips them
    w = Window.partitionBy(key_col).orderBy(ts_col, "__is_grid")
    obs_v = F.when(~F.col("__is_grid"), F.col("__v"))
    obs_t = F.when(~F.col("__is_grid"), F.unix_micros(F.col(ts_col)))
    prev_f = w.rowsBetween(Window.unboundedPreceding, 0)
    next_f = w.rowsBetween(1, Window.unboundedFollowing)
    # one select, not chained withColumn: the optimizer then collapses
    # the same-frame functions into one Window node per frame (two
    # passes over one sort) instead of four
    m = u.select(
        "*",
        F.last(obs_v, ignorenulls=True).over(prev_f).alias("__pv"),
        F.last(obs_t, ignorenulls=True).over(prev_f).alias("__pt"),
        F.first(obs_v, ignorenulls=True).over(next_f).alias("__nv"),
        F.first(obs_t, ignorenulls=True).over(next_f).alias("__nt"),
    ).filter(F.col("__is_grid"))
    t = F.unix_micros(F.col(ts_col))
    frac = (t - F.col("__pt")).cast("double") / (
        F.col("__nt") - F.col("__pt")
    ).cast("double")
    v = F.when(
        F.col("__nt").isNull() | (F.col("__nt") == F.col("__pt")),
        F.col("__pv"),
    ).otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    return m.select(key_col, ts_col, v.alias(value_col))
