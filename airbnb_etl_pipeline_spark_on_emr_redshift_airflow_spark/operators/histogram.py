"""Mergeable histogram ledgers → exact-arithmetic quantile serving.

Completes the additive-state ledger family (counts →
``incremental_agg_state``, distinct → ``sketches.hll_ledger``) for the
remaining non-additive aggregate a pipeline dashboard needs:
QUANTILES. ``percentile(day1) + percentile(day2)`` is meaningless, but
a histogram over FIXED, pre-anchored bin edges is a vector of plain
counts — exactly additive, mergeable in any order, and a quantile is a
pure projection over the cumulative vector. The anchoring discipline
is the same as the PSI drift report (``operators/profile.py``): edges
come from a reference frame once, clamped edge bins absorb outliers,
so every period's ledger row is commensurable forever after.

Scale shape: building a ledger is ONE groupBy over the period's rows
with ``n_bins`` conditional sums (map-side combinable — the shuffle
carries one length-``n_bins`` bigint vector per (group, partition),
not raw values). Merging ledgers folds ledger-sized frames (periods ×
dimensions) with element-wise ``zip_with`` adds. Quantile serving
never touches raw data: a year of daily p95s per segment is one
projection over ~365 KB-sized rows per segment.

Determinism: bin counts are exact bigints; quantile interpolation uses
only +,-,*,/ on doubles — IEEE-754 correctly-rounded operations that
produce bit-identical results in Spark and DuckDB for the same
expression shape (unlike log/pow, see the drift-report caveat), so the
catalog probe carries a full value-hash oracle, not a rows-only check.

Against the reference: the reference computes distribution stats only
as full-table aggregates re-run per month (e.g. the review-score
profile, etl_notebooks/redshift-etl-notebook.ipynb cells 39-43); this
ledger yields the same numbers incrementally at 100 TB where the
rescan is not affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 40 bins ≈ 2.5% worst-case quantile mass per interior bin at ~320
# bytes per ledger row — the size/resolution point that keeps a
# (365 days × 1000 segments) ledger row set in the tens of MB.
DEFAULT_BINS = 40


def bin_expr(col: str, lo: float, hi: float, n_bins: int) -> F.Column:
    """Reference-anchored bin index with clamped edge bins — the same
    convention as the drift report's ``_numeric_bins``
    (operators/profile.py), so histogram ledgers and PSI reports built
    from the same anchors see the same bins. Engine-shared semantics:
    ``least(n-1, greatest(0, floor((x - lo) * n / span)))``."""
    span = float(hi) - float(lo)
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(col).cast("double") - F.lit(float(lo)))
                * F.lit(float(n_bins))
                / F.lit(span)
            ).cast("int"),
        ),
    )


def histogram_ledger(
    df: DataFrame,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    n_bins: int = DEFAULT_BINS,
) -> DataFrame:
    """One ledger row per ``keys`` group: ``bins`` — a fixed-length
    ``array<bigint>`` of per-bin counts over the anchored edges — plus
    the exact additive sidecar stats (``n_rows``, ``n_null``,
    ``vmin``/``vmax``). Single aggregation pass; the ``n_bins``
    conditional sums all fold map-side, so the exchange carries one
    short vector per (group, partition) regardless of row count."""
    b = bin_expr(col, lo, hi, n_bins)
    v = F.col(col).cast("double")
    counts = [
        F.sum(
            F.when(v.isNotNull() & (b == i), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint")
        for i in range(n_bins)
    ]
    return df.groupBy(*keys).agg(
        F.array(*counts).alias("bins"),
        F.count(v).cast("bigint").alias("n_rows"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_histogram_ledgers(
    ledgers: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Union ledger frames and fold per key: bin vectors element-wise
    (``aggregate`` over the collected vectors with ``zip_with`` adds —
    integer adds, so merge order is irrelevant), sidecar stats
    additively / via min-max. The result is again a ledger: merging is
    associative, daily → monthly → yearly rollups compose, and the
    fold only ever shuffles ledger-sized rows."""
    out = ledgers[0]
    for led in ledgers[1:]:
        out = out.unionByName(led)
    n_bins_expr = "size(bins)"
    return out.groupBy(*keys).agg(
        F.expr(
            f"""aggregate(
                  collect_list(bins),
                  array_repeat(0L, max({n_bins_expr})),
                  (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"""
        ).alias("bins"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("n_null").cast("bigint").alias("n_null"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def ledger_quantiles(
    ledger: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    qs: list[float],
) -> DataFrame:
    """Project a ledger to per-key interpolated quantiles — one
    ``q<percent>`` double column per requested quantile. Definition
    (inclusive-rank histogram quantile): with ``t = q * n_rows`` the
    target rank, find the first bin whose cumulative count reaches
    ``t``, then linearly interpolate inside it:

        lo + width * (bin + (t - cum_before) / bin_count)

    Pure +,-,*,/ arithmetic over exact integer counts — deterministic
    and bit-identical cross-engine (see module docstring). Entirely a
    projection: no shuffle, no raw-data access."""
    span = float(hi) - float(lo)
    out = ledger.withColumn(
        "__cum",
        F.expr(
            "transform(bins, (x, i) -> "
            "aggregate(slice(bins, 1, i + 1), 0L, (a, b) -> a + b))"
        ),
    )
    width = f"(CAST({span!r} AS DOUBLE) / CAST(size(bins) AS DOUBLE))"
    cols = []
    for q in qs:
        t = f"(CAST({float(q)!r} AS DOUBLE) * CAST(n_rows AS DOUBLE))"
        idx = f"array_position(transform(__cum, c -> CAST(c AS DOUBLE) >= {t}), true)"
        prev = f"(CASE WHEN {idx} <= 1 THEN 0L ELSE element_at(__cum, CAST({idx} AS INT) - 1) END)"
        cnt = f"element_at(bins, CAST({idx} AS INT))"
        val = (
            f"CAST({float(lo)!r} AS DOUBLE) + {width} * "
            f"(CAST({idx} AS DOUBLE) - CAST(1 AS DOUBLE) + "
            f"(({t} - CAST({prev} AS DOUBLE)) / CAST({cnt} AS DOUBLE)))"
        )
        name = f"q{int(round(q * 100)):02d}"
        cols.append(F.expr(val).alias(name))
    return out.select(*keys, "n_rows", *cols)
