"""Mergeable distinct-count ledgers (Apache DataSketches HLL via
Spark's ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The incremental-analytics discipline the engine already applies to
counts (``incremental_agg_state``) and BM25 (tf/dl tables), extended
to DISTINCT counts — the one aggregate that is NOT naively additive:
``distinct(day1) + distinct(day2) != distinct(day1 ∪ day2)``. An HLL
sketch IS additive under union, so a per-(period, dimension) ledger of
sketch rows supports any later rollup window — distinct users last
7/30/90 days, per source, per event type — by unioning ledger rows,
never rescanning the corpus.

Scale shape: building a ledger is one groupBy over the period's data
(map-side partial sketches — DataSketches aggregates merge on the
combine side, so the shuffle carries one sketch per (group, partition),
kilobytes each, not raw values). Merging ledgers shuffles only
ledger-sized frames (periods × dimensions). Estimates are a pure
projection. The ~0.8%-at-lgK=12 standard error is the price for
replacing a full-corpus distinct scan with a KB-sized ledger row; the
exact path (``count_distinct``) stays available where the corpus scan
is acceptable.

Determinism: DataSketches HLL is deterministic for a given input SET,
and the union operation is commutative/associative over sketches, so
ledger estimates are layout- and merge-order-independent (pinned by
``tests/test_sketches.py``: split-merge == direct-build, bit-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DataSketches lgConfigK: 2^12 registers ≈ 0.8% relative standard
# error at ~4 KB per sketch — the size/accuracy point that keeps a
# (365 days × 1000 sources) ledger around a gigabyte.
DEFAULT_LGK = 12


def hll_ledger(
    df: DataFrame,
    keys: list[str],
    distinct_cols: list[str],
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One ledger row per ``keys`` group: an HLL sketch per tracked
    column (binary, named ``<col>__hll``) plus the exact additive
    ``n_rows``. Ledgers over DISJOINT row sets merge losslessly with
    :func:`merge_hll_ledgers`; overlapping sets merge with set-union
    semantics (the point: a re-delivered day replaces nothing and
    double-counts nothing in the distinct estimate)."""
    aggs = [
        F.hll_sketch_agg(F.col(c), lgk).alias(f"{c}__hll")
        for c in distinct_cols
    ]
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"), *aggs
    )


def merge_hll_ledgers(
    ledgers: list[DataFrame], keys: list[str], lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Union ledger frames and fold per-key: sketches via
    ``hll_union_agg``, row counts additively. The result is again a
    ledger (same schema), so merging is associative — daily → monthly
    → yearly rollups compose. Cost is ledger-sized, never
    corpus-sized."""
    out = ledgers[0]
    for led in ledgers[1:]:
        out = out.unionByName(led)
    sketch_cols = [c for c in out.columns if c.endswith("__hll")]
    aggs = [
        F.hll_union_agg(F.col(c), True).alias(c) for c in sketch_cols
    ]
    return out.groupBy(*keys).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"), *aggs
    )


def ledger_estimates(ledger: DataFrame, keys: list[str]) -> DataFrame:
    """Project a ledger to per-key distinct-count estimates (bigint
    ``<col>_distinct`` per tracked column) plus ``n_rows`` — the
    serving-side view; sketch binaries never leave the ledger."""
    sketch_cols = [c for c in ledger.columns if c.endswith("__hll")]
    ests = [
        F.hll_sketch_estimate(F.col(c))
        .cast("bigint")
        .alias(c.removesuffix("__hll") + "_distinct")
        for c in sketch_cols
    ]
    return ledger.select(*keys, "n_rows", *ests)


def rolling_distinct(
    ledger: DataFrame,
    partition_keys: list[str],
    order_key: str,
    window_rows: int,
) -> DataFrame:
    """Rolling distinct counts over a period-keyed ledger: for each
    row, union the trailing ``window_rows`` periods' sketches with a
    windowed ``hll_union_agg`` and estimate — the classic
    "distinct users, trailing 7/30/90 days, per segment" family
    without ever rescanning raw data. The window operates on the
    LEDGER (periods × dimensions rows, KB sketches), so a year of
    daily rolling distincts costs one window pass over ~365 rows per
    segment. ``window_rows`` counts ledger rows (periods) including
    the current one."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_keys)
        .orderBy(order_key)
        .rowsBetween(-(window_rows - 1), 0)
    )
    sketch_cols = [c for c in ledger.columns if c.endswith("__hll")]
    out = ledger.select(
        *partition_keys,
        order_key,
        "n_rows",
        F.sum("n_rows").over(w).cast("bigint").alias("rolling_rows"),
        *[
            F.hll_sketch_estimate(F.hll_union_agg(F.col(c), True).over(w))
            .cast("bigint")
            .alias(c.removesuffix("__hll") + "_rolling_distinct")
            for c in sketch_cols
        ],
    )
    return out


# ----- engine-native register HLL (round 11) -------------------------------
#
# The DataSketches ledger above is battle-tested but its binary sketch
# is engine-internal — rows-only for the oracle gate. This native form
# trades a little accuracy machinery (no bias tables) for FULL
# determinism and SQL-replayability: registers are plain (keys,
# bucket, register) ROWS (the BM25 "the rows ARE the index"
# discipline), built from pure column expressions — xxhash64 bucket
# low bits, trailing-zero rho (a geometric variable identical in law
# to the leading-zero form), integer MAX folds — so DuckDB replays
# the ENTIRE sketch bit-for-bit via plans.xxh and the estimate
# value-hashes cross-engine (the a_hll_native_ledger catalog query).
# Merge = groupBy MAX: associative, commutative, idempotent —
# re-delivery is a free no-op, the strongest replay story of the
# ledger family. Flajolet et al. 2007 estimator with linear counting
# for the small range; no large-range correction (64-bit hash space).


def hll_register_ledger(
    df: DataFrame, keys: list[str], value_col: str, p: int = 10
) -> DataFrame:
    """One register row per (keys, bucket): ``register`` = max over
    the group's values of (trailing zeros of the hash's high bits)+1.
    Sparse — absent buckets are zero registers. One (keys, bucket)
    exchange; nothing row-wise in Python."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_register_ledger: p={p} out of [4, 16]")
    m = 1 << p
    hashed = df.select(
        *keys, F.xxhash64(F.col(value_col)).alias("__h")
    ).select(
        *keys,
        F.col("__h").bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.expr(f"shiftrightunsigned(__h, {p})").alias("__rest"),
    )
    rho = F.when(F.col("__rest") == 0, F.lit(64 - p + 1)).otherwise(
        F.expr("bit_count((__rest & -__rest) - 1) + 1")
    )
    return (
        hashed.select(*keys, "bucket", rho.cast("int").alias("__rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("__rho").alias("register"))
    )


def merge_hll_register_ledgers(
    ledgers: list[DataFrame], keys: list[str]
) -> DataFrame:
    """Union + per-bucket MAX — associative/commutative/idempotent,
    KB-sized inputs, never the corpus."""
    u = ledgers[0]
    for led in ledgers[1:]:
        u = u.unionByName(led)
    return u.groupBy(*keys, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_register_estimates(
    ledger: DataFrame, keys: list[str], p: int = 10
) -> DataFrame:
    """Per-keys distinct estimate from register rows. Exactness
    device: the harmonic sum Σ 2^-register is computed as the EXACT
    integer Σ 2^(63-register) (every term a bigint power of two,
    summed in DECIMAL(38,0) — order-independent), with zero registers
    contributing 2^63 each; the estimate is then ONE double division
    (+ linear counting via floor-quantized m·ln(m/V) when the raw
    estimate is under 2.5m — the ln cross-engine discipline
    t_bigram_lm_score established). Output: (keys, n_set, estimate_fp
    = floor(est·1000 + ½))."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    num = float(alpha * m * m * (1 << 63))
    per = ledger.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_set"),
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), 63 - register) "
                "AS DECIMAL(38,0))"
            )
        ).alias("__sp"),
    )
    total = (
        F.col("__sp")
        + (F.lit(m) - F.col("n_set")).cast("decimal(38,0)")
        * F.expr(f"CAST('{1 << 63}' AS DECIMAL(38,0))")
    )
    raw = F.lit(num) / total.cast("double")
    v_zero = (F.lit(m) - F.col("n_set")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_set") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return per.select(
        *keys,
        "n_set",
        F.floor(est * F.lit(1000) + F.lit(0.5))
        .cast("bigint")
        .alias("estimate_fp"),
    )
