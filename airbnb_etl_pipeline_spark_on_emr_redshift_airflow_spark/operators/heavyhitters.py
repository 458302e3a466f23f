"""Mergeable heavy-hitters (top-k frequency) ledgers with sound
count bounds.

Fifth member of the additive-state ledger family (counts →
``operators.aggregates.incremental_agg_state``, distinct →
``operators.sketches.hll_ledger``, quantiles →
``operators.histogram.histogram_ledger``, samples →
``operators.bottomk.bottomk_ledger``): the most-frequent items per
group, maintainable per period and composable into any later window
without rescanning raw data — "top domains per language this
quarter" over a 100 TB corpus becomes a fold over KB-sized ledger
rows.

Unlike Misra-Gries / SpaceSaving, whose merge result depends on the
order partial summaries are combined (no deterministic value for an
oracle to check), each period's ledger here stores its EXACT top-k
``(item, cnt)`` pairs plus two scalars about everything it dropped:
``other_max`` (the largest dropped count — an upper bound on any
absent item) and ``other_mass`` (the total dropped count). The merge
is the classic threshold-algorithm bound fold: for an item seen in
any period's top, ``lb`` = sum of counts where present, and
``ub = lb + Σ other_max(periods not containing it)`` — every
quantity an integer sum, fully deterministic, so the whole algebra
is value-hash checkable against ANSI SQL (``a_heavy_hitters_ledger``
probe) rather than "approximately right".

Guarantees (pinned in ``tests/test_heavyhitters.py``):

- build: ``top`` counts are exact; any item with true count >
  ``other_max`` is guaranteed present (if it had been dropped its
  count would be ≤ ``other_max``).
- merge: ``lb ≤ true count ≤ ub`` for every reported item; any item
  with true total > merged ``other_max`` is present in the merged
  top. Nested merges stay sound for BOTH claims — the struct's
  per-item ``ub`` field survives truncating merges, so a re-merge
  sums recorded ubs (not lbs) on the upper side (bounds can only
  loosen, never lie).

Scale shape: the build is a word-count — ONE exchange on
``(keys, item)`` for the exact counts, then one keys-sized exchange
that serves the rank filter and the ledger assembly (the groupBy
rides the window's partitioning). The merge never touches the
corpus: it folds frames bounded by (#periods × k) rows per group.
Reference parity: the reference's analytics notebook computes
"top reviewers / busiest listings" shapes with full group-by +
ORDER BY LIMIT over the raw tables each run (notebook cells 35-51);
this ledger form is the incremental-maintenance equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 16


def heavyhitters_ledger(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int = DEFAULT_K,
    weight_col: str | None = None,
) -> DataFrame:
    """One ledger row per ``keys`` group: ``top`` — the k most
    frequent items as ``(rn, item, cnt, ub)`` structs (count desc,
    item asc tie-break, so ties are deterministic; for a built ledger
    ``ub == cnt`` — counts are exact) — plus ``other_max`` (largest
    dropped count, 0 if nothing dropped), ``other_mass`` (total
    dropped count) and the additive ``n_rows``. The per-item ``ub``
    field exists so MERGED ledgers stay inductively sound: after a
    truncating merge the stored cnt is a lower bound, and the upper
    bound must come from the inputs' recorded ubs, not their lbs.

    WEIGHTED form (round 7): pass ``weight_col`` to rank items by an
    additive measure instead of frequency — "top-revenue parts per
    flag" instead of "most frequent parts". ``cnt`` becomes
    ``Σ weight`` per item and ``n_rows`` the group's total mass; the
    ENTIRE downstream algebra (merge, presence guarantee, lb/ub
    bounds) is weight-agnostic because it only ever adds and compares
    the stored bigints. Soundness requires NONNEGATIVE integer
    weights (quantize money to cents etc. upstream — the catalog's
    fixed-point discipline): a negative weight would let a dropped
    item exceed ``other_max``, and float weights would reintroduce
    the combine-order nondeterminism the integer algebra exists to
    kill. Weighted guarantees pinned in ``tests/test_heavyhitters``;
    full value-hash oracle: ``a_weighted_hitters``."""
    # Loud guard on the weighted form (same philosophy as
    # link_records_blocked's max_block_rows): an all-NULL-weight item
    # would yield cnt NULL flowing into the ledger struct and merge
    # arithmetic as NULL — coalesce to 0; a NEGATIVE summed weight
    # breaks lb/ub soundness (a dropped item can exceed other_max) —
    # fail the job naming the offending item instead of emitting an
    # unsound ledger.
    measure = (
        F.count(F.lit(1))
        if weight_col is None
        else F.coalesce(F.sum(F.col(weight_col)), F.lit(0))
    )
    cnts = df.groupBy(*keys, F.col(item_col).alias("item")).agg(
        measure.cast("bigint").alias("cnt")
    )
    if weight_col is not None:
        guard = F.assert_true(
            F.col("cnt") >= 0,
            F.concat_ws(
                "",
                F.lit("heavyhitters_ledger: item '"),
                F.col("item").cast("string"),
                F.lit("' summed weight "),
                F.col("cnt").cast("string"),
                F.lit(
                    f" < 0 (weight_col={weight_col!r} must be "
                    "nonnegative — negative weights break the "
                    "ledger's lb/ub bound soundness)"
                ),
            ),
        )
        # filter form (like embedding_near_dup_pairs): a guard in a
        # FILTER can't be pruned by Catalyst; it passes every row
        # (assert_true is NULL on success) or fails the job.
        cnts = cnts.filter(guard.isNull())
    w = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("item"))
    ranked = cnts.withColumn("__rn", F.row_number().over(w))
    # the groupBy rides the window's hash partitioning on keys — no
    # extra exchange; struct leads with rn so array_sort orders the
    # top by rank without a comparator lambda
    return ranked.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__rn") <= k,
                    F.struct(
                        F.col("__rn").alias("rn"),
                        F.col("item"),
                        F.col("cnt"),
                        F.col("cnt").alias("ub"),
                    ),
                )
            )
        ).alias("top"),
        F.coalesce(
            F.max(F.when(F.col("__rn") > k, F.col("cnt"))), F.lit(0)
        )
        .cast("bigint")
        .alias("other_max"),
        F.coalesce(
            F.sum(F.when(F.col("__rn") > k, F.col("cnt"))), F.lit(0)
        )
        .cast("bigint")
        .alias("other_mass"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
    )


def heavyhitters_ledgers_by(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    period_col: str,
    k: int = DEFAULT_K,
    weight_col: str | None = None,
) -> list[DataFrame]:
    """ALL period ledgers in ONE scan (round 11): building N period
    ledgers by calling :func:`heavyhitters_ledger` once per
    ``df.filter(period = p)`` costs N full scans of the raw data —
    at 100 TB that is N corpus passes for identical per-group math.
    Grouping with the period as a leading key is algebraically
    identical (the window partitions on ``(period, keys)``, so every
    period's rank/other_max/other_mass/n_rows are computed exactly as
    the per-filter build would), costs ONE scan + one exchange, and
    the stacked result is ledger-sized — it localCheckpoints (cutting
    the scan lineage so the per-period slices below don't re-read the
    corpus) and slices per period. Returns the ledgers in period-sort
    order; equality with the per-filter build is pinned in
    ``tests/test_heavyhitters.py``.

    NULL periods are excluded up front: the per-filter build this is
    equivalent to probes ``period = p``, which no NULL row ever
    matches — and a ``None`` in the distinct-periods list would make
    ``sorted()`` raise. The filter keeps the two builds identical."""
    df = df.filter(F.col(period_col).isNotNull())
    stacked = heavyhitters_ledger(
        df, [period_col, *keys], item_col, k=k, weight_col=weight_col
    ).localCheckpoint()
    periods = sorted(
        r[period_col]
        for r in stacked.select(period_col).distinct().collect()
    )
    return [
        stacked.filter(F.col(period_col) == p).drop(period_col)
        for p in periods
    ]


def _merged_items(ledgers: list[DataFrame], keys: list[str]) -> DataFrame:
    """Internal bound fold shared by :func:`merge_heavyhitters_ledgers`
    and :func:`ledger_topk_bounds`: one row per (keys, item) seen in
    any input row's top, with ``lb``/``ub`` and the per-group totals.
    Inductively sound over nested merges: ``lb`` sums the inputs'
    recorded counts (lower bounds), ``ub`` sums the inputs' recorded
    PER-ITEM ubs where present plus ``other_max`` where absent — a
    merged input's lost slack lives in its ub field, so it is never
    silently dropped."""
    u = ledgers[0]
    for led in ledgers[1:]:
        u = u.unionByName(led)
    per_key = u.groupBy(*keys).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("other_max").cast("bigint").alias("tot_omax"),
        F.sum("other_mass").cast("bigint").alias("tot_omass"),
    )
    ex = u.select(
        *keys,
        F.col("other_max").alias("__row_omax"),
        F.explode("top").alias("t"),
    ).select(*keys, "t.item", "t.cnt", "t.ub", "__row_omax")
    items = ex.groupBy(*keys, "item").agg(
        F.sum("cnt").cast("bigint").alias("lb"),
        F.sum("ub").cast("bigint").alias("__sum_ub"),
        # Σ other_max over the input rows whose top CONTAINS the item;
        # ub subtracts it from the all-rows total, charging the item
        # only for rows where it might hide below the cut
        F.sum("__row_omax").cast("bigint").alias("__cover"),
    )
    # per_key is one row per group — ledger-sized; AQE broadcasts it
    return items.join(per_key, keys).withColumn(
        "ub",
        (F.col("__sum_ub") + F.col("tot_omax") - F.col("__cover")).cast(
            "bigint"
        ),
    )


def merge_heavyhitters_ledgers(
    ledgers: list[DataFrame], keys: list[str], k: int = DEFAULT_K
) -> DataFrame:
    """Fold period ledgers into one ledger frame with the SAME schema
    as :func:`heavyhitters_ledger` (re-mergeable). Stored counts are
    the lower bounds and the struct's ``ub`` field carries each
    item's true upper bound; ``other_max`` becomes the largest upper
    bound a dropped or never-seen item could reach, and
    ``other_mass`` accumulates everything truncated — so nested
    merges keep BOTH guarantees (presence: true > other_max ⇒ in
    top; bounds: lb ≤ true ≤ ub) while bounds can only loosen,
    never lie."""
    m = _merged_items(ledgers, keys)
    w = Window.partitionBy(*keys).orderBy(F.desc("lb"), F.asc("item"))
    ranked = m.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__rn") <= k,
                    F.struct(
                        F.col("__rn").alias("rn"),
                        F.col("item"),
                        F.col("lb").alias("cnt"),
                        F.col("ub"),
                    ),
                )
            )
        ).alias("top"),
        F.greatest(
            F.coalesce(
                F.max(F.when(F.col("__rn") > k, F.col("ub"))), F.lit(0)
            ),
            F.max("tot_omax"),
        )
        .cast("bigint")
        .alias("other_max"),
        (
            F.max("tot_omass")
            + F.coalesce(
                F.sum(F.when(F.col("__rn") > k, F.col("lb"))), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("other_mass"),
        F.max("n_rows").cast("bigint").alias("n_rows"),
    )


def ledger_topk(ledger: DataFrame, keys: list[str]) -> DataFrame:
    """Explode a ledger to serving rows: one row per kept item with
    its rank, count (exact for a built ledger, lower bound for a
    merged one) and the group's additive ``n_rows``."""
    return ledger.select(
        *keys, "n_rows", F.explode("top").alias("t")
    ).select(
        *keys,
        F.col("t.rn").alias("rank"),
        F.col("t.item").alias("item"),
        F.col("t.cnt").alias("cnt"),
        "n_rows",
    )


def ledger_topk_bounds(
    ledgers: list[DataFrame], keys: list[str], k: int = DEFAULT_K
) -> DataFrame:
    """Serving view across periods WITH bounds: the top-k items per
    group by lower bound, each carrying ``lb ≤ true ≤ ub``. The
    deterministic integer algebra here is what the catalog probe
    value-hashes against DuckDB."""
    m = _merged_items(ledgers, keys)
    w = Window.partitionBy(*keys).orderBy(F.desc("lb"), F.asc("item"))
    return (
        m.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", "item", "lb", "ub", "n_rows")
    )
