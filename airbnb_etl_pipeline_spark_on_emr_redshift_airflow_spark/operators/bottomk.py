"""Mergeable bottom-k sample ledgers (KMV / priority sampling).

The fourth member of the additive-state ledger family (counts →
``operators.aggregates.incremental_agg_state``, distinct →
``operators.sketches.hll_ledger``, quantiles →
``operators.histogram.histogram_ledger``): a uniform random sample
per group that can be MAINTAINED incrementally. Priority sampling
makes a sample mergeable: give every item a deterministic hash
priority, keep the k smallest — then the bottom-k of a union is the
bottom-k of the merged bottom-k sets, so per-period ledger rows
compose into any later window without rescanning raw data. The same
structure is the classic KMV (k minimum values) sketch: the kth
smallest normalized priority estimates the group's distinct count as
``(k - 1) / u_k``.

Where ``operators.sampling`` answers "give me a sample of THIS
frame", this module answers the 100 TB curation question "keep a
living inspection/eval sample per segment as the corpus grows" — a
re-delivered batch leaves the SAMPLE unchanged (set-union semantics
over (priority, id)); the additive ``n_rows`` sidecar, by contrast,
assumes DISJOINT periods (see ``merge_bottomk_ledgers``) — and
serving explodes KB-sized ledger rows, never touching the corpus.

Scale shape: the build shuffles only slim (keys, priority, id[,
payload]) tuples — one exchange, rank-filtered to ≤ k per group
before the ledger row is assembled. Merges fold ledger-sized frames
with ``array_distinct``/``array_sort``/``slice`` — scan-stage array
ops on arrays bounded by k.

Determinism: priorities default to ``xxhash64`` (seed-stable across
runs and partitions). Any bigint-valued expression can substitute —
the catalog probe uses a Knuth multiplicative hash expressible in
ANSI SQL so DuckDB replays the identical sample for the value-hash
oracle; production callers keep the default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 64


def _priority(id_col: str, priority: Column | None) -> Column:
    """Priority expression, resolved against the CALLER's frame (so a
    custom ``priority`` may reference any of its columns)."""
    if priority is not None:
        return priority.cast("bigint")
    return F.xxhash64(F.col(id_col))


def bottomk_ledger(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    k: int = DEFAULT_K,
    priority: Column | None = None,
) -> DataFrame:
    """One ledger row per ``keys`` group: ``sample`` — the k
    (priority, id) structs with the smallest priorities, sorted — plus
    the additive exact ``n_rows``. Duplicate ids within the build
    collapse first (set semantics), so re-delivered rows never skew
    the sample. The rank filter runs on the slim projection; payloads
    re-attach at serve time via join if needed."""
    slim = df.select(
        *keys,
        F.col(id_col).alias("__id"),
        _priority(id_col, priority).alias("__pri"),
    )
    # ONE exchange on keys serves everything: the pre-dedup row count
    # (unordered full-partition window), the first-occurrence dedup
    # (duplicate ids sort adjacent under (pri, id), so lag != id keeps
    # exactly one), the rank filter, and the final groupBy — filter
    # and groupBy ride the window's hash partitioning, so no second
    # corpus scan and no count-side self-join.
    w_all = Window.partitionBy(*keys)
    w_ord = Window.partitionBy(*keys).orderBy("__pri", "__id")
    ranked = (
        slim.withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__prev", F.lag("__id").over(w_ord))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("__id")))
        .withColumn("__rn", F.row_number().over(w_ord))
        .filter(F.col("__rn") <= k)
    )
    return ranked.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__pri").alias("pri"), F.col("__id").alias("id"))
            )
        ).alias("sample"),
        F.max("__n").cast("bigint").alias("n_rows"),
    )


def merge_bottomk_ledgers(
    ledgers: list[DataFrame], keys: list[str], k: int = DEFAULT_K
) -> DataFrame:
    """Union ledger frames and fold per key: flatten the sample
    arrays, dedup (set-union over (priority, id) — overlapping or
    re-delivered periods collapse), sort by priority and keep the k
    smallest. Associative and order-independent, so daily → monthly →
    yearly rollups compose; the fold never carries more than
    (#ledgers × k) structs per key.

    Idempotence scope: only the SAMPLE is replay-idempotent — a
    re-delivered or overlapping period collapses in the set-union but
    its ``n_rows`` is summed AGAIN, double-counting the additive
    sidecar (and with it ``ledger_distinct_estimate``'s ``n_rows``
    passthrough). ``n_rows`` additivity therefore requires disjoint
    periods; the period-partition overwrite cadence in
    ``examples/incremental.py`` guarantees exactly that (a replayed
    batch REPLACES its partition rather than appending a duplicate
    ledger row). Pinned in ``tests/test_bottomk.py``."""
    out = ledgers[0]
    for led in ledgers[1:]:
        out = out.unionByName(led)
    return out.groupBy(*keys).agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(sample)))), 1, {k})"
        ).alias("sample"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def ledger_sample(ledger: DataFrame, keys: list[str]) -> DataFrame:
    """Explode a ledger to sample rows (one row per kept id, with its
    sample rank and the group's additive ``n_rows``) — the serving
    view for "show me a stable uniform sample per segment".
    Deterministic: the same corpus state always yields the same rows
    in the same ranks."""
    return ledger.select(
        *keys,
        "n_rows",
        F.posexplode("sample").alias("rank", "s"),
    ).select(
        *keys, (F.col("rank") + 1).alias("rank"), "s.pri", "s.id", "n_rows"
    )


def ledger_distinct_estimate(
    ledger: DataFrame,
    keys: list[str],
    k: int = DEFAULT_K,
    pri_lo: int = -(2**63),
    pri_hi: int = 2**63,
) -> DataFrame:
    """KMV distinct-count estimate per key from the kth smallest
    priority: normalize priorities to (0, 1) over the priority range
    ``[pri_lo, pri_hi)``, then ``est = (k - 1) / u_k``. Groups with
    fewer than k distinct ids report their exact sample size (the
    sample IS the distinct set there). Cross-checked against HLL and
    exact counts in ``tests/test_bottomk.py``.

    The default range is the full signed int64 domain — valid ONLY
    for the default ``xxhash64`` priority of ``bottomk_ledger``. A
    ledger built with a custom priority (e.g. the ANSI Knuth hash in
    [0, 2^32) the catalog probes use for cross-engine replay) MUST
    pass its actual range, or ``u_k`` sits near 0.5 and the estimate
    silently degenerates to ``~2(k-1)``; pinned in
    ``tests/test_bottomk.py``."""
    size = F.size("sample")
    u_k = (
        F.element_at(F.col("sample"), size).getField("pri").cast("double")
        - F.lit(float(pri_lo))
    ) / F.lit(float(pri_hi) - float(pri_lo))
    est = F.when(size < k, size.cast("double")).otherwise(
        (F.lit(float(k - 1))) / u_k
    )
    return ledger.select(
        *keys,
        "n_rows",
        size.alias("sample_size"),
        est.cast("bigint").alias("distinct_est"),
    )


def ledger_jaccard(
    ledger: DataFrame, key: str, k: int = DEFAULT_K
) -> DataFrame:
    """Pairwise segment-overlap estimates served from the bottom-k
    ledger ALONE — the set capability HLL lacks (sketch union exists,
    intersection doesn't): because every group hashes ids with the
    same priority function, the bottom-k of a UNION of two groups is
    computable from their two samples, and the classic KMV Jaccard
    estimator is ``|U ∩ S_A ∩ S_B| / |U|`` where ``U`` is the k
    smallest of the combined samples. One row per unordered group
    pair with the intersection/union sample sizes and a 1e-6
    fixed-point Jaccard estimate (exact when both groups hold fewer
    than k distinct ids — the samples ARE the sets there).

    Deterministic integer/array arithmetic end to end, so a probe can
    value-hash it cross-engine when the priority is ANSI-expressible.
    Scale shape: the ledger is one row per segment; the pair join is
    a broadcast over the segment-count frame (dim-sized by contract —
    segments, not rows), and every array op is bounded by k."""
    a = ledger.select(
        F.col(key).alias("key_a"), F.col("sample").alias("sa")
    )
    b = ledger.select(
        F.col(key).alias("key_b"), F.col("sample").alias("sb")
    )
    pairs = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
    u = F.expr(f"slice(array_sort(array_distinct(concat(sa, sb))), 1, {k})")
    return (
        pairs.withColumn("__u", u)
        .select(
            "key_a",
            "key_b",
            F.size(
                F.expr("array_intersect(array_intersect(__u, sa), sb)")
            )
            .cast("bigint")
            .alias("inter_size"),
            F.size("__u").cast("bigint").alias("union_size"),
        )
        .withColumn(
            "jaccard_fp",
            F.floor(
                F.col("inter_size")
                * F.lit(1_000_000)
                / F.col("union_size").cast("double")
            ).cast("bigint"),
        )
    )
