"""Join operators (SURVEY.md §2.3) + the incremental-merge pipeline op.

Reference behaviors rebuilt:

- left-outer FK enrichment (``apps/process_reviews.py:110-116``)
- inner equi-joins incl. composite keys (``apps/process_weather.py:92-97``)
- broadcast joins for small dims (the 4-row station lookup,
  ``apps/preprocess_data.py:142-145``)
- the NOT-IN anti-join the reference rejected as too slow
  (``README.md:193-199``) — implemented properly as Spark's
  null-safe ``left_anti``
- the delta-filter incremental operator that replaced it
  (``apps/process_reviews.py:98-105``)
- the full monthly merge loop: union + latest-per-key dedup
  (``apps/process_reviews.py:146-148``)

Extensions beyond the reference: semi join, range join, as-of join.

Scale notes: dims go through ``F.broadcast`` (no shuffle of the fact
side); the as-of join is a union + single window pass (one shuffle on
the join key) rather than a per-row lookup; range joins pre-filter on
the equi key so Catalyst plans a sort-merge join with the range as a
post-join predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "left"
) -> DataFrame:
    """FK enrichment against a dimension table, broadcast to every
    executor — no shuffle of the (large) fact side. Rebuild of the
    reviews←listings host_id attach (``apps/process_reviews.py:110-116``)
    and the station→city lookup (``apps/process_weather.py:96-97``).
    """
    return fact.join(F.broadcast(dim), on, how)


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` — the operator the
    reference wrote as ``WHERE id NOT IN (SELECT ...)`` and abandoned
    after >2 h (``README.md:193-199``). Spark's ``left_anti`` is a
    single shuffled (or broadcast) hash join; at 100 TB this is the
    correct incremental-new-rows primitive when exactness matters.
    """
    return left.join(right, on, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """EXISTS semantics (surface extension; SURVEY.md §2.3 notes the
    reference only has the NOT-IN anti pattern)."""
    return left.join(right, on, "left_semi")


def delta_filter(df: DataFrame, state: DataFrame, col: str, state_col: str) -> DataFrame:
    """Incremental new-rows selection: keep rows of ``df`` with
    ``col >= max(state[state_col])`` — the reference's cheap
    replacement for the anti-join (``apps/process_reviews.py:98-105``),
    deliberately over-inclusive at the boundary (downstream dedup
    absorbs re-delivered rows).

    Implemented as a scalar-aggregate cross join: the 1-row max is
    broadcast, so the big side streams through a filter — no shuffle.
    """
    bound = state.agg(F.max(state_col).alias("__bound"))
    return (
        df.crossJoin(F.broadcast(bound))
        .filter(F.col(col) >= F.col("__bound"))
        .drop("__bound")
    )


def incremental_merge(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_desc: list[str],
) -> DataFrame:
    """The reference's monthly upsert: union snapshot + delta, keep the
    newest row per key (``apps/process_reviews.py:146-148`` +
    ``apps/process_listings_hosts.py:120-125``). ``order_desc`` must
    end in a unique tie-break for deterministic survivors.

    One union (shuffle-free) + one window shuffle on ``keys``. This is
    the batch MERGE/SCD1 primitive; at scale, partition both inputs by
    ``keys`` on write so the window shuffle is map-side-local.
    """
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
        latest_per_key_rn,
    )

    merged = snapshot.unionByName(delta, allowMissingColumns=True)
    return latest_per_key_rn(merged, keys, order_desc)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the left (skewed) side gets a
    deterministic per-row salt, the right side is replicated once per
    salt value, and the join key becomes (key, salt) — a hot key's
    rows spread over ``n_salts`` reducers instead of one straggler.

    AQE's skew-join splitting (on in the session profile) handles most
    skew automatically; use this when a single key is so hot that even
    split shuffle blocks overwhelm one executor, or under static plans.
    Output columns = left ∪ right minus the duplicate key, like
    ``join(on=str)``.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    salted_l = left.withColumn("__salt", salt.cast("int"))
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: tuple[str, str],
    range_pred: Column,
) -> DataFrame:
    """Equi + range join: equi key carries the shuffle, the range
    predicate applies post-join (Catalyst plans sort-merge join with
    extra condition). Surface extension — the reference approximates
    ranges with window frames + equi join (SURVEY.md §2.3 note).
    """
    lcol, rcol = equi
    return left.join(right, (F.col(lcol) == F.col(rcol)) & range_pred, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join: each left row gets the payload of the most recent
    right row with ``right.ts <= left.ts`` (or ``< left.ts`` with
    ``strict=True``), per ``on`` key.

    Spark lacks a native ASOF JOIN; implemented as the scalable
    union-and-window pattern: tag both sides, union, sort by (key, ts,
    side) and carry the last right-side payload forward with
    ``F.last(ignorenulls=True)`` over an unbounded-preceding frame —
    one shuffle total, no per-row lookups, no ``merge_asof`` on the
    driver. By default ties (right.ts == left.ts) match, mirroring
    DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.

    ``strict=True`` is the POINT-IN-TIME (feature-store) form: a left
    row at ``t`` sees only right rows strictly before ``t`` — a
    same-instant observation never leaks into its own label row. The
    only mechanical difference is the tie ordering of the union tags,
    so both forms share the one-shuffle plan.
    """
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0 if strict else 1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__payload"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*right_payload).alias("__payload"),
    )
    # Default: __side orders right rows before left rows at equal ts,
    # so a same-timestamp right row is visible to the left row (>=).
    # strict: the order flips, so at equal ts the left row is scanned
    # first and sees only strictly-earlier right payloads (>).
    left_tag = 0 if strict else 1
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_l.unionByName(tagged_r)
    matched = unioned.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == left_tag)
    out = matched.select("__lrow.*", "__asof")
    for c in right_payload:
        out = out.withColumn(c, F.col(f"__asof.{c}"))
    return out.drop("__asof")
