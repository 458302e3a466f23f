"""Product-analytics operators over event streams: sequential funnels
and retention cohorts.

The reference's analytical layer stops at grouped aggregates and
window frames over the dimensional model
(``etl_notebooks/redshift-etl-notebook.ipynb`` cells 35-51); these
operators extend that surface to the two event-sequence questions
every behavioral warehouse asks — "how many users progressed through
step 1 → 2 → 3?" and "of the users who arrived in week W, how many
came back k weeks later?" — using the driver testdata's ``events``
table.

Scale notes (both operators):

- The only wide exchange is a hash partition on the user column. The
  funnel's chained per-step minima are whole-partition window
  aggregates sharing ONE partitioning spec, so Catalyst plans a single
  exchange followed by stacked Window operators (no per-step joins —
  an N-step funnel via self-joins would be N shuffles of the full
  event log). The trailing per-user roll-up reuses the same hash
  partitioning, and the final step-count frame is N rows.
- ``retention_cohorts`` is the same shape: one window pass for the
  per-user first-seen week, then a grouped distinct-count whose key
  space (cohort × offset) is tiny compared to the event log.
- Neither operator materializes per-user event arrays, so a
  pathologically chatty user costs sort time, not memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, Column]],
    max_gap: str | None = None,
) -> DataFrame:
    """Strictly-ordered sequential funnel: a user reaches step ``i``
    when some event matching ``steps[i]``'s predicate happens strictly
    after their earliest step ``i-1`` arrival (and, with ``max_gap``
    e.g. ``"1 HOUR"``, within that gap of it). Each step binds to the
    user's EARLIEST qualifying event — the standard "first conversion"
    semantics, deterministic regardless of event order on disk.

    Returns one row per step: ``step_idx`` (1-based), ``step`` (name),
    ``users`` (count of users reaching it) — monotonically
    non-increasing down the funnel.
    """
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    out = df
    step_cols: list[str] = []
    for i, (_, pred) in enumerate(steps):
        cond = pred
        if step_cols:
            prev = F.col(step_cols[-1])
            cond = cond & (ts > prev)
            if max_gap is not None:
                cond = cond & (ts <= prev + F.expr(f"INTERVAL {max_gap}"))
        name = f"__step{i}_ts"
        out = out.withColumn(name, F.min(F.when(cond, ts)).over(w))
        step_cols.append(name)
    reached = out.groupBy(user_col).agg(
        *[
            F.max(F.col(c).isNotNull().cast("int")).alias(f"__r{i}")
            for i, c in enumerate(step_cols)
        ]
    )
    counts = reached.agg(
        *[
            F.sum(f"__r{i}").cast("bigint").alias(f"__c{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(name).alias("step"),
                F.col(f"__c{i}").alias("users"),
            )
            for i, (name, _) in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly retention matrix: each user's cohort is the Monday-start
    week of their first event; every event then counts its user as
    active in ``week_offset = (event week - cohort week)`` weeks.

    Returns ``cohort_week`` (date), ``week_offset`` (int, 0 = the
    cohort week itself), ``active_users`` (distinct users) — the
    classic retention triangle, with offset 0 equal to cohort size.
    """
    w = Window.partitionBy(user_col)
    cohort = F.date_trunc("week", F.min(F.col(ts_col)).over(w))
    event_week = F.date_trunc("week", F.col(ts_col))
    return (
        df.withColumn("__cw", cohort)
        .select(
            F.col(user_col),
            F.to_date("__cw").alias("cohort_week"),
            (F.datediff(event_week, F.col("__cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).cast("bigint").alias("active_users"))
    )
