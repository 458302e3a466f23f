"""Declarative data-quality expectations (Deequ / dbt-test shape).

The reference guards its pipeline with imperative quality gates
(row-count / uniqueness asserts between stages — SURVEY.md §5;
re-expressed in ``pipeline.py``). This is the declarative,
report-producing form a warehouse needs: a RULE SET evaluated in ONE
scan, emitting one row per rule with violation counts — the artifact
dashboards and gate decisions both consume (the boolean gate is
``report.filter(~ok)`` instead of a hand-written assert per check).

Scale shape: every row rule compiles to ``sum(CASE WHEN NOT rule)``
inside a single aggregate over one scan — 50 rules cost one pass,
not 50. Uniqueness is one groupBy on the key; referential integrity
is one anti-join probing the (broadcastable) parent keys. Nothing
row-wise in Python, no per-rule job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = ["rule", "n_total", "n_violations", "ok"]


def check_rows(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate SQL row-level expectations in ONE scan: ``rules``
    maps rule name → boolean SQL over the frame's columns (a row
    VIOLATES when the predicate is false or NULL — an expectation
    that cannot be evaluated is not satisfied, the fail-closed
    reading). Returns one row per rule: (rule, n_total,
    n_violations, ok)."""
    if not rules:
        raise ValueError("check_rows: empty rule set")
    import re as _re

    for name in rules:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"check_rows: rule name {name!r} must be a plain "
                "identifier (it becomes a column name and a string "
                "literal in the unpivot)"
            )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            # coalesce the SUM itself: over an EMPTY frame it is NULL,
            # and a NULL n_violations makes ok NULL — which boolean
            # gates (filter(~ok)) silently drop; an empty input is an
            # explicit pass (0 violations), not an unevaluated rule
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(F.expr(pred), F.lit(False)), 0)
                    .otherwise(1)
                ),
                F.lit(0),
            ).cast("bigint").alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    # unpivot the ONE aggregate row with stack() — a per-rule union of
    # projections would re-plan (and re-scan) the aggregate once per
    # rule, turning N rules into N source scans
    quoted = ", ".join(
        f"'{name}', __v_{name}" for name in rules
    )
    return row.selectExpr(
        "__n AS n_total",
        f"stack({len(rules)}, {quoted}) AS (rule, n_violations)",
    ).select(
        "rule", "n_total", "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None
                 ) -> DataFrame:
    """Uniqueness expectation over a key: n_violations = rows beyond
    the first per duplicated key (0 ⇔ the key is unique). One
    groupBy shuffle on the key."""
    name = name or ("unique_" + "_".join(cols))
    g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return g.agg(
        F.lit(name).alias("rule"),
        # empty input: explicit (0, 0, TRUE), not NULLs a gate drops
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n_total"),
        F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).cast("bigint")
        .alias("n_violations"),
        (F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)) == 0).alias("ok"),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, keys: list[str],
    parent_keys: list[str] | None = None,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity expectation: every child key must exist
    in the parent (NULL child keys violate — fail-closed; an anti
    join never matches a NULL key, which is the violating reading
    here). ``parent_keys`` names the parent-side columns when they
    differ (``l_orderkey`` → ``o_orderkey``). One anti-join; the
    parent's distinct key set is dim-sized and AQE broadcasts it."""
    name = name or ("fk_" + "_".join(keys))
    pk = parent_keys or keys
    pset = parent.select(
        *[F.col(p).alias(c) for p, c in zip(pk, keys)]
    ).distinct()
    n = child.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    orphans = child.join(pset, keys, "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    return n.crossJoin(orphans).select(
        F.lit(name).alias("rule"),
        F.col("n").alias("n_total"),
        F.col("v").alias("n_violations"),
        (F.col("v") == 0).alias("ok"),
    )


def dq_report(*parts: DataFrame) -> DataFrame:
    """Union expectation results into one report frame."""
    out = parts[0].select(*_SCHEMA)
    for p in parts[1:]:
        out = out.unionByName(p.select(*_SCHEMA))
    return out
