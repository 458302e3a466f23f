"""Dependency-ordered stage runner with quality gates (SURVEY.md §2.11).

The reference's Airflow DAG semantics — fan-out/fan-in ordering
(weather ∥ listings→reviews→reviewers), per-stage output-existence
gates, row-count quality checks, idempotent re-runs parameterized by a
period key (``airbnb-etl-airflow.py:108-147,536-551``) — rebuilt as
library code. The AWS control plane (EMR steps, sensors, Redshift
COPY) is explicitly out of scope (SURVEY §7.5); what remains is the
part that affects correctness: ordering, gating, idempotence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Stage:
    """One pipeline stage: a function of (spark, period, context) that
    returns an arbitrary result (usually an output path or DataFrame),
    stored into the shared context under the stage name."""

    name: str
    fn: Callable[[SparkSession, str, dict[str, Any]], Any]
    deps: tuple[str, ...] = ()
    # Optional gates, run against the stage result; each is
    # (description, predicate). A failing gate aborts the pipeline —
    # the reference's path_exists / check_redshift_loaded behavior.
    gates: tuple[tuple[str, Callable[[Any], bool]], ...] = ()


@dataclass
class PipelineRun:
    period: str
    results: dict[str, Any] = field(default_factory=dict)
    executed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)


class Pipeline:
    """Topologically-ordered stage executor.

    Stages whose ``fn`` returns ``None`` are treated as skipped
    (e.g. an idempotent write that found existing output) — mirroring
    the reference's create-if-absent short-circuit. A skipped stage
    stores no result, so a stage with dependents must NOT return
    ``None``: an idempotent stage that short-circuits should return
    its already-published output (path or re-read DataFrame) instead.
    Violations fail fast here rather than as a downstream ``KeyError``.
    """

    def __init__(self, stages: list[Stage]):
        self._stages = {s.name: s for s in stages}
        graph = {s.name: set(s.deps) for s in stages}
        for s in stages:
            for d in s.deps:
                if d not in self._stages:
                    raise ValueError(f"stage {s.name} depends on unknown {d}")
        self._order = list(TopologicalSorter(graph).static_order())
        self._dependents = {
            s.name: sorted(t.name for t in stages if s.name in t.deps)
            for s in stages
        }

    def run(self, spark: SparkSession, period: str) -> PipelineRun:
        run = PipelineRun(period=period)
        for name in self._order:
            stage = self._stages[name]
            result = stage.fn(spark, period, run.results)
            if result is None:
                if self._dependents[name]:
                    raise RuntimeError(
                        f"stage {name!r} skipped (fn returned None) but "
                        f"{self._dependents[name]} consume its result; "
                        "idempotent stages with dependents must return "
                        "their already-published output instead of None"
                    )
                run.skipped.append(name)
                continue
            for desc, predicate in stage.gates:
                if not predicate(result):
                    raise RuntimeError(
                        f"quality gate failed at stage {name!r}: {desc}"
                    )
            run.results[name] = result
            run.executed.append(name)
        return run


# ---- quality-gate helpers (reference §5 checks as assertions) -------


def non_empty(df: DataFrame) -> bool:
    """Reference check_redshift_loaded: COUNT(*) >= 1."""
    return df.limit(1).count() > 0


def unique_key(*keys: str) -> Callable[[DataFrame], bool]:
    """Reference PK-integrity check (test notebook cells 26/32/42/54):
    distinct key count equals row count."""

    def check(df: DataFrame) -> bool:
        return df.select(*keys).distinct().count() == df.count()

    return check


def no_nulls(*cols: str) -> Callable[[DataFrame], bool]:
    """Reference null-key check (cell 27): no NULLs in key columns."""

    def check(df: DataFrame) -> bool:
        pred = " OR ".join(f"{c} IS NULL" for c in cols)
        return df.filter(pred).limit(1).count() == 0

    return check


def no_drift(
    ref_path: str,
    numeric_cols: list[str] | None = None,
    cat_cols: list[str] | None = None,
    threshold: float = 0.2,
) -> Callable[[DataFrame], bool]:
    """Distribution-drift gate: the stage result's PSI against the
    last PUBLISHED snapshot at ``ref_path`` must stay under
    ``threshold`` on every monitored column
    (``operators.profile.drift_report``). First publish (no reference
    yet) passes vacuously — there is nothing to drift from. The gate
    that catches a corrupted delivery (unit change, truncated feed,
    swapped column) BEFORE it is promoted, the step the reference's
    row-count checks cannot see."""

    def check(df: DataFrame) -> bool:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.profile import (
            drift_report,
        )
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
            model_exists,
        )

        if not model_exists(ref_path):
            return True
        ref = df.sparkSession.read.parquet(ref_path)
        report = drift_report(
            ref, df, numeric_cols=numeric_cols, cat_cols=cat_cols,
            threshold=threshold,
        )
        return report.filter(F.col("drift")).limit(1).count() == 0

    return check


def expectations_pass(
    rules: dict[str, str],
    unique_keys: list[str] | None = None,
):
    """Declarative-expectations gate (bridges ``operators.dq`` into
    the stage-gate machinery): the stage result must satisfy every
    SQL row rule (ONE scan regardless of rule count, fail-closed on
    NULL) and, optionally, a key-uniqueness expectation. The same
    rule set that feeds a dashboard's ``dq_report`` artifact guards
    the pipeline — one definition, two consumers."""

    def check(df: DataFrame) -> bool:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dq import (
            check_rows,
            check_unique,
            dq_report,
        )

        parts = [check_rows(df, rules)]
        if unique_keys:
            parts.append(check_unique(df, unique_keys))
        bad = dq_report(*parts).filter("NOT ok").limit(1).collect()
        return not bad

    return check
