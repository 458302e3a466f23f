"""Retention-delete orchestration for the ledger families.

Every derived-artifact family in this engine has a tested delete
path, but the MECHANISM splits by algebra (the taxonomy
``operators.aggregates.subtract_lm_counts`` documents):

- **abelian states** (LM counts, additive agg_state components,
  BM25 postings, minhash signature rows): deletes fold the removed
  rows' own contribution back in with the inverse —
  ``subtract_lm_counts`` / ``bm25_index_remove`` /
  ``minhash_index_remove``, O(removed + vocab), never a rescan;
- **monotone sketches** (HLL registers, bottom-k samples,
  heavy-hitter summaries, histogram bins under *row* deletion):
  max/min/rank joins have NO inverse, so the ledger layout's native
  delete path is to RECOMPUTE the affected period partitions from the
  surviving source — O(affected periods), never O(history).

This module is the second path's orchestration, which previously
existed only as a docstring promise: :func:`rebuild_ledger_periods`
re-derives named period partitions through the caller's builder (the
same function that built them in the first place, now reading the
post-delete source) and atomically republishes each one — partitions
whose source slice emptied entirely are dropped, exactly as a from-
scratch rebuild would never have created them. Every OTHER period's
partition is untouched, so the fold over the ledger afterwards equals
a full rebuild from the survivors (pinned per family in
``tests/test_retention.py``).

100 TB shape: cost is (periods touched by the delete) × (one period's
build), each build reading only that period's surviving slice; the
unaffected history — the overwhelming bulk of a years-deep ledger —
is never read. Replay-idempotent like the ingest side: re-running a
rebuild republishes byte-equivalent partitions (the builders are
deterministic for a given input set).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
)


def rebuild_ledger_periods(
    spark: SparkSession,
    ledger_root: str,
    periods: list[str],
    build: Callable[[str], DataFrame],
    validate: Callable[[str], bool] | None = None,
) -> dict[str, str]:
    """Recompute the named period partitions of a period-partitioned
    ledger from the (post-delete) source and atomically republish
    them. ``periods`` are the partition names as laid out on disk —
    ``"<lo>_<hi>"`` for the ``period=<lo>_<hi>`` convention the
    incremental example uses. ``build(period)`` must return the fresh
    delta frame for that period FROM THE SURVIVING SOURCE — the same
    builder that produced the partition at ingest, now seeing fewer
    rows. Returns {period: action} with action ∈
    {"rebuilt", "dropped"}:

    - non-empty fresh delta → staged + swapped via
      :func:`sources.gating.atomic_publish` (a crash mid-rebuild
      leaves the previous partition intact);
    - EMPTY fresh delta (every source row of the period deleted) →
      the partition is removed — a from-scratch rebuild would never
      have created it, and an empty partition would change nothing in
      the fold anyway but bloat the listing forever.

    Periods not named are untouched; the caller decides which periods
    a delete touches (for id-range layouts that is pure arithmetic on
    the deleted keys — no data read)."""
    out: dict[str, str] = {}
    for p in periods:
        part = f"{ledger_root.rstrip('/')}/period={p}"
        fresh = build(p)
        if fresh.limit(1).isEmpty():
            fsutil.delete(spark, part)
            out[p] = "dropped"
            continue
        atomic_publish(fresh, part, validate=validate)
        out[p] = "rebuilt"
    return out


def periods_touched_by_keys(
    deleted_keys: list[int], periods: list[tuple[int, int]]
) -> list[str]:
    """Which ``(lo, hi)`` id-range periods a key-set delete touches —
    pure arithmetic, no data read (the id-range ledger layout's whole
    point: retention planning is metadata-plane). Returns partition
    names in the ``"<lo>_<hi>"`` on-disk convention, in ledger
    order."""
    touched = []
    for lo, hi in periods:
        if any(lo <= k < hi for k in deleted_keys):
            touched.append(f"{lo}_{hi}")
    return touched
