"""Streaming data quality: expectations enforced per micro-batch with
a dead-letter quarantine.

Batch pipelines gate BETWEEN stages (``pipeline.expectations_pass``);
a stream has no between — a violating record either blocks the whole
stream (an outage every time a producer hiccups) or silently pollutes
the table. The standard resolution is row-level routing: each
micro-batch splits on the SAME declarative rule set the batch gates
use, clean rows append to the facade table, violating rows land in a
quarantine sidecar TAGGED with the rules they failed — triage-able,
re-playable, and never blocking ingest.

Exactly-once on both paths: the data append pins the stream batch id
(a checkpoint replay REWRITES its own batches — the facade's
convergence discipline) and the quarantine writes the same pinned
``batch=`` partitions, so replays rewrite rather than duplicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
    Table,
)


def _rule_predicates(rules: dict[str, str]):
    """(all-pass predicate, failed-rules array column) — violation =
    predicate false OR NULL (fail-closed, matching operators.dq)."""
    if not rules:
        raise ValueError("stream_gated_append: empty rule set")
    ok = F.lit(True)
    tags = []
    for name, pred in rules.items():
        passes = F.coalesce(F.expr(pred), F.lit(False))
        ok = ok & passes
        tags.append(F.when(~passes, F.lit(name)))
    failed = F.array_compact(F.array(*tags))
    return ok, failed


def stream_gated_append(
    table: Table,
    source_dir: str,
    source_schema: str,
    checkpoint_dir: str,
    rules: dict[str, str],
    quarantine_dir: str,
):
    """Structured-Streaming ingest into ``table`` with per-row
    expectations: micro-batch rows satisfying every rule append
    (pinned to the stream batch id, idempotent under replay); the
    rest land under ``quarantine_dir/batch=N`` with a
    ``__failed_rules`` array naming the rules each row failed.
    ``availableNow`` trigger: drain, then stop. Cost: the rule
    conjunction is scan-stage; the split scans the (bounded)
    micro-batch twice."""
    ok, failed = _rule_predicates(rules)

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.filter(~ok).withColumn(
            "__failed_rules", failed
        ).write.mode("overwrite").parquet(
            f"{quarantine_dir.rstrip('/')}/batch={batch_id + 1}"
        )
        # always append (possibly empty) so live batch numbering
        # stays aligned with the stream's — replays rewrite in place
        table.append(batch_df.filter(ok), batch_id=batch_id + 1)

    return (
        table.spark.readStream.schema(source_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
