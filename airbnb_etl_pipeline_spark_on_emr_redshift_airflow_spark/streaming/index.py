"""Streaming inverted-index maintenance: a ``foreachBatch`` loop that
keeps the persisted BM25 index current as document batches arrive.

The batch-side contract (``operators.retrieval.bm25_index`` /
``merge_bm25_index``) is that the (tf, dl) pair is ADDITIVE over
disjoint document sets — merge is a pure union. Streamed, that means
each micro-batch's index rows simply APPEND to the persisted tables:
no read-modify-write, no snapshot rewrite, no merge job at all. The
serving side (``bm25_search_with``) derives df / n_docs / avgdl as
rollups at query time, so appended batches are visible to search the
moment the files commit.

Delivery semantics: ``foreachBatch`` alone is at-least-once — a batch
replayed after a failure (partial job commit, or a crash between the
write and the checkpoint commit) would run again. The sink makes the
replay IDEMPOTENT the standard way: each micro-batch writes under a
``batch_id=<id>``-derived subdirectory with ``mode("overwrite")``, and
Structured Streaming guarantees a replayed batch carries the SAME
``batch_id``, so the retry rewrites the same directory instead of
double-appending (double-appended (tf, dl) rows would silently inflate
tf/df/n_docs/avgdl and corrupt every BM25 score). Read the tables back
via :func:`read_streamed_index`, which drops the layout's partition
column.

Scale notes: per batch the cost is one explode + one (id, term)
groupBy over the BATCH alone — O(batch tokens), never O(corpus); the
persisted tf table should be written partitioned by a hash of term
(``writers`` knob) so query-time probes touch a bounded directory
subset.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
    bm25_index,
)


def stream_index_maintenance(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: str,
    index_tf_path: str,
    index_dl_path: str,
    checkpoint_dir: str,
    tokens_col: str = "t",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Tail parquet document batches in ``docs_dir`` (schema:
    ``id_col bigint, tokens_col array<string>``) and append each
    micro-batch's (tf, dl) index rows to the persisted tables.
    ``availableNow`` trigger: index everything new since the last
    checkpoint, then stop — the daily-ingest cadence. Batches must
    carry distinct doc ids (the disjointness contract of
    ``merge_bm25_index``; dedup upstream)."""

    def _append(batch_df, batch_id: int) -> None:
        tf, dl = bm25_index(batch_df, tokens_col, id_col)
        # Idempotent append: a replayed micro-batch has the same
        # batch_id, so overwrite of the batch's own subdirectory
        # rewrites rather than double-appends.
        tf.write.mode("overwrite").parquet(f"{index_tf_path}/batch_id={batch_id}")
        dl.write.mode("overwrite").parquet(f"{index_dl_path}/batch_id={batch_id}")

    return (
        spark.readStream.schema(docs_schema)
        .format("parquet")
        .load(docs_dir)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_index(
    spark: SparkSession,
    index_tf_path: str,
    index_dl_path: str,
    batch_predicate: str | None = None,
):
    """Load the streamed (tf, dl) index tables, hiding the
    ``batch_id=`` idempotency layout (partition discovery surfaces it
    as a column; serving code wants the plain ``bm25_index`` schema).
    Because ``batch_id`` is dropped here, callers can never filter on
    it after this returns — ``batch_predicate`` (a SQL boolean over
    ``batch_id``, e.g. ``"batch_id >= 7"``) applies BEFORE the drop so
    partition pruning skips the excluded batch directories entirely."""
    tf = spark.read.parquet(index_tf_path)
    dl = spark.read.parquet(index_dl_path)
    if batch_predicate is not None:
        tf = tf.filter(batch_predicate)
        dl = dl.filter(batch_predicate)
    return tf.drop("batch_id"), dl.drop("batch_id")
