"""Tests: streaming BM25 index maintenance — micro-batch appends must
equal the one-shot batch index, only NEW files process on a second
availableNow run, and search over the streamed index matches the fused
operator."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
    bm25_index,
    bm25_search,
    bm25_search_with,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.index import (
    read_streamed_index,
    stream_index_maintenance,
)

DOCS_SCHEMA = "doc_id bigint, t array<string>"

_BATCH1 = [
    (1, ["spark", "shuffle", "join"]),
    (2, ["spark", "spark", "table"]),
]
_BATCH2 = [
    (3, ["join", "merge", "table"]),
    (4, ["unrelated", "words"]),
]


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, docs_dir, tf_path, dl_path, ckpt):
    q = stream_index_maintenance(
        spark, docs_dir, DOCS_SCHEMA, tf_path, dl_path, ckpt
    )
    q.awaitTermination()


def test_streamed_index_equals_batch_rebuild(spark, tmp_dir):
    docs_dir = f"{tmp_dir}/docs"
    tf_path, dl_path = f"{tmp_dir}/tf", f"{tmp_dir}/dl"
    ckpt = f"{tmp_dir}/ckpt"

    _write_docs(spark, docs_dir, _BATCH1)
    _run(spark, docs_dir, tf_path, dl_path, ckpt)
    # second run from the same checkpoint: only batch 2 is new
    _write_docs(spark, docs_dir, _BATCH2)
    _run(spark, docs_dir, tf_path, dl_path, ckpt)

    all_docs = spark.createDataFrame(_BATCH1 + _BATCH2, DOCS_SCHEMA)
    want_tf, want_dl = bm25_index(all_docs)
    got_tf, got_dl = read_streamed_index(spark, tf_path, dl_path)
    assert sorted(map(tuple, got_tf.collect())) == sorted(
        map(tuple, want_tf.collect())
    )
    assert sorted(map(tuple, got_dl.collect())) == sorted(
        map(tuple, want_dl.collect())
    )

    # search over the streamed index == the fused one-shot operator
    queries = spark.createDataFrame(
        [(1, ["spark", "join"])], "query_id bigint, q array<string>"
    )
    a = sorted(
        map(tuple, bm25_search_with((got_tf, got_dl), queries, k=4).collect())
    )
    b = sorted(map(tuple, bm25_search(all_docs, queries, k=4).collect()))
    assert a == b


def test_streamed_index_second_run_is_noop_without_new_files(spark, tmp_dir):
    docs_dir = f"{tmp_dir}/docs"
    tf_path, dl_path = f"{tmp_dir}/tf", f"{tmp_dir}/dl"
    ckpt = f"{tmp_dir}/ckpt"
    _write_docs(spark, docs_dir, _BATCH1)
    _run(spark, docs_dir, tf_path, dl_path, ckpt)
    before = sorted(
        map(tuple, read_streamed_index(spark, tf_path, dl_path)[0].collect())
    )
    _run(spark, docs_dir, tf_path, dl_path, ckpt)  # nothing new
    after = sorted(
        map(tuple, read_streamed_index(spark, tf_path, dl_path)[0].collect())
    )
    assert before == after


def test_streamed_index_replayed_batch_is_idempotent(spark, tmp_dir):
    """foreachBatch is at-least-once: simulate a replay by deleting the
    checkpoint's commit marker for batch 0 (as after a crash between
    the write and the checkpoint commit). The rerun re-executes batch 0
    with the SAME batch_id; the batch_id=0/overwrite layout must
    rewrite, not double-append (a blind append would double tf/df and
    corrupt BM25 scores)."""
    import os

    docs_dir = f"{tmp_dir}/docs"
    tf_path, dl_path = f"{tmp_dir}/tf", f"{tmp_dir}/dl"
    ckpt = f"{tmp_dir}/ckpt"
    _write_docs(spark, docs_dir, _BATCH1)
    _run(spark, docs_dir, tf_path, dl_path, ckpt)
    os.remove(f"{ckpt}/commits/0")
    # local-FS checksum shadow; a stale CRC makes the commit rewrite
    # look like a concurrent writer to HDFSMetadataLog
    crc = f"{ckpt}/commits/.0.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, docs_dir, tf_path, dl_path, ckpt)  # replays batch 0

    want_tf, want_dl = bm25_index(spark.createDataFrame(_BATCH1, DOCS_SCHEMA))
    got_tf, got_dl = read_streamed_index(spark, tf_path, dl_path)
    assert sorted(map(tuple, got_tf.collect())) == sorted(
        map(tuple, want_tf.collect())
    )
    assert sorted(map(tuple, got_dl.collect())) == sorted(
        map(tuple, want_dl.collect())
    )
