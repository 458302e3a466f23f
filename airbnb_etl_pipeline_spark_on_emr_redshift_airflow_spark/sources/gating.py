"""Idempotent-write gating and atomic publish (S11/S12).

Reference behaviors rebuilt:

- ``model_exists`` — the S3 prefix check that gates every stage
  ("create if absent", ``apps/preprocess_data.py:17-24,83``): a coarse
  materialization cache that makes re-runs and backfills cheap.
- staged atomic publish — write to ``*_temp``, validate, swap
  (DAG ``update_dim_model``, ``airbnb-etl-airflow.py:116-135``):
  downstream readers never observe a half-written model.

Local/HDFS-style rename semantics via the filesystem; on object
stores the same staging-dir pattern applies with a manifest swap.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import Column, DataFrame


class ConcurrentWriteError(RuntimeError):
    """An optimistic-concurrency commit lost its CAS: another writer
    advanced the same table state (version pointer or change-log
    head) between this writer's state read and its commit attempt.
    The losing write is NEVER half-applied — a lost version stays
    committed-but-unpointed (pinnable, never LATEST); a lost DML
    batch is never committed. The remedy is in the message: re-read
    the table state and retry (blind ops) or re-decide (conditional
    DML — the decisions were made against a state that no longer
    exists)."""


def stage_checkpoint(df: DataFrame, path: str) -> DataFrame:
    """Materialize a pipeline stage to parquet and re-read it — the
    reference's manual lineage cut (write CSV, immediately re-read,
    ``apps/process_reviews.py:118,129-131``) done right: parquet keeps
    types (the reference's CSV round-trip re-inferred and silently
    changed them, SURVEY §7.4), and the returned frame's lineage starts
    at the files, so retries and downstream plans don't re-run the
    expensive upstream (NLP-ish) stages."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        write_parquet,
    )

    write_parquet(df, path)
    return df.sparkSession.read.parquet(path)


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    writer: Callable[[DataFrame, str], None] | None = None,
) -> dict[str, object]:
    """Write ``df`` and collect quality metrics IN THE SAME JOB via
    ``df.observe`` — returns {metric_name: value} after the write
    commits.

    The 100 TB point: every post-hoc check (``count()``, a null scan,
    a min/max probe) is a second full pass over data that was just
    streamed through the sink. ``observe`` attaches aggregate
    expressions to the write's own plan — the executors fold them as
    rows flow by, and the observation arrives with the job — so row
    counts / null counts / bounds cost zero extra scans. Gate on the
    returned dict (e.g. raise before ``atomic_publish`` swaps) instead
    of re-reading the output.

    ``metrics`` values must be aggregate expressions
    (``F.count(F.lit(1))``, ``F.sum(...)``, ``F.max(...)`` …)."""
    from pyspark.sql import Observation

    if writer is None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
            write_parquet,
        )

        writer = write_parquet
    obs = Observation("observed_write")
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    writer(observed, path)
    got = obs.get
    return {n: got[n] for n in names}


def model_exists(path: str) -> bool:
    """True if the output prefix already holds a committed dataset
    (Spark writes ``_SUCCESS`` on commit; a bare directory without it
    is a torn write and does NOT count)."""
    p = Path(path)
    return p.exists() and (p / "_SUCCESS").exists()


def idempotent_write(
    df: DataFrame,
    path: str,
    writer: Callable[[DataFrame, str], None] | None = None,
    force: bool = False,
) -> bool:
    """Write ``df`` to ``path`` unless a committed output already
    exists (S11 create-if-absent). Returns True if a write happened.
    ``writer`` defaults to an overwrite parquet sink."""
    if model_exists(path) and not force:
        return False
    if writer is None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
            write_parquet,
        )

        writer = write_parquet
    writer(df, path)
    return True


def atomic_publish(
    df: DataFrame,
    final_path: str,
    validate: Callable[[str], bool] | None = None,
    writer: Callable[[DataFrame, str], None] | None = None,
) -> None:
    """S12 — staged publish: write to ``<final>__staging``, validate
    the staged copy, then swap it into place and drop the old version.
    Raises (leaving the previous published model intact) if validation
    fails — the reference's update_dim_model semantics.

    Caveat (same as the reference's delete-and-copy): a DataFrame
    handle opened on ``final_path`` *before* a publish points at
    renamed/deleted files afterwards — re-read after publishing. On an
    object store, replace the renames with a manifest/pointer swap to
    make the cutover atomic for concurrent readers.

    The swap also invalidates the session's cached file listing for
    ``final_path`` (``refreshByPath``): Spark's shared FileStatusCache
    otherwise serves the PRE-swap file list to the next
    ``spark.read.parquet(final_path)`` and the scan fails on deleted
    part files — exactly the trap a republish-then-reread pipeline
    (e.g. the incremental-ingest example) hits on its second period.
    """
    if writer is None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
            write_parquet,
        )

        writer = write_parquet
    staging = f"{final_path}__staging"
    shutil.rmtree(staging, ignore_errors=True)
    writer(df, staging)
    if not model_exists(staging):
        raise RuntimeError(f"staged write produced no committed output: {staging}")
    if validate is not None and not validate(staging):
        raise RuntimeError(f"staged model failed validation: {staging}")
    backup = f"{final_path}__old"
    shutil.rmtree(backup, ignore_errors=True)
    if Path(final_path).exists():
        Path(final_path).rename(backup)
    Path(staging).rename(final_path)
    shutil.rmtree(backup, ignore_errors=True)
    df.sparkSession.catalog.refreshByPath(final_path)


def versioned_publish(
    df: DataFrame,
    root: str,
    keep: int = 3,
    writer: Callable[[DataFrame, str], None] | None = None,
) -> int:
    """Monotone versioned publish with an atomic pointer — the
    object-store-safe upgrade of :func:`atomic_publish`'s
    rename-swap. Data lands in ``root/v=N`` (N = last published + 1);
    the one-line ``root/LATEST`` pointer file then flips via an
    atomic rename. Returns N.

    Why this shape at scale: a delete-and-rename swap has a window
    where a concurrent reader's resolved file list points at removed
    files (and object stores don't even have atomic directory
    renames). Here old versions stay intact until pruned, so an
    in-flight job that resolved ``v=K`` keeps reading ``v=K``
    regardless of publishes; only the pointer — one small file with
    an atomic replace — ever changes. Rollback is a pointer rewrite
    (:func:`rollback_version`); the ``keep`` newest versions survive
    pruning, and the pointed-at version is never pruned.

    All version discovery and pointer IO routes through the Hadoop
    FileSystem API resolved from the session (``sources.fsutil``), so
    ``root`` genuinely may live on the object store the data writers
    target — driver-local ``pathlib`` would silently read the wrong
    filesystem there."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    if writer is None:
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
            write_parquet,
        )

        writer = write_parquet
    spark = df.sparkSession
    root = root.rstrip("/")
    fsutil.mkdirs(spark, root)
    versions = sorted(
        int(name.split("=", 1)[1])
        for name in fsutil.list_subdirs(spark, root, "v=*")
        if fsutil.is_committed(spark, f"{root}/{name}")
    )
    n = (versions[-1] + 1) if versions else 1
    writer(df, f"{root}/v={n}")
    if not fsutil.is_committed(spark, f"{root}/v={n}"):
        raise RuntimeError(f"versioned write produced no committed output: v={n}")
    fsutil.write_text_atomic(spark, f"{root}/LATEST", str(n))
    pointed = read_version_pointer(root, spark)
    for old in versions[: max(0, len(versions) - (keep - 1))]:
        if old != pointed:
            fsutil.delete(spark, f"{root}/v={old}")
    return n


def _spark_or_active(spark):
    if spark is not None:
        return spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        raise RuntimeError(
            "no active SparkSession: pass spark= explicitly (the version "
            "pointer resolves through the session's Hadoop filesystem)"
        )
    return active


def read_version_pointer(root: str, spark=None) -> int:
    """The currently-published version number (raises if never
    published). Pointer IO goes through the Hadoop FileSystem API, so
    ``root`` may live on any store the session can reach (s3a://,
    hdfs://, file://, plain local paths); defaults to the active
    session."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    spark = _spark_or_active(spark)
    return int(fsutil.read_text(spark, f"{root.rstrip('/')}/LATEST").strip())


def read_latest(spark, root: str) -> DataFrame:
    """Read the pointed-at version. The returned frame resolves its
    file list under ``root/v=N`` — later publishes don't disturb it
    (versions are immutable once written)."""
    return spark.read.parquet(f"{root}/v={read_version_pointer(root, spark)}")


def rollback_version(root: str, to_version: int, spark=None) -> None:
    """Flip the pointer back to an existing version (atomic, no data
    movement). Raises if that version is gone (pruned)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    spark = _spark_or_active(spark)
    root = root.rstrip("/")
    if not fsutil.is_committed(spark, f"{root}/v={to_version}"):
        raise RuntimeError(f"cannot roll back: no committed v={to_version}")
    fsutil.write_text_atomic(spark, f"{root}/LATEST", str(to_version))
