"""SparkSession factory.

Distills the reference's cluster tuning (reference
``config/spark-config.json:12-33``: Kryo, explicit executor sizing,
``default.parallelism 10``, MEMORY_AND_DISK_SER) into a modern Spark 3/4
profile: AQE replaces static parallelism tuning, broadcast thresholds and
shuffle-partition counts are explicit, and the session timezone is pinned
to UTC so results are reproducible across engines (the DuckDB oracle is
UTC-naive).

At 100 TB the same profile applies per-executor; only
``spark.sql.shuffle.partitions`` / ``spark.sql.files.maxPartitionBytes``
scale with cluster size, which is why they are parameters here rather
than constants.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airbnb_etl_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's config profile.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``); on a real cluster pass ``yarn`` / ``k8s`` and the same
    SQL-layer settings apply unchanged.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Local mode runs every task in the driver JVM; the 1g default
        # heap starves 32 concurrent task threads. Only effective when
        # this call launches the JVM (harmless on reuse).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # AQE: runtime coalescing + skew-join handling — supersedes the
        # reference's hand-set `spark.default.parallelism 10`.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic cross-engine timestamps (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI-style string literals ('\s' is backslash-s, not an escape)
        # so one generated SQL string parses identically under Spark SQL
        # and DuckDB (the catalog shares classifier SQL between engines).
        .config("spark.sql.parser.escapedStringLiterals", "true")
        # Session-wide policy: parquet TIMESTAMP(NANOS) columns (the
        # testdata's events.ts) read as bigint nanos; plans.catalog._read
        # converts to timestamp via integer div. Set here — visibly — so
        # loading events is not a hidden conf side effect elsewhere.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas_udf / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast joins for dimension tables (reference J3's 4-row dim);
        # 64 MB is safe for the star-schema dims at any tested SF.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Quiet non-interactive runs.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
