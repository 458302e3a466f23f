"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's
"guests visiting >1 city" two-level aggregation,
``redshift-etl-notebook.ipynb`` cell 51) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the engine package importable no matter where this module is
# loaded from (the driver may exec this file from another CWD).
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session profile to a driver-provided session
    (the driver builds its own SparkSession, so set dynamic confs here;
    see airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session
    for the full factory)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Policy for the testdata's TIMESTAMP(NANOS) events.ts column
    # (mirrors session.get_spark; see plans.catalog._read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES

    return QUERIES["a_nested_histogram"](_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for the rows-only
    operators: MinHash/SimHash signatures, hyperplane LSH)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import ORACLES

    return dict(ORACLES)
