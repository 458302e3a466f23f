"""Oracle-checked analytical query catalog.

Importing this package registers every query module into
``catalog.QUERIES`` / ``catalog.ORACLES`` (see ``catalog.register``).
"""

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import (  # noqa: F401
    aggregates,
    dedup,
    events,
    joins,
    multimodal,
    relational,
    similarity,
    text,
    windows,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]
