"""Oracle-checked analytical query catalog.

Importing this package registers every query module into
``catalog.QUERIES`` / ``catalog.ORACLES`` (see ``catalog.register``).

Registration order = driver evaluation order, so the reference-core
families (aggregates, windows, text, joins, relational) register
before the extension families — and the whole catalog is kept at ≤50
entries so every query gets a driver correctness row (the round-1
driver recorded only the first 50).
"""

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import (  # noqa: F401
    aggregates,
    windows,
    text,
    joins,
    relational,
    events,
    dedup,
    similarity,
    multimodal,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]
