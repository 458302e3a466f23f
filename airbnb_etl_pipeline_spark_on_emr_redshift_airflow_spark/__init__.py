"""PySpark-native analytics engine with the query and data-processing
capabilities of jirfig/Airbnb-ETL-pipeline-Spark-on-EMR-Redshift-Airflow.

Brand-new, Spark-first rebuild: the logical plans are declared with the
DataFrame / Spark SQL API and Catalyst + Tungsten pick the physical
strategy.  No custom execution machinery — the value here is the operator
surface (SURVEY.md §2), the pipeline semantics (idempotent gated stages,
atomic publish, incremental merge), and large-scale training-data
operators (dedup, similarity search, text analysis) layered on top.

Package layout
--------------
- ``session``    SparkSession factory with the scale-tuned config profile
- ``sources``    readers/writers: CSV dialects, header-skipping text,
                 partitioned parquet, literal dims, gated/atomic writes
- ``operators``  relational / join / aggregate / window / dedup /
                 similarity operators
- ``functions``  scalar column expressions: text classifiers, JSON, keys
- ``plans``      the oracle-checked analytical query catalog
- ``streaming``  Structured Streaming pipelines + batch-checkable analogs
- ``pipeline``   dependency-ordered stage runner with quality gates
"""

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import get_spark

__all__ = ["get_spark"]
