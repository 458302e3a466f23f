"""Sources & sinks: CSV dialects, header-skipping text records,
partitioned parquet, literal dims, gated idempotent writes, atomic
publish, and the Spark-SQL warehouse layer."""
