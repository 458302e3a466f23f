"""Readers and writers (SURVEY.md §2.1, S1-S10).

Every reference ingest/egress shape, rebuilt Catalyst-native:

- S1  CSV with a complex dialect (``;`` separator, quoted multiline
      fields, ``"`` escape) — reference ``apps/preprocess_data.py:84``
- S2  glob/wildcard multi-file scans — ``apps/preprocess_data.py:31-35``
- S3  fixed-width text with junk headers — the reference does this
      with an RDD of Python lambdas (``apps/preprocess_data.py:
      120-127``, control boundary #4 in SURVEY §3); here it is
      ``spark.read.text`` + column expressions, so rows never leave
      the JVM
- S5  in-memory literal dimension tables — ``:142-145``
- S6  provenance columns derived from the input file path — ``:101``
- S7/8 (partitioned) parquet sinks — ``:95-117``
- S9  quoted CSV sink — ``apps/process_listings_hosts.py:127``
- S10 warehouse DDL + load — the Redshift CREATE/COPY layer
      (``airbnb-etl-airflow.py:364-482``) collapsed into Spark SQL
      managed tables
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_dialect(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    multiline: bool = True,
    schema: str | None = None,
) -> DataFrame:
    """S1/S2 — CSV scan handling the reference's hardest dialect:
    custom separator, quoted fields containing newlines, ``"`` escape,
    leading-whitespace tolerance. ``path`` may be a glob. Explicit
    ``schema`` is the contract (SURVEY §1.3); inference is the opt-in
    ingest mode when schema is None.

    Scale note: ``multiLine=True`` makes CSV files unsplittable (one
    task per file) — fine for ingest, wrong for fact tables; convert
    to parquet immediately (the reference does the same).
    """
    reader = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("multiLine", multiline)
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", True)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv_with_rejects(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
) -> DataFrame:
    """S1 variant with malformed-row capture: PERMISSIVE mode parses
    what it can and lands unparseable source lines in a
    ``_corrupt_record`` column instead of failing the job — the ingest
    posture for dirty landing zones at scale (quarantine + continue,
    never abort a 100 TB load for one bad line). Filter
    ``_corrupt_record IS NOT NULL`` for the reject stream.

    Note: Spark disallows queries that reference ONLY the corrupt
    column on a raw CSV scan — ``cache()`` (or checkpoint) the frame
    before splitting it into good/reject streams."""
    full_schema = f"{schema}, _corrupt_record string"
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full_schema)
        .csv(path)
    )


def read_delimited_text(
    spark: SparkSession,
    path: str,
    field_names: list[str],
    n_fields: int | None = None,
    header_token: str | None = None,
    sep: str = ",",
) -> DataFrame:
    """S3 — fixed-field text records with multiline junk headers (the
    ECA&D weather files). The reference's RDD pipeline
    (``sc.textFile → .map(replace/split) → .filter``) re-expressed as
    pure column operations: strip spaces, split, keep rows with the
    right arity whose first field isn't the repeated header token.

    No Python workers involved — at 100 TB this stays inside
    whole-stage codegen instead of round-tripping every line through
    a Python process (SURVEY §3 boundary #4, the expensive one).
    """
    n = n_fields or len(field_names)
    lines = spark.read.text(path)
    fields = F.split(F.regexp_replace(F.col("value"), " ", ""), sep)
    out = (
        lines.select(fields.alias("f"))
        .filter(F.size("f") == n)
    )
    if header_token is not None:
        out = out.filter(F.col("f")[0] != header_token)
    return out.select(
        *[F.col("f")[i].alias(name) for i, name in enumerate(field_names)]
    )


def _sql_literal(v) -> str:
    """Render a Python value as a Spark SQL literal (str/bool/int/
    float/None/list). Floats use repr (shortest exact round-trip)
    with the ``D`` suffix / DOUBLE cast so they parse as DOUBLE, not
    DECIMAL; strings double single quotes (safe under
    escapedStringLiterals — no backslash escapes emitted)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        r = repr(v)
        return f"{r}D" if "e" not in r and "E" not in r else f"CAST({r} AS DOUBLE)"
    if isinstance(v, (list, tuple)):
        return f"array({', '.join(_sql_literal(x) for x in v)})"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"literal_table: unsupported literal type {type(v)!r}")


def literal_table(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """S5 — tiny in-memory dimension (the 4-row station→city lookup,
    ``apps/preprocess_data.py:142-145``). Broadcast-join fodder.

    Built as a SQL ``VALUES`` LocalRelation, not ``createDataFrame``
    (round 13): parallelizing a handful of driver rows creates an RDD
    with ``defaultParallelism`` slices, so every action on the frame
    launched a 32-task stage whose tasks each spin a Python worker to
    unpickle (almost always) zero rows — measured at ~0.3-1.8 s of
    pure overhead per query run (guide §4: the Python boundary you
    don't need is the cheapest one to remove). A LocalRelation lives
    in the JVM plan itself: zero tasks, zero Python, and Catalyst
    folds it straight into broadcast joins."""
    from pyspark.sql.types import _parse_datatype_string

    fields = _parse_datatype_string(schema).fields
    if not rows:
        return spark.createDataFrame(rows, schema=schema)
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    names = ", ".join(f.name for f in fields)
    casts = ", ".join(
        f"CAST({f.name} AS {f.dataType.simpleString()}) AS {f.name}"
        for f in fields
    )
    return spark.sql(f"SELECT {casts} FROM (VALUES {values}) AS t({names})")


def with_path_segment(
    df: DataFrame, col_name: str, index: int = -3
) -> DataFrame:
    """S6 — provenance column from the input file path:
    ``element_at(split(input_file_name(), '/'), index)`` (the
    reference derives ``city`` from ``.../cities/<city>/<month>/...``,
    ``apps/preprocess_data.py:101``)."""
    return df.withColumn(
        col_name, F.element_at(F.split(F.input_file_name(), "/"), index)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S7/S8 — (optionally partitioned) parquet sink. The partition
    layout IS the pruning index (reference partitions by
    scrape_year/scrape_month so each monthly backfill touches one
    slice — ``apps/preprocess_data.py:95-97``)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9 — quoted, headered CSV export (the reference's warehouse
    hand-off format, ``apps/process_listings_hosts.py:127``; in the
    rebuild CSV is an optional export sink only — parquet is the
    model format, SURVEY §1.2)."""
    df.write.mode(mode).option("header", True).option("escape", '"').csv(path)


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: rows hash-partitioned into ``n_buckets``
    files by ``bucket_col`` at write time. Two tables bucketed the same
    way join WITHOUT a shuffle — the pre-paid co-location strategy for
    repeatedly-joined 100 TB facts (see test_layout for the plan
    proof). Optionally sorted within buckets for sort-merge reuse."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(Path(warehouse) / table.lower(), ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """Parquet scan across a long-lived table's schema GENERATIONS —
    the three evolution cases a 100 TB dataset accretes:

    - **column addition** (no args): ``mergeSchema`` unions every
      footer's schema; files written before a column existed read it
      as null — the read-side analog of
      ``operators.relational.align_union``'s write-side alignment.
    - **type widening** (``schema=`` the evolved DDL): files written
      with the narrow type read under the wide one (int→bigint,
      float→double, int→double — the parquet readers' widening
      promotions), so a key that outgrew INT needs no rewrite of old
      files.
    - **column rename** (``renames={old: new}``): both generations'
      columns are scanned (the old name is appended to the read
      schema with the new column's type), coalesced into the new
      name, and the old name dropped — old files keep their bytes,
      new readers see one column.

    Cost note: merging reads every file's footer at planning time —
    fine for a partition's worth of files, noticeable over millions;
    at steady state pin the evolved ``schema`` explicitly (also the
    cheaper path: no footer sweep) and keep the no-arg form for
    schema discovery / backfill."""
    from pyspark.sql.types import StructType

    renames = renames or {}
    if schema is None:
        df = spark.read.option("mergeSchema", "true").parquet(path)
        target_fields = None
    else:
        st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
        target_fields = list(st.fields)
        by_name = {f.name: f for f in target_fields}
        read_st = StructType(list(target_fields))
        for old, new in renames.items():
            if new in by_name and old not in read_st.fieldNames():
                # scan the pre-rename column under the evolved type
                read_st.add(old, by_name[new].dataType, True)
        df = spark.read.schema(read_st).parquet(path)
    for old, new in renames.items():
        if old in df.columns and new in df.columns:
            df = df.withColumn(
                new, F.coalesce(F.col(new), F.col(old))
            ).drop(old)
        elif old in df.columns:
            df = df.withColumnRenamed(old, new)
    if target_fields is not None:
        df = df.select(*[f.name for f in target_fields])
    return df


def read_json(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines source (surface extension; the reference has no JSON
    I/O — SURVEY §2.8). Explicit schema avoids the double-scan
    inference pass; ``path`` may be a glob."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink."""
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (surface extension): the other columnar format a
    warehouse hand-off commonly arrives in — same pushdown/pruning
    behavior as parquet (vectorized reader, PushedFilters), zero extra
    dependencies (ORC support is built into Spark)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink, optionally partitioned (mirror of ``write_parquet``)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_output(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    total_rows: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Small-files-safe parquet publish: coalesce the final write to
    ``ceil(total_rows / target_rows_per_file)`` files instead of one
    file per shuffle partition. At 100 TB the small-files problem is
    the sink-side killer (a 32k-partition shuffle writing a 5-row dim
    emits 32k files; every later scan pays per-file open cost).

    ``total_rows`` defaults to a ``df.count()`` — pass it when the
    caller already knows the cardinality to keep the plan
    single-pass. Uses ``coalesce`` (narrow, no shuffle) so upstream
    parallelism is preserved until the write stage."""
    n = total_rows if total_rows is not None else df.count()
    files = max(1, -(-n // max(1, target_rows_per_file)))
    writer = df.coalesce(files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def create_warehouse_table(
    spark: SparkSession, df: DataFrame, table: str, mode: str = "overwrite"
) -> None:
    """S10 — the Redshift CREATE TABLE + COPY layer collapsed into one
    Spark SQL managed-table write (``saveAsTable``); downstream
    analytical SQL runs against the session catalog exactly as the
    reference's notebook SQL ran against Redshift (SURVEY §3 entry
    point 3 → entry point 2).

    Mirrors the reference's ``DROP TABLE IF EXISTS`` + CREATE
    (``airbnb-etl-airflow.py:351-361``), including clearing an orphaned
    managed location left by a previous session (Spark refuses to
    create a managed table over an existing directory)."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(Path(warehouse) / table.lower(), ignore_errors=True)
    df.write.mode(mode).format("parquet").saveAsTable(table)
