"""The DuckDB-generated xxHash64 (plans.xxh) is BIT-EXACT against
Spark's F.xxhash64 for the (int literal, long column) chains the
sampling oracles replay — positive, negative, zero, and large
longs, two different literal seed fields."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.xxh import (
    pmod_sql,
    xxhash64_cols_sql,
)

VALUES = [0, 1, 2, 9, -1, -7, 12345678901234, -987654321098765,
          2**62, -(2**62), 2**63 - 1, -(2**63)]


def test_xxhash64_bit_exact_vs_spark(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "x bigint")
    want = {
        r["x"]: (r["h5"], r["h7"])
        for r in df.select(
            "x",
            F.xxhash64(F.lit(5), F.col("x")).alias("h5"),
            F.xxhash64(F.lit(7), F.col("x")).alias("h7"),
        ).collect()
    }
    vals = ", ".join(f"({v})" for v in VALUES)
    q = xxhash64_cols_sql(
        f"SELECT x FROM (VALUES {vals}) t(x)",
        [(5, "x", "h5"), (7, "x", "h7")],
        ["x"],
    )
    got = {x: (h5, h7) for x, h5, h7 in duckdb.sql(q).fetchall()}
    assert got == want


def test_pmod_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "x bigint")
    want = {
        r["x"]: r["p"]
        for r in df.select(
            "x", F.pmod(F.col("x"), F.lit(1_000_000)).alias("p")
        ).collect()
    }
    vals = ", ".join(f"({v})" for v in VALUES)
    got = {
        x: p
        for x, p in duckdb.sql(
            f"SELECT x, {pmod_sql('x', 1_000_000)} AS p "
            f"FROM (VALUES {vals}) t(x)"
        ).fetchall()
    }
    assert got == want
