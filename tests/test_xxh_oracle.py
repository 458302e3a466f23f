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
    xxhash64_str_sql,
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


def test_xxhash64_string_bit_exact_vs_spark(spark):
    """Variable-length (StringType) xxhash64: every XXH64 path — the
    4-lane 32-byte blocks, 8-byte words, the optional 4-byte word,
    the byte tail — across length boundaries and multi-byte UTF-8."""
    import random
    import string as _string

    random.seed(9)
    vals = [
        "hello", "", "a", "é漢字unicode", "exactly8", "exactly4",
        "abcdefghijklmnopqrstuvwxyz012345MORE_than_32_bytes_here_yes",
    ] + [
        "".join(random.choices(_string.ascii_letters + " 0123456789", k=k))
        for k in [3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 39, 40, 41,
                  63, 64, 65, 100]
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    want = {
        r["t"]: r["h"]
        for r in df.select("t", F.xxhash64(F.col("t")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v(t VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(x,) for x in vals])
    got = dict(
        con.execute(xxhash64_str_sql("SELECT t FROM v", "t", "h")).fetchall()
    )
    assert got == want
