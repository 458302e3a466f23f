"""Unit tests: projection/normalization/union operators (P*, U*, A9).

Micro-fixtures follow FIXTURES.md §B5: schema-drift variants with
spaced/capitalized names exercising normalization and
union-by-name semantics (the SURVEY §7.4 hard part)."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    align_union,
    exact_dedup,
    normalize_columns,
    with_typed_nulls,
)


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, "x")], ["Host Id", "Host Name"])
    assert normalize_columns(df).columns == ["host_id", "host_name"]


def test_with_typed_nulls_types(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = with_typed_nulls(df, {"price": "double", "note": "string"})
    fields = dict(out.dtypes)
    assert fields["price"] == "double"
    assert fields["note"] == "string"
    row = out.collect()[0]
    assert row.price is None and row.note is None


def test_align_union_schema_drift(spark):
    """Positional union would misalign these; by-name must not."""
    a = spark.createDataFrame([(1, "amsterdam")], "id int, city string")
    b = spark.createDataFrame([("berlin", 2, 9.5)], "city string, id int, price double")
    out = align_union(a, b)
    rows = {r.id: (r.city, r.price) for r in out.collect()}
    assert rows[1] == ("amsterdam", None)
    assert rows[2] == ("berlin", 9.5)
    assert dict(out.dtypes)["price"] == "double"


def test_exact_dedup_keeps_one_per_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "listing_id int, payload string"
    )
    out = exact_dedup(df, ["listing_id"])
    assert out.count() == 2
    assert {r.listing_id for r in out.collect()} == {1, 2}


def test_grouped_pandas_zscore_matches_window_form(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.grouped_pandas import (
        zscore_per_group,
    )
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    pandas_z = {
        (r.o_custkey, r.o_totalprice): r.zscore
        for r in zscore_per_group(orders, "o_custkey", "o_totalprice").collect()
    }
    w = Window.partitionBy("o_custkey")
    window_z = {
        (r.o_custkey, r.o_totalprice): r.z
        for r in orders.select(
            "o_custkey",
            "o_totalprice",
            (
                (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
                / F.stddev_pop("o_totalprice").over(w)
            ).alias("z"),
        ).collect()
    }
    assert pandas_z.keys() == window_z.keys()
    assert all(abs(pandas_z[k] - window_z[k]) < 1e-9 for k in pandas_z)


def test_grouped_pandas_zscore_matches_catalog_query(spark):
    """The oracle-checked catalog form (exact fixed-point moment sums)
    must agree with the applyInPandas operator to 1e-6 — the 4-dp
    quantization of x and x² shifts mu/sigma by ~1e-4 absolute, which
    at sigma ~1e4 is ~1e-8 on z."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.grouped_pandas import (
        zscore_per_group,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    pandas_z = {
        (r.o_custkey, r.o_totalprice): r.zscore
        for r in zscore_per_group(orders, "o_custkey", "o_totalprice").collect()
    }
    catalog_z = {
        (r.o_custkey, r.o_totalprice): r.zscore
        for r in QUERIES["a_grouped_pandas_zscore"](spark, SF_DIR).collect()
    }
    assert pandas_z.keys() == catalog_z.keys()
    assert all(abs(pandas_z[k] - catalog_z[k]) < 1e-6 for k in pandas_z)
