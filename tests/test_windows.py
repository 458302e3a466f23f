"""Unit tests: latest-per-key (reference W1/W2 semantics) and moving
frames — including the F.last ↔ row_number equivalence SURVEY §7.4
flags as needing explicit proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
    latest_per_key,
    latest_per_key_rn,
    moving_agg,
)

# FIXTURES.md B2: same id at two last_scraped dates.
ROWS = [
    (1, "2021-01-01", "old"),
    (1, "2021-02-01", "new"),
    (2, "2021-01-15", "only"),
    (3, "2021-03-01", "dup_a"),
    (3, "2021-03-01", "dup_b"),  # tie on the order key
]
SCHEMA = "listing_id int, last_scraped string, payload string"


def test_latest_per_key_reference_semantics(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = latest_per_key(df, ["listing_id"], ["last_scraped"])
    got = {r.listing_id: r.payload for r in out.collect()}
    assert got[1] == "new"
    assert got[2] == "only"
    assert got[3] in {"dup_a", "dup_b"}  # arbitrary among exact ties
    assert out.count() == 3


def test_latest_rn_equals_last_filter_when_order_unique(spark):
    """The two implementations must agree whenever the order key is
    unique per partition (SURVEY §7.4)."""
    df = spark.createDataFrame(
        [r for r in ROWS if r[2] != "dup_b"], SCHEMA
    )
    a = latest_per_key(df, ["listing_id"], ["last_scraped"])
    b = latest_per_key_rn(df, ["listing_id"], ["last_scraped"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_moving_agg_frame_bounds(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 6)], "k string, i int, v double"
    )
    out = moving_agg(
        df, ["k"], ["i"], preceding=2, aggs={"mv": F.sum("v")}
    ).orderBy("i")
    got = [r.mv for r in out.collect()]
    # ROWS 2 PRECEDING..CURRENT over 1..5
    assert got == [1.0, 3.0, 6.0, 9.0, 12.0]


def test_scd2_versions_intervals(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
        scd2_versions,
    )

    hist = spark.createDataFrame(
        [(1, "2021-01-01", "v1"), (1, "2021-03-01", "v2"), (2, "2021-02-01", "only")],
        "k int, changed string, attr string",
    )
    out = {(r.k, r.attr): (r.valid_from, r.valid_to, r.is_current)
           for r in scd2_versions(hist, ["k"], "changed").collect()}
    assert out[(1, "v1")] == ("2021-01-01", "2021-03-01", False)
    assert out[(1, "v2")] == ("2021-03-01", None, True)
    assert out[(2, "only")] == ("2021-02-01", None, True)


def test_global_distribution_ranks_matches_window(spark):
    """The range-partitioned global rank must reproduce the
    single-partition window form exactly (unique total order)."""
    from pyspark.sql import Window

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
        global_distribution_ranks,
    )
    from tests.conftest import SF_DIR

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    expected = {
        r.c_custkey: (r.q, r.pr, r.cd)
        for r in cust.select(
            "c_custkey",
            F.ntile(4).over(w).alias("q"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    got = {
        r.c_custkey: (r.quartile, r.pct_rank, r.cdist)
        for r in global_distribution_ranks(
            cust, "c_acctbal", ["c_custkey"], n_tiles=4, n_buckets=8
        ).collect()
    }
    assert got.keys() == expected.keys()
    for k, (q, pr, cd) in expected.items():
        gq, gpr, gcd = got[k]
        assert gq == q, (k, gq, q)
        assert abs(gpr - pr) < 1e-12
        assert abs(gcd - cd) < 1e-12
