"""Mergeable histogram ledgers: split-merge must equal the direct
build bit-for-bit (counts are exact integers), merge must be
order-independent and associative, quantiles must bound the exact
percentile within one bin width, and nulls must be counted aside
without polluting bins."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
    histogram_ledger,
    ledger_quantiles,
    merge_histogram_ledgers,
)
from tests.conftest import SF_DIR

LO, HI, NB = 1000.0, 500000.0, 40


def _orders(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (o,) = load(spark, SF_DIR, "orders")
    return o.select("o_orderkey", "o_orderpriority", "o_totalprice")


def _rows(df):
    return sorted(
        (r.o_orderpriority, tuple(r.bins), r.n_rows, r.n_null, r.vmin, r.vmax)
        for r in df.collect()
    )


def test_split_merge_equals_direct_build_bit_exact(spark):
    o = _orders(spark)
    direct = histogram_ledger(o, ["o_orderpriority"], "o_totalprice", LO, HI, NB)
    halves = [
        histogram_ledger(
            o.filter(f"o_orderkey % 2 = {p}"),
            ["o_orderpriority"],
            "o_totalprice",
            LO,
            HI,
            NB,
        )
        for p in (0, 1)
    ]
    merged = merge_histogram_ledgers(halves, ["o_orderpriority"])
    assert _rows(merged) == _rows(direct)


def test_merge_is_order_independent_and_associative(spark):
    o = _orders(spark)
    thirds = [
        histogram_ledger(
            o.filter(f"o_orderkey % 3 = {p}"),
            ["o_orderpriority"],
            "o_totalprice",
            LO,
            HI,
            NB,
        )
        for p in (0, 1, 2)
    ]
    a = merge_histogram_ledgers(thirds, ["o_orderpriority"])
    b = merge_histogram_ledgers(list(reversed(thirds)), ["o_orderpriority"])
    c = merge_histogram_ledgers(
        [merge_histogram_ledgers(thirds[:2], ["o_orderpriority"]), thirds[2]],
        ["o_orderpriority"],
    )
    ra, rb, rc = (_rows(x) for x in (a, b, c))
    assert ra == rb == rc


def test_quantiles_within_one_bin_width_of_exact(spark):
    o = _orders(spark)
    led = histogram_ledger(o, ["o_orderpriority"], "o_totalprice", LO, HI, NB)
    qs = [0.25, 0.5, 0.95]
    got = {
        r.o_orderpriority: (r.q25, r.q50, r.q95)
        for r in ledger_quantiles(led, ["o_orderpriority"], LO, HI, qs).collect()
    }
    exact = {
        r.o_orderpriority: (r.p25, r.p50, r.p95)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    width = (HI - LO) / NB
    assert set(got) == set(exact)
    for g in got:
        for approx, true in zip(got[g], exact[g]):
            assert abs(approx - true) <= width, (g, approx, true)


def test_quantile_is_exact_on_bin_aligned_uniform_data(spark):
    # 0..999 repeated, bins of width 25 over [0, 1000): the histogram
    # quantile's interpolation reconstructs the uniform distribution
    # exactly at every requested rank.
    df = spark.range(0, 4000).select(
        F.lit("g").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    led = histogram_ledger(df, ["g"], "v", 0.0, 1000.0, 40)
    row = ledger_quantiles(led, ["g"], 0.0, 1000.0, [0.5, 0.95]).collect()[0]
    assert row.q50 == 500.0
    assert row.q95 == 950.0


def test_nulls_counted_aside_and_min_max_survive_merge(spark):
    half_a = spark.createDataFrame(
        [("a", 5.0), ("a", None)], "g string, v double"
    )
    half_b = spark.createDataFrame(
        [("a", 95.0), ("a", None), ("a", 50.0)], "g string, v double"
    )
    halves = [
        histogram_ledger(h, ["g"], "v", 0.0, 100.0, 10)
        for h in (half_a, half_b)
    ]
    merged = merge_histogram_ledgers(halves, ["g"]).collect()[0]
    assert merged.n_rows == 3
    assert merged.n_null == 2
    assert merged.vmin == 5.0
    assert merged.vmax == 95.0
    assert sum(merged.bins) == 3


def test_out_of_range_values_clamp_to_edge_bins(spark):
    df = spark.createDataFrame(
        [("a", -50.0), ("a", 9999.0), ("a", 50.0)], "g string, v double"
    )
    led = histogram_ledger(df, ["g"], "v", 0.0, 100.0, 10).collect()[0]
    assert led.bins[0] == 1  # -50 clamped low
    assert led.bins[9] == 1  # 9999 clamped high
    assert led.bins[5] == 1  # 50 in its natural bin


def test_daily_ledgers_fold_to_weekly_without_rescan(spark):
    """The windowed-quantile serving claim (e_windowed_quantiles):
    quantiles for a COARSER window served by folding the finer
    ledger rows must equal a direct build at the coarser grain —
    merging is associative over the anchored bins, so rollups never
    rescan the raw events."""
    import datetime as dt

    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
        histogram_ledger,
        ledger_quantiles,
        merge_histogram_ledgers,
    )

    rows = [
        (dt.date(2024, 1, 1 + (i % 14)), "t%d" % (i % 2), float(i % 97))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "day date, typ string, v double")
    wk = F.weekofyear("day").alias("week")

    daily = histogram_ledger(df, ["day", "typ"], "v", 0.0, 100.0, 20)
    weekly_folded = merge_histogram_ledgers(
        [daily.withColumn("week", wk)], ["week", "typ"]
    )
    weekly_direct = histogram_ledger(
        df.withColumn("week", wk), ["week", "typ"], "v", 0.0, 100.0, 20
    )
    got = sorted(map(tuple, ledger_quantiles(
        weekly_folded, ["week", "typ"], 0.0, 100.0, [0.5, 0.95]).collect()))
    want = sorted(map(tuple, ledger_quantiles(
        weekly_direct, ["week", "typ"], 0.0, 100.0, [0.5, 0.95]).collect()))
    assert got == want
    assert len(got) == 4  # 2 ISO weeks (Jan 1 2024 is a Monday) x 2 types
