"""Mergeable HLL distinct-count ledgers: split-merge must equal the
direct build bit-for-bit, estimates must track exact distincts, and
merge must be order-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
    hll_ledger,
    ledger_estimates,
    merge_hll_ledgers,
)
from tests.conftest import SF_DIR


def _events(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (ev,) = load(spark, SF_DIR, "events")
    return ev.select("event_id", "event_type", "user_id")


def _est_rows(df, keys):
    return sorted(map(tuple, ledger_estimates(df, keys).collect()))


def test_split_merge_equals_direct_build(spark):
    ev = _events(spark)
    direct = hll_ledger(ev, ["event_type"], ["user_id"])
    halves = [
        hll_ledger(ev.filter(f"event_id % 2 = {p}"), ["event_type"], ["user_id"])
        for p in (0, 1)
    ]
    merged = merge_hll_ledgers(halves, ["event_type"])
    assert _est_rows(merged, ["event_type"]) == _est_rows(
        direct, ["event_type"]
    )


def test_merge_is_order_independent_and_associative(spark):
    ev = _events(spark)
    thirds = [
        hll_ledger(ev.filter(f"event_id % 3 = {p}"), ["event_type"], ["user_id"])
        for p in (0, 1, 2)
    ]
    a = merge_hll_ledgers(thirds, ["event_type"])
    b = merge_hll_ledgers(list(reversed(thirds)), ["event_type"])
    # associativity: merge(merge(0,1), 2)
    c = merge_hll_ledgers(
        [merge_hll_ledgers(thirds[:2], ["event_type"]), thirds[2]],
        ["event_type"],
    )
    ra, rb, rc = (_est_rows(x, ["event_type"]) for x in (a, b, c))
    assert ra == rb == rc


def test_estimates_track_exact_distincts_and_rows_are_additive(spark):
    ev = _events(spark)
    led = hll_ledger(ev, ["event_type"], ["user_id"])
    est = {
        r.event_type: (r.n_rows, r.user_id_distinct)
        for r in ledger_estimates(led, ["event_type"]).collect()
    }
    exact = {
        r.event_type: (r.n, r.d)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("d"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for t, (n, d) in exact.items():
        assert est[t][0] == n  # exact additive row count
        # lgK=12 -> ~0.8% standard error; allow 5% + small-count slack
        assert abs(est[t][1] - d) <= max(3, 0.05 * d), (t, est[t][1], d)


def test_overlapping_ledgers_have_set_union_semantics(spark):
    """A re-delivered (duplicated) slice must not inflate the distinct
    estimate — union semantics, the property raw additive counts
    lack."""
    ev = _events(spark)
    led = hll_ledger(ev, ["event_type"], ["user_id"])
    doubled = merge_hll_ledgers([led, led], ["event_type"])
    one = {
        r.event_type: r.user_id_distinct
        for r in ledger_estimates(led, ["event_type"]).collect()
    }
    two = {
        r.event_type: r.user_id_distinct
        for r in ledger_estimates(doubled, ["event_type"]).collect()
    }
    assert one == two  # distinct estimate unchanged by re-delivery


def test_rolling_distinct_matches_direct_window_build(spark):
    """Trailing-3-period rolling distinct from daily ledger rows must
    equal building a sketch over the raw union of those periods."""
    ev = _events(spark).withColumn(
        "period", (F.col("event_id") % 5).cast("int")
    )
    daily = hll_ledger(ev, ["event_type", "period"], ["user_id"])
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        rolling_distinct,
    )

    got = {
        (r.event_type, r.period): (r.rolling_rows, r.user_id_rolling_distinct)
        for r in rolling_distinct(
            daily, ["event_type"], "period", window_rows=3
        ).collect()
    }
    for (et, p), (rows, dist) in got.items():
        lo = max(0, p - 2)
        raw = ev.filter(
            (F.col("event_type") == et)
            & (F.col("period") >= lo)
            & (F.col("period") <= p)
        )
        direct = hll_ledger(raw, ["event_type"], ["user_id"])
        want = ledger_estimates(direct, ["event_type"]).collect()[0]
        assert rows == want.n_rows
        assert dist == want.user_id_distinct, (et, p)


# ----- engine-native register HLL (round 11) -------------------------------


def test_native_hll_split_merge_equals_direct_and_idempotent(spark):
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        hll_register_ledger,
        merge_hll_register_ledgers,
    )

    df = spark.range(0, 30000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 4111).alias("v"),
    )
    direct = hll_register_ledger(df, ["g"], "v", p=8)
    parts = [
        hll_register_ledger(df.filter(f"pmod(v, 3) = {i}"), ["g"], "v", p=8)
        for i in range(3)
    ]
    merged = merge_hll_register_ledgers(parts, ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # idempotent: re-merging a part changes nothing (MAX is a join
    # semilattice — the re-delivery story every ledger wants)
    again = merge_hll_register_ledgers([merged, parts[0]], ["g"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_native_hll_estimate_envelope_across_cardinalities(spark):
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        hll_register_estimates,
        hll_register_ledger,
    )

    for n in (15, 300, 5000, 60000):
        df = spark.range(0, n * 3).select(
            F.lit("g").alias("g"), (F.col("id") % n).alias("v")
        )
        led = hll_register_ledger(df, ["g"], "v", p=10)
        row = hll_register_estimates(led, ["g"], p=10).collect()[0]
        est = row["estimate_fp"] / 1000
        # 1.04/sqrt(1024) ~ 3.25% standard error; allow 4 sigma + abs 3
        assert abs(est - n) <= max(3, 0.13 * n), (n, est)


def test_native_hll_p_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        hll_register_ledger,
    )

    df = spark.range(3).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="out of"):
        hll_register_ledger(df, ["g"], "v", p=2)
