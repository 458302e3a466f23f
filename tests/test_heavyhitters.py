"""Heavy-hitters ledgers: build exactness, presence guarantee, merge
bound soundness (lb <= true <= ub), nested-merge soundness, and
determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
    heavyhitters_ledger,
    ledger_topk,
    ledger_topk_bounds,
    merge_heavyhitters_ledgers,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: item = user % (1 + user % 23) folds many users onto
    # small ids -> genuine heavy hitters plus a long tail; two groups
    rows = [
        (i, "g%d" % (i % 2), (i * 7919) % (1 + (i * 7919) % 23))
        for i in range(4000)
    ]
    return spark.createDataFrame(rows, "row_id bigint, grp string, item bigint")


def _exact(df):
    return {
        (r["grp"], r["item"]): r["c"]
        for r in df.groupBy("grp", "item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    }


def test_build_exact_when_k_covers_all(spark, skewed):
    led = heavyhitters_ledger(skewed, ["grp"], "item", k=100)
    rows = ledger_topk(led, ["grp"]).collect()
    exact = _exact(skewed)
    assert {(r["grp"], r["item"]): r["cnt"] for r in rows} == exact
    for r in led.collect():
        assert r["other_max"] == 0 and r["other_mass"] == 0
        assert r["n_rows"] == sum(
            c for (g, _), c in exact.items() if g == r["grp"]
        )


def test_build_presence_guarantee_and_exact_top(spark, skewed):
    k = 5
    led = heavyhitters_ledger(skewed, ["grp"], "item", k=k)
    exact = _exact(skewed)
    tops = {
        (r["grp"], r["item"]): r["cnt"]
        for r in ledger_topk(led, ["grp"]).collect()
    }
    omax = {r["grp"]: r["other_max"] for r in led.collect()}
    # kept counts are exact; any item with true > other_max is kept
    for key, cnt in tops.items():
        assert cnt == exact[key]
    for (g, item), cnt in exact.items():
        if cnt > omax[g]:
            assert (g, item) in tops


def test_merge_bounds_sound(spark, skewed):
    k = 5
    parts = [skewed.filter(f"row_id % 3 = {p}") for p in range(3)]
    leds = [heavyhitters_ledger(p, ["grp"], "item", k=k) for p in parts]
    exact = _exact(skewed)
    served = ledger_topk_bounds(leds, ["grp"], k=k).collect()
    assert served, "merge produced no rows"
    for r in served:
        true = exact[(r["grp"], r["item"])]
        assert r["lb"] <= true <= r["ub"], (r, true)
    # presence guarantee on the merged LEDGER form
    merged = merge_heavyhitters_ledgers(leds, ["grp"], k=k)
    tops = {
        (r["grp"], r["item"]) for r in ledger_topk(merged, ["grp"]).collect()
    }
    omax = {r["grp"]: r["other_max"] for r in merged.collect()}
    nrows = {r["grp"]: r["n_rows"] for r in merged.collect()}
    for (g, item), cnt in exact.items():
        if cnt > omax[g]:
            assert (g, item) in tops
    assert nrows == {
        g: sum(c for (gg, _), c in exact.items() if gg == g)
        for g in ("g0", "g1")
    }


def test_nested_merge_stays_sound(spark, skewed):
    k = 5
    parts = [skewed.filter(f"row_id % 4 = {p}") for p in range(4)]
    leds = [heavyhitters_ledger(p, ["grp"], "item", k=k) for p in parts]
    ab = merge_heavyhitters_ledgers(leds[:2], ["grp"], k=k)
    nested = merge_heavyhitters_ledgers([ab] + leds[2:], ["grp"], k=k)
    exact = _exact(skewed)
    omax = {r["grp"]: r["other_max"] for r in nested.collect()}
    tops = {
        (r["grp"], r["item"]): r["cnt"]
        for r in ledger_topk(nested, ["grp"]).collect()
    }
    # nested lb can only be <= true; presence still guaranteed past
    # the (possibly looser) other_max
    for key, cnt in tops.items():
        assert cnt <= exact[key]
    for (g, item), cnt in exact.items():
        if cnt > omax[g]:
            assert (g, item) in tops
    # ub soundness must survive the truncating intermediate merge:
    # the struct's per-item ub field carries the slack an lb-only
    # re-merge would silently drop
    served = ledger_topk_bounds([ab] + leds[2:], ["grp"], k=k).collect()
    for r in served:
        true = exact[(r["grp"], r["item"])]
        assert r["lb"] <= true <= r["ub"], (r, true)


def test_deterministic_under_repartition(spark, skewed):
    k = 7
    a = heavyhitters_ledger(skewed.repartition(13), ["grp"], "item", k=k)
    b = heavyhitters_ledger(skewed.repartition(3, "item"), ["grp"], "item", k=k)
    ra = sorted(map(tuple, ledger_topk(a, ["grp"]).collect()))
    rb = sorted(map(tuple, ledger_topk(b, ["grp"]).collect()))
    assert ra == rb


def test_weighted_build_and_merge_bounds_sound(spark, skewed):
    """Weighted form: cnt = Σ weight per item; build exact, merged
    lb <= true <= ub, presence past other_max — the same algebra the
    unweighted tests pin, over an additive measure."""
    k = 5
    w = skewed.withColumn("wgt", (F.col("row_id") % 17 + 1).cast("bigint"))
    true = {
        (r["grp"], r["item"]): r["s"]
        for r in w.groupBy("grp", "item")
        .agg(F.sum("wgt").cast("bigint").alias("s"))
        .collect()
    }

    # build exactness when k covers everything
    full = heavyhitters_ledger(w, ["grp"], "item", k=100, weight_col="wgt")
    got = {
        (r["grp"], r["item"]): r["cnt"]
        for r in ledger_topk(full, ["grp"]).collect()
    }
    assert got == true

    # split on row parity, merge, check bounds + presence
    leds = [
        heavyhitters_ledger(
            w.filter(f"row_id % 2 = {p}"), ["grp"], "item",
            k=k, weight_col="wgt",
        )
        for p in (0, 1)
    ]
    served = ledger_topk_bounds(leds, ["grp"], k=k).collect()
    assert served
    for r in served:
        t = true[(r["grp"], r["item"])]
        assert r["lb"] <= t <= r["ub"], (r, t)
    merged = merge_heavyhitters_ledgers(leds, ["grp"], k=k)
    omax = {r["grp"]: r["other_max"] for r in merged.collect()}
    in_top = {
        (r["grp"], r["item"]) for r in ledger_topk(merged, ["grp"]).collect()
    }
    for (g, item), t in true.items():
        if t > omax[g]:
            assert (g, item) in in_top, ((g, item), t, omax[g])


def test_weighted_null_weights_coalesce_and_negative_fails(spark):
    """Round-7 ADVICE: an all-NULL-weight item must yield cnt 0 (not
    a NULL that flows through the ledger struct and merge
    arithmetic), and a negative summed weight must fail the job
    loudly (it would silently break lb/ub bound soundness)."""
    import pyspark.sql.utils  # noqa: F401 — exception surface
    import pytest

    rows = [("g", "a", 5), ("g", "a", None), ("g", "b", None)]
    df = spark.createDataFrame(rows, "grp string, item string, wgt long")
    led = heavyhitters_ledger(df, ["grp"], "item", k=4, weight_col="wgt")
    got = {
        r["item"]: r["cnt"] for r in ledger_topk(led, ["grp"]).collect()
    }
    assert got == {"a": 5, "b": 0}

    neg = spark.createDataFrame(
        [("g", "a", 3), ("g", "a", -7)],
        "grp string, item string, wgt long",
    )
    bad = heavyhitters_ledger(neg, ["grp"], "item", k=4, weight_col="wgt")
    with pytest.raises(Exception, match="nonnegative"):
        bad.collect()


def test_ledgers_by_equals_per_filter_build(spark):
    """heavyhitters_ledgers_by (one scan, period as a leading group
    key) ≡ one heavyhitters_ledger call per period filter — weighted
    and unweighted."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        heavyhitters_ledger,
        heavyhitters_ledgers_by,
    )

    df = spark.createDataFrame(
        [
            (g, it, p, w)
            for g in range(2)
            for it in range(9)
            for p in range(3)
            for w in [1 + (g + it + p) % 4]
            for _ in range((g * 7 + it * 3 + p) % 5 + 1)
        ],
        "grp int, item int, period int, w int",
    )
    for wc in (None, "w"):
        by = heavyhitters_ledgers_by(
            df, ["grp"], "item", "period", k=4, weight_col=wc
        )
        per = [
            heavyhitters_ledger(
                df.filter(f"period = {p}"), ["grp"], "item",
                k=4, weight_col=wc,
            )
            for p in range(3)
        ]
        assert len(by) == len(per)
        for a, b in zip(by, per):
            ra = sorted(map(str, a.collect()))
            rb = sorted(map(str, b.collect()))
            assert ra == rb, (wc, ra, rb)


def test_ledgers_by_null_periods_excluded(spark):
    """ADVICE r11: NULL period rows must behave exactly like the
    per-filter build (``period = p`` never matches NULL) rather than
    crashing ``sorted()`` with a ``None`` in the periods list."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        heavyhitters_ledger,
        heavyhitters_ledgers_by,
    )

    df = spark.createDataFrame(
        [(0, 1, 1), (0, 1, 1), (0, 2, 2), (0, 3, None), (0, 3, None)],
        "grp int, item int, period int",
    )
    by = heavyhitters_ledgers_by(df, ["grp"], "item", "period", k=2)
    assert len(by) == 2  # NULL period produces no ledger
    for p, led in zip([1, 2], by):
        ref = heavyhitters_ledger(
            df.filter(F.col("period") == p), ["grp"], "item", k=2
        )
        assert sorted(map(str, led.collect())) == \
            sorted(map(str, ref.collect()))
