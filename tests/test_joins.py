"""Unit tests: join operators — anti/semi null behavior, delta-filter
boundary inclusion, incremental merge (the reference's monthly upsert,
FIXTURES.md B1 scenario), as-of tie/no-match semantics, range join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_enrich,
    delta_filter,
    incremental_merge,
    range_join,
    semi_join,
)


def ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_anti_semi_with_nulls(spark):
    left = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    right = spark.createDataFrame([(2,), (None,)], "k int")
    anti = anti_join(left, right, left.k == right.k)
    semi = semi_join(left, right, left.k == right.k)
    # NULL keys never equi-match: they survive the anti join — the
    # behavior the reference's NOT IN subquery would get wrong.
    assert sorted([r.k for r in anti.collect()], key=str) == [1, None]
    assert [r.k for r in semi.collect()] == [2]


def test_left_enrich_unmatched_fk_gets_nulls(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], "id int, fk int")
    dim = spark.createDataFrame([(10, "x")], "fk int, attr string")
    out = broadcast_enrich(fact, dim, "fk")
    got = {r.id: r.attr for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_delta_filter_boundary_is_inclusive(spark):
    """Reference semantics (apps/process_reviews.py:98-105): rows AT
    the previous max are re-selected (over-inclusive; downstream dedup
    cleans up)."""
    state = spark.createDataFrame([("2021-02-01",)], "d string")
    incoming = spark.createDataFrame(
        [("2021-01-31", 1), ("2021-02-01", 2), ("2021-02-02", 3)], "d string, id int"
    )
    out = delta_filter(incoming, state, "d", "d")
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_incremental_merge_newest_survives(spark):
    snapshot = spark.createDataFrame(
        [(1, "2021-01-01", "jan"), (2, "2021-01-01", "jan")],
        "review_id int, date string, body string",
    )
    delta = spark.createDataFrame(
        [(2, "2021-02-01", "feb_fix"), (3, "2021-02-01", "feb_new")],
        "review_id int, date string, body string",
    )
    out = incremental_merge(snapshot, delta, ["review_id"], ["date", "body"])
    got = {r.review_id: r.body for r in out.collect()}
    assert got == {1: "jan", 2: "feb_fix", 3: "feb_new"}


def test_asof_join_matches_most_recent_and_ties(spark):
    clicks = spark.createDataFrame(
        [(1, 100, ts("2024-01-01T10:00:00")), (2, 100, ts("2024-01-01T12:00:00")),
         (3, 200, ts("2024-01-01T09:00:00"))],
        "event_id int, user_id int, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [(100, ts("2024-01-01T10:00:00"), 5.0),   # tie with click 1 → matches
         (100, ts("2024-01-01T11:30:00"), 7.0)],  # latest before click 2
        "user_id int, ts timestamp, value double",
    ).select(
        "user_id", "ts",
        F.col("ts").alias("p_ts"), F.col("value").alias("p_value"),
    )
    out = asof_join(clicks, purchases, on="user_id", ts="ts",
                    right_payload=["p_ts", "p_value"])
    got = {r.event_id: (r.p_ts, r.p_value) for r in out.collect()}
    assert got[1] == (ts("2024-01-01T10:00:00"), 5.0)  # >= tie matches
    assert got[2] == (ts("2024-01-01T11:30:00"), 7.0)
    assert got[3] == (None, None)  # user with no purchases → left join nulls


def test_range_join_window(spark):
    left = spark.createDataFrame([(1, 5), (1, 50)], "k int, x int")
    right = spark.createDataFrame([(1, 0)], "k2 int, lo int")
    pred = F.col("x").between(F.col("lo"), F.col("lo") + 10)
    out = range_join(left, right, ("k", "k2"), pred)
    assert [r.x for r in out.collect()] == [5]


def test_salted_join_equals_plain_join(spark):
    from collections import Counter

    left = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 99)], "k int, payload int"
    )  # key 1 is hot
    right = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, attr string")
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
        salted_join,
    )

    salted = Counter((r.k, r.payload, r.attr) for r in salted_join(left, right, "k").collect())
    plain = Counter((r.k, r.payload, r.attr) for r in left.join(right, "k").collect())
    assert salted == plain


def test_salted_join_spreads_hot_key_across_tasks(spark):
    """Under real skew (one key owning 60% of rows) the salted join's
    reducer tasks each see ~1/n_salts of the hot key, where the plain
    join funnels all of it into one straggler task.

    AQE and auto-broadcast are disabled for the duration so both joins
    shuffle on their keys and the output partition id IS the reducer
    task id; per-partition row counts then measure task input directly.
    """
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
        salted_join,
    )

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # wide enough that the 8 (hot, salt) keys don't hash-collide into
    # a shared reducer (layout is deterministic for a fixed Spark hash)
    conf.set("spark.sql.shuffle.partitions", "256")
    try:
        n_rows, n_salts = 4000, 8
        left = spark.range(n_rows).select(
            F.when(F.col("id") < n_rows * 0.6, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = left.select("k").distinct().withColumn("attr", F.length("k"))

        def part_counts(df):
            return {
                r.pid: r["count"]
                for r in df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            }

        def hot_partitions(df):
            return (
                df.filter(F.col("k") == "hot")
                .select(F.spark_partition_id().alias("pid"))
                .distinct()
                .count()
            )

        plain = left.join(right, "k")
        salted = salted_join(left, right, "k", n_salts=n_salts)

        plain_max = max(part_counts(plain).values())
        salted_max = max(part_counts(salted).values())

        # plain: the whole hot key lands on one reducer
        assert plain_max >= n_rows * 0.6
        assert hot_partitions(plain) == 1
        # salted: the hot key spreads over ~n_salts reducers; allow 2x
        # slack for (key, salt) pairs hash-colliding into one partition
        assert salted_max <= plain_max / (n_salts / 2)
        assert hot_partitions(salted) >= n_salts // 2
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_asof_join_strict_excludes_same_instant(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2")], "k bigint, t bigint, lbl string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 20, 200.0)],
        "k bigint, t bigint, v double",
    )
    loose = {
        (r.lbl): r.v
        for r in asof_join(left, right, "k", "t", ["v"]).collect()
    }
    strict = {
        (r.lbl): r.v
        for r in asof_join(left, right, "k", "t", ["v"], strict=True).collect()
    }
    # default: same-instant right row matches (>=)
    assert loose == {"l1": 100.0, "l2": 200.0}
    # strict: same-instant row must NOT leak; latest strictly-before wins
    assert strict == {"l1": None, "l2": 150.0}
