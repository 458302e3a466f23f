"""Bottom-k priority-sample ledgers: split-merge must equal the
direct build bit-for-bit, merge must be order-independent and
idempotent under re-delivery, the KMV distinct estimate must track
exact counts, and a SQL-expressible priority must replay the exact
sample through plain row_number semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
    bottomk_ledger,
    ledger_distinct_estimate,
    ledger_sample,
    merge_bottomk_ledgers,
)
from tests.conftest import SF_DIR

K = 64


def _events(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (ev,) = load(spark, SF_DIR, "events")
    return ev.select("event_id", "event_type", "user_id")


def _rows(led):
    return sorted(
        (r.event_type, tuple((s.pri, s.id) for s in r.sample), r.n_rows)
        for r in led.collect()
    )


def test_split_merge_equals_direct_build_bit_exact(spark):
    ev = _events(spark)
    direct = bottomk_ledger(ev, ["event_type"], "user_id", K)
    halves = [
        bottomk_ledger(ev.filter(f"event_id % 2 = {p}"), ["event_type"], "user_id", K)
        for p in (0, 1)
    ]
    merged = merge_bottomk_ledgers(halves, ["event_type"], K)
    assert _rows(merged) == _rows(direct)


def test_merge_order_independent_and_redelivery_idempotent(spark):
    ev = _events(spark)
    thirds = [
        bottomk_ledger(ev.filter(f"event_id % 3 = {p}"), ["event_type"], "user_id", K)
        for p in (0, 1, 2)
    ]
    a = merge_bottomk_ledgers(thirds, ["event_type"], K)
    b = merge_bottomk_ledgers(list(reversed(thirds)), ["event_type"], K)
    assert _rows(a) == _rows(b)
    # re-delivering a period must not change the sample (set-union
    # over (pri, id)); only the additive row count moves
    redelivered = merge_bottomk_ledgers(thirds + [thirds[0]], ["event_type"], K)
    ra = {t: s for t, s, _ in _rows(a)}
    rr = {t: s for t, s, _ in _rows(redelivered)}
    assert ra == rr


def test_distinct_estimate_tracks_exact(spark):
    ev = _events(spark)
    led = bottomk_ledger(ev, ["event_type"], "user_id", K)
    est = {
        r.event_type: r.distinct_est
        for r in ledger_distinct_estimate(led, ["event_type"], K).collect()
    }
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for t in exact:
        if exact[t] < K:
            assert est[t] == exact[t]
        else:
            # KMV standard error ~ 1/sqrt(k-2) ~ 13% at k=64
            assert abs(est[t] - exact[t]) <= max(5, 0.4 * exact[t]), (
                t,
                est[t],
                exact[t],
            )


def test_distinct_estimate_custom_priority_needs_range(spark):
    """A ledger built with the Knuth hash in [0, 2^32) fed to the
    DEFAULT full-int64 normalization puts u_k ~ 0.5 and degenerates
    the estimate to ~2(k-1); passing the priority's actual range
    restores a sane KMV estimate (round-7 ADVICE fix)."""
    ev = _events(spark).withColumn("eid", F.expr("CAST(event_id AS BIGINT)"))
    pri = F.expr("(eid * 2654435761) % 4294967296")
    k = 16
    led = bottomk_ledger(ev, ["event_type"], "eid", k, priority=pri)
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("eid").alias("d"))
        .collect()
    }
    big = [t for t, d in exact.items() if d >= k]
    assert big, "test needs at least one group with >= k distinct ids"
    degen = {
        r.event_type: r.distinct_est
        for r in ledger_distinct_estimate(led, ["event_type"], k).collect()
    }
    ranged = {
        r.event_type: r.distinct_est
        for r in ledger_distinct_estimate(
            led, ["event_type"], k, pri_lo=0, pri_hi=2**32
        ).collect()
    }
    for t in big:
        # default range: silently ~2(k-1) regardless of true count
        assert abs(degen[t] - 2 * (k - 1)) <= 2, (t, degen[t])
        # correct range: within KMV error of the truth
        assert abs(ranged[t] - exact[t]) <= max(5, 0.6 * exact[t]), (
            t,
            ranged[t],
            exact[t],
        )


def test_sample_serving_is_rank_stable_and_deterministic(spark):
    ev = _events(spark)
    a = ledger_sample(
        bottomk_ledger(ev, ["event_type"], "user_id", K), ["event_type"]
    )
    b = ledger_sample(
        bottomk_ledger(ev.repartition(7), ["event_type"], "user_id", K),
        ["event_type"],
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # ranks are 1..size and priorities ascend within each group
    import itertools

    for t, grp in itertools.groupby(ra, key=lambda r: r[0]):
        g = list(grp)
        assert [r[1] for r in g] == list(range(1, len(g) + 1))
        assert [r[2] for r in g] == sorted(r[2] for r in g)


def test_sql_expressible_priority_replays_identically(spark):
    # Knuth multiplicative hash on a numeric id: the priority the
    # catalog probe hands to DuckDB. The ledger sample must equal the
    # plain row_number-over-priority SQL on the same frame.
    ev = _events(spark).withColumn("uid", F.expr("CAST(user_id AS BIGINT)"))
    pri = F.expr("(uid * 2654435761) % 4294967296")
    led = bottomk_ledger(ev, ["event_type"], "uid", 16, priority=pri)
    got = sorted(
        (r.event_type, r.rank, r.id)
        for r in ledger_sample(led, ["event_type"]).collect()
    )
    ev.createOrReplaceTempView("__bk_ev")
    want = sorted(
        (r.event_type, r.rank, r.uid)
        for r in spark.sql(
            """
            SELECT event_type, rank, uid FROM (
              SELECT event_type, uid,
                     ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY (uid * 2654435761) % 4294967296, uid
                     ) AS rank
              FROM (SELECT DISTINCT event_type, uid FROM __bk_ev))
            WHERE rank <= 16
            """
        ).collect()
    )
    assert got == want


def test_ledger_jaccard_exact_when_k_covers_sets(spark):
    """k >= |set| for every group: the samples ARE the distinct sets,
    so the KMV estimate must equal the true Jaccard exactly."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
        ledger_jaccard,
    )

    rows = (
        [("a", i) for i in range(20)]
        + [("b", i) for i in range(10, 30)]  # J(a,b) = 10/30
        + [("c", i) for i in range(100, 120)]  # J(a,c) = 0
    )
    df = spark.createDataFrame(rows, "grp string, item bigint")
    led = bottomk_ledger(df, ["grp"], "item", k=64)
    got = {
        (r.key_a, r.key_b): (r.inter_size, r.union_size, r.jaccard_fp)
        for r in ledger_jaccard(led, "grp", k=64).collect()
    }
    assert got[("a", "b")] == (10, 30, 333333)
    assert got[("a", "c")] == (0, 40, 0)
    assert got[("b", "c")] == (0, 40, 0)


def test_ledger_jaccard_estimate_tracks_true_overlap(spark):
    """Sampled regime (k << |set|): the KMV estimate must land within
    a generous envelope of the true Jaccard for planted overlaps of
    0, ~1/3 and 1, and be deterministic under repartitioning."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
        ledger_jaccard,
    )

    n = 3000
    rows = (
        [("full", i) for i in range(n)]
        + [("same", i) for i in range(n)]  # J = 1
        + [("third", i) for i in range(n // 2, 2 * n - n // 2)]  # J ~ 1/3
        + [("none", i) for i in range(10 * n, 11 * n)]  # J = 0
    )
    df = spark.createDataFrame(rows, "grp string, item bigint")
    led = bottomk_ledger(df, ["grp"], "item", k=64)
    got = {
        (r.key_a, r.key_b): r.jaccard_fp / 1e6
        for r in ledger_jaccard(led, "grp", k=64).collect()
    }
    assert got[("full", "same")] == 1.0
    assert got[("full", "none")] == 0.0
    # true J(full, third) = overlap / union = (n/2) / (2.5n) = 0.2
    assert abs(got[("full", "third")] - 0.2) < 0.15
    led2 = bottomk_ledger(df.repartition(7, "item"), ["grp"], "item", k=64)
    got2 = {
        (r.key_a, r.key_b): r.jaccard_fp / 1e6
        for r in ledger_jaccard(led2, "grp", k=64).collect()
    }
    assert got == got2
