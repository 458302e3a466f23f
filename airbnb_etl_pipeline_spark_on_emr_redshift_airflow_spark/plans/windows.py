"""Catalog: window functions (SURVEY.md §2.5) — the reference's
latest-per-key signature move, bounded moving frames, and the
ranking/offset surface the reference lacked but Spark gives for free.

Determinism: every window ORDER BY ends in a unique tie-break column
(SURVEY.md §7.4 hard part — ``F.last`` over ties is arbitrary, so both
the Spark plan and the oracle pin a total order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
    latest_per_key,
    moving_agg,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)

DEC = "decimal(18,4)"


@register(
    "w_latest_snapshot_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def w_latest_snapshot_per_key(spark, sf_dir):
    """W1/W2 — the reference's signature dedup: newest row per key via
    ``F.last`` over an unbounded frame + filter + dropDuplicates
    (``apps/process_listings_hosts.py:121-125``). Order key is made
    unique (date, then orderkey) so the reference pattern and the
    oracle's row_number agree exactly — the equivalence SURVEY.md §7.4
    flags as needing deterministic tie-breaking."""
    (orders,) = load(spark, sf_dir, "orders")
    # Composite sortable order key mirrors the reference's single
    # `last_scraped` column while staying unique.
    keyed = orders.withColumn(
        "__ord",
        F.concat_ws(
            "#",
            F.date_format("o_orderdate", "yyyyMMddHHmmss"),
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        ),
    )
    return latest_per_key(keyed, ["o_custkey"], ["__ord"]).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )


@register(
    "w_moving_avg_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(o_totalprice)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS moving_avg_price
    FROM orders
    """,
)
def w_moving_avg_frame(spark, sf_dir):
    """W4 — moving average over ROWS 7 PRECEDING (the reference's
    temperature smoothing, notebook cell 43), decimal-accumulated."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-7, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("moving_avg_price"),
    )


@register(
    "w_moving_sum_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_qty
    FROM lineitem
    """,
)
def w_moving_sum_frame(spark, sf_dir):
    """W5 — moving sum over ROWS 3 PRECEDING (the rainfall window,
    notebook cell 45), via the generic ``moving_agg`` operator."""
    (li,) = load(spark, sf_dir, "lineitem")
    out = moving_agg(
        li,
        partition=["l_suppkey"],
        order=["l_shipdate", "l_orderkey", "l_linenumber"],
        preceding=3,
        aggs={"moving_qty": F.sum(F.col("l_quantity").cast(DEC))},
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("moving_qty").cast("double").alias("moving_qty"),
    )


@register(
    "w_rank_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank()       OVER w2 AS rnk,
           dense_rank() OVER w2 AS drnk,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    """,
)
def w_rank_lag_lead(spark, sf_dir):
    """Ranking/offset surface extension (SURVEY.md §2.5: absent in the
    reference, free in Spark): row_number, rank, dense_rank, lag,
    lead. rank/dense_rank use a deliberately non-unique order to
    exercise tie handling (identical rank semantics both engines)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "w_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS lifetime_spend
    FROM orders
    """,
)
def w_running_total(spark, sf_dir):
    """Cumulative frame extension: per-customer running spend."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "lifetime_spend"
        ),
    )


@register(
    "w_ntile_percentiles",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def w_ntile_percentiles(spark, sf_dir):
    """Distribution-rank extension: ntile/percent_rank/cume_dist over a
    global window with unique ordering. (Single-partition window — fine
    here; at 100 TB a global rank goes through range-partitioned sort
    instead, see operators.windows notes.)"""
    (customer,) = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "w_scd2_versions",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_scd2_versions(spark, sf_dir):
    """SCD2 surface extension: each customer's order history becomes a
    versioned dimension — valid_from/valid_to intervals from one
    lead() window, last version current. (The reference keeps only
    SCD1/newest-row; this preserves history — the CDC/MERGE-free
    idiom.)"""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
        scd2_versions,
    )

    (orders,) = load(spark, sf_dir, "orders")
    slim = orders.select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    return scd2_versions(
        slim, ["o_custkey"], "o_orderdate", order_tiebreak=["o_orderkey"]
    ).select(
        "o_custkey", "o_orderkey", "o_totalprice", "valid_from", "valid_to", "is_current"
    )


@register(
    "w_windowed_collect_set",
    oracle="""
    SELECT o_custkey,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities_seen
    FROM orders GROUP BY o_custkey
    """,
)
def w_windowed_collect_set(spark, sf_dir):
    """W3 — analytic (non-ranking) aggregate over an unbounded window:
    the reference's ``collect_set(...).over(w)`` languages-spoken move
    (``apps/process_reviewers.py:87``), sorted for determinism."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.select(
            "o_custkey",
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority").over(w)), ","
            ).alias("priorities_seen"),
        )
        .distinct()
    )
