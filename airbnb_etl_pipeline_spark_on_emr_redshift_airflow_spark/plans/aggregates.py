"""Catalog: aggregation shapes (SURVEY.md §2.4) incl. the flagship
two-level histogram and the TPC-H-Q1-shaped headline query."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    collect_set_csv,
    dec_avg,
    dec_avg_sql,
    dec_sum,
    dec_sum_sql,
    nested_histogram,
    ratio_to_total,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql("l_quantity", "sum_qty")},
           {dec_sum_sql("l_extendedprice", "sum_base_price")},
           {dec_sum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {dec_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {dec_avg_sql("l_quantity", "avg_qty")},
           {dec_avg_sql("l_extendedprice", "avg_price")},
           {dec_avg_sql("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Headline bench query — TPC-H Q1 shape: scan-heavy two-key hash
    aggregate with 8 measures. Exercises A3/A4/F13 and the decimal
    determinism pattern. At scale this is a pure map-side-partial +
    single-shuffle aggregate; AQE coalesces the 6-group result."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a_groupby_multi_measure",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           {dec_avg_sql("c.c_acctbal", "avg_acctbal")},
           {dec_sum_sql("c.c_acctbal", "total_acctbal")}
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def a_groupby_multi_measure(spark, sf_dir):
    """A3/A4 multi-measure group-by over a broadcast dim join — the
    per-city weather means (``redshift-etl-notebook.ipynb`` cell 35)."""
    customer, nation = load(spark, sf_dir, "customer", "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dec_avg("c_acctbal", "avg_acctbal"),
            dec_sum("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "a_nested_histogram",
    oracle="""
    SELECT n_attr, count(*) AS num_entities FROM (
      SELECT c_custkey, count(*) AS n_attr FROM (
        SELECT DISTINCT c.c_custkey, o.o_orderpriority
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      ) pairs GROUP BY c_custkey
    ) per_entity GROUP BY n_attr
    """,
)
def a_nested_histogram(spark, sf_dir):
    """**Flagship** — A7, the reference's "guests visiting >1 city"
    two-level aggregation (``redshift-etl-notebook.ipynb`` cell 51):
    fact⋈dim → distinct pairs → per-entity count → histogram of
    counts. Here: how many customers used exactly N distinct order
    priorities."""
    orders, customer = load(spark, sf_dir, "orders", "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "c_custkey", "o_orderpriority"
    )
    return nested_histogram(joined, "c_custkey", "o_orderpriority")


ORACLE_COLLECT_SET_JOIN = """
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM customer GROUP BY c_nationkey
    """


def a_collect_set_join_impl(spark, sf_dir):
    """A10/F10 — per-group distinct set flattened to a sorted CSV
    string (``apps/process_reviewers.py:87,93`` languages_spoken).
    Round-11 rotation: folded into ``w_latest_snapshot_per_key``'s
    'segments' slice for the driver window (the same collect_set →
    sorted CSV move, group-level instead of windowed); re-registered
    verbatim at the tail in ``plans.probes``."""
    (customer,) = load(spark, sf_dir, "customer")
    return collect_set_csv(customer, ["c_nationkey"], "c_mktsegment", "segments")


@register(
    "a_cube_pivot",
    oracle=f"""
    WITH pivoted AS (
      SELECT l_returnflag,
             {dec_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "qty_open")},
             {dec_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", "qty_filled")}
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'cube' AS slice, l_returnflag, l_linestatus,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n,
           {dec_sum_sql("l_quantity", "sum_qty")},
           {dec_sum_sql("l_extendedprice", "sum_price")},
           CAST(NULL AS VARCHAR) AS measure,
           CAST(NULL AS DOUBLE) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'pivot', l_returnflag, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           'qty_open', qty_open
    FROM pivoted
    UNION ALL
    SELECT 'pivot', l_returnflag, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           'qty_filled', qty_filled
    FROM pivoted
    """,
)
def a_cube_pivot(spark, sf_dir):
    """Round-10 slice-merge of ``a_rollup_cube`` + ``a_pivot_unpivot``
    (both re-registered verbatim past the window in ``plans.probes``),
    freeing a first-50 slot for the lakehouse-facade query per the
    established rotation discipline.

    'cube' slice — the full CUBE lattice over the Q1 keys (a strict
    superset of ROLLUP's subtotal sets), ``grouping_id()``-tagged so
    subtotal rows are distinguishable from genuine-NULL key rows;
    Catalyst plans it as one Expand + hash aggregate (one shuffle
    regardless of set count). 'pivot' slice — pivot via conditional
    aggregation then ``stack`` melted back to (measure, qty) rows in
    the same stage (no extra shuffle). Disjoint single-exchange legs
    null-padded to a common schema."""
    (li,) = load(spark, sf_dir, "lineitem")
    cube = li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n"),
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_price"),
    ).select(
        F.lit("cube").alias("slice"),
        "l_returnflag", "l_linestatus", "gid", "n", "sum_qty", "sum_price",
        F.lit(None).cast("string").alias("measure"),
        F.lit(None).cast("double").alias("qty"),
    )
    pivoted = li.groupBy("l_returnflag").agg(
        dec_sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")), "qty_open"),
        dec_sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")), "qty_filled"),
    )
    melt = pivoted.selectExpr(
        "l_returnflag",
        "stack(2, 'qty_open', qty_open, 'qty_filled', qty_filled)"
        " AS (measure, qty)",
    ).select(
        F.lit("pivot").alias("slice"),
        "l_returnflag",
        F.lit(None).cast("string").alias("l_linestatus"),
        F.lit(None).cast("bigint").alias("gid"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("sum_qty"),
        F.lit(None).cast("double").alias("sum_price"),
        "measure", "qty",
    )
    return cube.unionByName(melt)


@register(
    "a_column_profile",
    oracle="""
    SELECT 'o_custkey' AS column, count(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    """,
)
def a_column_profile(spark, sf_dir):
    """Column-profiling operator (data-quality surface — generalizes
    the reference's notebook sanity checks into one single-pass
    aggregate + unpivot). The o_orderdate row carries the A1/A2 global
    scalars (row count, min/max date — the reference's quality-gate
    counts at ``airbnb-etl-airflow.py:141`` and the max-date watermark
    of ``apps/process_reviews.py:102-103``). Exact-distinct variant
    used here so the oracle can match; ``operators.profile.profile``
    is the sketch-based scale form."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.profile import (
        exact_profile,
    )

    (orders,) = load(spark, sf_dir, "orders")
    return exact_profile(orders, ["o_custkey", "o_orderpriority", "o_orderdate"])


@register(
    "a_top_share_limit",
    oracle="""
    WITH shares AS (
      SELECT c_mktsegment,
             count(*) AS cnt,
             CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM customer) AS share
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY share DESC, c_mktsegment DESC
      LIMIT 3
    )
    SELECT 'segment_share' AS slice, c_mktsegment AS entity, cnt AS n,
           share AS metric
    FROM shares
    UNION ALL
    SELECT 'top_price', CAST(o_orderkey AS VARCHAR), o_custkey, o_totalprice
    FROM (SELECT * FROM orders
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10)
    UNION ALL
    SELECT 'earliest', CAST(o_orderkey AS VARCHAR), o_custkey, o_totalprice
    FROM (SELECT * FROM orders
          ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 50)
    """,
)
def a_top_share_limit(spark, sf_dir):
    """A5 + O1/O2/O3 in one slot (absorbs the former
    ``o_topk_sort_limit`` row, slice-tagged). 'segment_share': the
    reference's cell-47 shape exactly — ratio-to-total share per
    group, ORDER BY share DESC LIMIT k, name tie-break. 'top_price' /
    'earliest': top-k by price desc (reference cells 47/49) and the
    earliest-50 ascending sort+limit (``apps/process_weather.py:99``
    ORDER BY date; LIMIT peeks in notebook cells 12/18/24), each with
    a unique tie-break. Spark plans the sort+limit slices as
    TakeOrderedAndProject — per-partition heaps, no global sort, no
    single-partition exchange (asserted in ``tests/test_plans.py``)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        topk,
    )

    customer, orders = load(spark, sf_dir, "customer", "orders")
    shares = ratio_to_total(customer, ["c_mktsegment"])
    seg = topk(shares, ["share", "c_mktsegment"], 3).select(
        F.lit("segment_share").alias("slice"),
        F.col("c_mktsegment").alias("entity"),
        F.col("cnt").alias("n"),
        F.col("share").alias("metric"),
    )
    top_price = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.lit("top_price").alias("slice"),
            F.col("o_orderkey").cast("string").alias("entity"),
            F.col("o_custkey").alias("n"),
            F.col("o_totalprice").alias("metric"),
        )
    )
    earliest = (
        orders.orderBy("o_orderdate", "o_orderkey")
        .limit(50)
        .select(
            F.lit("earliest").alias("slice"),
            F.col("o_orderkey").cast("string").alias("entity"),
            F.col("o_custkey").alias("n"),
            F.col("o_totalprice").alias("metric"),
        )
    )
    return seg.unionByName(top_price).unionByName(earliest)


_ZS_SX = dec_sum_sql("o_totalprice", "sx").rsplit(" AS ", 1)[0]
_ZS_SXX = dec_sum_sql("o_totalprice * o_totalprice", "sxx").rsplit(" AS ", 1)[0]


@register(
    "a_grouped_pandas_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT o_custkey, count(*) AS n, {_ZS_SX} AS sx, {_ZS_SXX} AS sxx
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_custkey, o.o_totalprice,
           CASE WHEN (s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)) > 0
                THEN (o.o_totalprice - s.sx / s.n)
                     / sqrt(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n))
                ELSE CAST(0.0 AS DOUBLE) END AS zscore
    FROM orders o JOIN stats s ON o.o_custkey = s.o_custkey
    """,
)
def a_grouped_pandas_zscore(spark, sf_dir):
    """Per-customer order z-scores — round 1/2 this was rows-only
    because pandas' float reduction order can't be reproduced by a SQL
    engine. Now hash-checked: the catalog query computes the SAME
    population z = (x-μ)/σ from exact fixed-point moment sums
    (``dec_sum`` of x and x² — associative integer accumulation, so μ
    and σ² are bit-identical doubles in both engines; every remaining
    op is a deterministic IEEE division/sqrt). Constant/single-row
    groups yield z = 0.0, matching the operator. The grouped-map
    pandas operator (``operators.grouped_pandas.zscore_per_group``)
    remains the escape-hatch seam and is asserted equivalent to this
    JVM form within 1e-6 in tests — converting the driver row from
    rows-only to oracle-checked without giving up the applyInPandas
    coverage."""
    (orders,) = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    stats = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        dec_sum(x, "sx"),
        dec_sum(x * x, "sxx"),
    )
    j = orders.select("o_custkey", "o_totalprice").join(stats, "o_custkey")
    mu = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mu * mu
    z = F.when(var > 0, (x - mu) / F.sqrt(var)).otherwise(F.lit(0.0))
    return j.select("o_custkey", "o_totalprice", z.alias("zscore"))


# round-6 rotation: a_approx_sketches moved past the driver window
# (re-registered verbatim in plans.probes) — its exact sibling
# a_grouped_quantiles plus the sketch error-bound tests keep the
# family's coverage; the freed slot records the oracle-checked DSIR
# selection (c_dsir_select, registered in plans.curation).
