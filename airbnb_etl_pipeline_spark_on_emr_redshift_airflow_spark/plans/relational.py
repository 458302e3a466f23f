"""Catalog: scans, projections, filters, set operations (SURVEY.md
§2.1-2.2, §2.6-2.7).

Each query names the reference operator(s) it exercises. Plans are
declarative DataFrame/SQL — check ``.explain("formatted")``: filters
and projections land in the parquet scan (``PushedFilters`` /
``ReadSchema``), everything below stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    dec_sum,
    dec_sum_sql,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    align_union,
    with_typed_nulls,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


@register(
    "s_parquet_scan_prune",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 45
    """,
)
def s_parquet_scan_prune(spark, sf_dir):
    """S4 parquet scan + Catalyst pushdown: projection prunes to 3 of 11
    columns (ReadSchema), both predicates reach the scan (PushedFilters).
    Reference scan sites: ``apps/process_listings_hosts.py:87``."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "p_project_rename_cast",
    oracle="""
    SELECT p_partkey AS part_id,
           lower(p_name) AS name_norm,
           CAST(p_size AS BIGINT) AS size_l,
           CAST(CAST(p_retailprice / 10 AS DECIMAL(18,4)) AS DOUBLE) AS price_tenth,
           CAST(NULL AS DOUBLE) AS discount_rate
    FROM part
    """,
)
def p_project_rename_cast(spark, sf_dir):
    """P1-P5 + F7 + F11: rename, normalize, cast, arithmetic rescale
    (the reference's ``TG/10`` at ``apps/process_weather.py:91``), and
    a typed-null pad (``apps/process_listings_hosts.py:90-95``)."""
    (part,) = load(spark, sf_dir, "part")
    projected = part.select(
        F.col("p_partkey").alias("part_id"),
        F.lower("p_name").alias("name_norm"),
        F.col("p_size").cast("bigint").alias("size_l"),
        (F.col("p_retailprice") / 10).cast("decimal(18,4)").cast("double").alias(
            "price_tenth"
        ),
    )
    return with_typed_nulls(projected, {"discount_rate": "double"})


@register(
    "p_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderdate > TIMESTAMP '1996-06-01 00:00:00'
      AND o_custkey IS NOT NULL
    """,
)
def p_filter_predicates(spark, sf_dir):
    """P7-P10: literal equality, IN-list, range, timestamp cut, null
    guard — all pushed to the scan (reference filter sites
    ``apps/preprocess_data.py:95``, ``apps/process_weather.py:98``,
    ``apps/process_reviews.py:134-138``)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderdate") > F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "p_derived_date_parts",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def p_derived_date_parts(spark, sf_dir):
    """P6/F5: year/month derivation — the reference's partition-key
    columns (``apps/preprocess_data.py:92,102,112``) — then a count per
    derived part."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "p_null_pad_align_union",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_nationkey < 10
    UNION ALL
    SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment, c_acctbal
    FROM customer WHERE c_nationkey >= 10
    """,
)
def p_null_pad_align_union(spark, sf_dir):
    """P4/P5/U1 — the union-with-schema-drift semantics (SURVEY.md §7.4
    hard part): two sources with disjoint column subsets, typed-null
    padded and unioned by name (replacing the reference's
    sort-columns + positional-union at
    ``apps/process_listings_hosts.py:97,111,120``)."""
    (customer,) = load(spark, sf_dir, "customer")
    narrow_a = customer.filter(F.col("c_nationkey") < 10).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    narrow_b = customer.filter(F.col("c_nationkey") >= 10).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    padded_a = with_typed_nulls(narrow_a, {"c_acctbal": "double"})
    return align_union(padded_a, narrow_b).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


@register(
    "u_three_way_union",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'returned' AS disposition FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'accepted' AS disposition FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'n/a' AS disposition FROM lineitem WHERE l_returnflag NOT IN ('R','A')
    """,
)
def u_three_way_union(spark, sf_dir):
    """U2 — the reference's partition-transform-reunion: split on a
    predicate, apply a different transform per slice, reassemble
    (``apps/process_reviews.py:137-140``: non-en ∪ scored-en ∪
    null-language with 'n/a' fill)."""
    (li,) = load(spark, sf_dir, "lineitem")
    base = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    returned = base.filter(F.col("l_returnflag") == "R").withColumn(
        "disposition", F.lit("returned")
    )
    accepted = base.filter(F.col("l_returnflag") == "A").withColumn(
        "disposition", F.lit("accepted")
    )
    other = base.filter(~F.col("l_returnflag").isin("R", "A")).withColumn(
        "disposition", F.lit("n/a")
    )
    return align_union(returned, accepted, other).select(
        "l_orderkey", "l_linenumber", "disposition"
    )


@register(
    "u_intersect_except",
    oracle="""
    WITH build_nations AS (SELECT c_nationkey AS nationkey FROM customer INTERSECT
                           SELECT s_nationkey FROM supplier),
         cust_only     AS (SELECT c_nationkey AS nationkey FROM customer EXCEPT
                           SELECT s_nationkey FROM supplier)
    SELECT nationkey, 'both' AS presence FROM build_nations
    UNION ALL
    SELECT nationkey, 'customer_only' AS presence FROM cust_only
    """,
)
def u_intersect_except(spark, sf_dir):
    """Set-op surface extension (SURVEY.md §2.7 notes the reference has
    no intersect/except; free in Spark): nations present in both
    customer and supplier vs customer-only."""
    customer, supplier = load(spark, sf_dir, "customer", "supplier")
    cust = customer.select(F.col("c_nationkey").alias("nationkey"))
    supp = supplier.select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).withColumn("presence", F.lit("both"))
    # subtract = EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would keep multiplicity differences.
    only = cust.subtract(supp).withColumn("presence", F.lit("customer_only"))
    return align_union(both, only)


@register(
    "f_string_date_functions",
    oracle="""
    SELECT concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS segment_key,
           upper(substr(c_name, 1, 8)) AS name_prefix,
           CAST(CAST(c_acctbal / 10 AS DECIMAL(18,4)) AS DOUBLE) AS acctbal_tenth,
           CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing,
           length(c_name) AS name_len
    FROM customer
    """,
)
def f_string_date_functions(spark, sf_dir):
    """F1/F7/F8/F11 scalar-function surface: the surrogate-key
    ``concat_ws`` (reference ``weather_id = concat(city,'_',date)``,
    ``apps/process_reviews.py:111``), substring/upper, arithmetic
    rescale, CASE, length."""
    (customer,) = load(spark, sf_dir, "customer")
    return customer.select(
        F.concat_ws(
            "_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("segment_key"),
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        (F.col("c_acctbal") / 10).cast("decimal(18,4)").cast("double").alias(
            "acctbal_tenth"
        ),
        F.when(F.col("c_acctbal") < 0, "debt").otherwise("credit").alias("standing"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "f_date_parse_roundtrip",
    oracle="""
    WITH compact AS (
      SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS ymd FROM orders
    )
    SELECT o_orderkey, ymd,
           CAST(strptime(ymd, '%Y%m%d') AS DATE) AS parsed_date,
           CAST(EXTRACT(year FROM strptime(ymd, '%Y%m%d')) AS INT) AS y
    FROM compact
    WHERE CAST(strptime(ymd, '%Y%m%d') AS DATE) > DATE '1998-01-01'
    """,
)
def f_date_parse_roundtrip(spark, sf_dir):
    """F6 — compact-date parsing (`to_date(col,'yyyyMMdd')`, the ECA&D
    weather dates at ``apps/process_weather.py:91,98``) incl. the
    date-range predicate over the parsed value (P10)."""
    (orders,) = load(spark, sf_dir, "orders")
    compact = orders.select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd").alias("ymd")
    )
    parsed = compact.withColumn("parsed_date", F.to_date("ymd", "yyyyMMdd"))
    return parsed.filter(F.col("parsed_date") > F.lit("1998-01-01").cast("date")).select(
        "o_orderkey", "ymd", "parsed_date", F.year("parsed_date").alias("y")
    )


@register(
    "o_topk_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def o_topk_deterministic(spark, sf_dir):
    """O2 top-k: ORDER BY DESC LIMIT k with a unique tie-break
    (reference cells 47/49). Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "o_global_sort_limit",
    oracle="""
    SELECT o_orderkey, o_orderdate
    FROM orders
    ORDER BY o_orderdate ASC, o_orderkey ASC
    LIMIT 50
    """,
)
def o_global_sort_limit(spark, sf_dir):
    """O1/O3: global sort + limit (reference ``apps/process_weather.py:99``
    ORDER BY date; LIMIT peeks in notebook cells 12/18/24)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.orderBy("o_orderdate", "o_orderkey").limit(50).select(
        "o_orderkey", "o_orderdate"
    )


@register(
    "u_union_dedup_merge",
    oracle="""
    WITH merged AS (
      SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      UNION ALL
      SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
    ), ranked AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             row_number() OVER (PARTITION BY o_orderkey
                                ORDER BY o_orderdate DESC, o_totalprice DESC) AS rn
      FROM merged
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def u_union_dedup_merge(spark, sf_dir):
    """U1 + A9 + W1 — the reference's core incremental-merge semantics
    (``apps/process_reviews.py:146-148``): a snapshot and an
    overlapping delta are unioned and deduped to the newest row per
    key. The overlap window models re-delivered late rows
    (``README.md:210-213``)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
        incremental_merge,
    )

    (orders,) = load(spark, sf_dir, "orders")
    snapshot = orders.filter(F.col("o_orderdate") < "1999-01-01")
    delta = orders.filter(F.col("o_orderdate") >= "1998-06-01")
    return incremental_merge(
        snapshot, delta, ["o_orderkey"], ["o_orderdate", "o_totalprice"]
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")


@register(
    "f_revenue_expression",
    oracle=f"""
    SELECT l_orderkey,
           {dec_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "gross_revenue")}
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def f_revenue_expression(spark, sf_dir):
    """F7/F13 arithmetic-expression pipeline: the classic
    price×(1-disc)×(1+tax) revenue expression, decimal-accumulated per
    order (order-independent across partitions — see catalog notes)."""
    (li,) = load(spark, sf_dir, "lineitem")
    expr = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return li.groupBy("l_orderkey").agg(dec_sum(expr, "gross_revenue"))
