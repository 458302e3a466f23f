"""Catalog: scans, projections, filters, set operations (SURVEY.md
§2.1-2.2, §2.6-2.7).

Each query names the reference operator(s) it exercises. Plans are
declarative DataFrame/SQL — check ``.explain("formatted")``: filters
and projections land in the parquet scan (``PushedFilters`` /
``ReadSchema``), everything below stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    align_union,
    with_typed_nulls,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


ORACLE_PROJECT_DATES = """
    SELECT 'proj' AS slice,
           p_partkey AS part_id,
           lower(p_name) AS name_norm,
           CAST(p_size AS BIGINT) AS size_l,
           CAST(CAST(p_retailprice / 10 AS DECIMAL(18,4)) AS DOUBLE) AS price_tenth,
           CAST(NULL AS DOUBLE) AS discount_rate,
           CAST(NULL AS INT) AS order_year,
           CAST(NULL AS INT) AS order_month,
           CAST(NULL AS BIGINT) AS n_orders
    FROM part
    UNION ALL
    SELECT 'dates' AS slice,
           CAST(NULL AS BIGINT) AS part_id,
           CAST(NULL AS VARCHAR) AS name_norm,
           CAST(NULL AS BIGINT) AS size_l,
           CAST(NULL AS DOUBLE) AS price_tenth,
           CAST(NULL AS DOUBLE) AS discount_rate,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           count(*) AS n_orders
    FROM orders
    GROUP BY 7, 8
    """

ORACLE_FILTER_PREDICATES = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderdate > TIMESTAMP '1996-06-01 00:00:00'
      AND o_custkey IS NOT NULL
    """


@register(
    "p_project_filter",
    oracle=f"""
    SELECT slice, part_id, name_norm, size_l, price_tenth,
           discount_rate, order_year, order_month, n_orders,
           CAST(NULL AS BIGINT) AS o_orderkey,
           CAST(NULL AS VARCHAR) AS o_orderstatus,
           CAST(NULL AS DOUBLE) AS o_totalprice
    FROM ({ORACLE_PROJECT_DATES}) p
    UNION ALL
    SELECT 'filter' AS slice,
           CAST(NULL AS BIGINT) AS part_id,
           CAST(NULL AS VARCHAR) AS name_norm,
           CAST(NULL AS BIGINT) AS size_l,
           CAST(NULL AS DOUBLE) AS price_tenth,
           CAST(NULL AS DOUBLE) AS discount_rate,
           CAST(NULL AS INT) AS order_year,
           CAST(NULL AS INT) AS order_month,
           CAST(NULL AS BIGINT) AS n_orders,
           o_orderkey, o_orderstatus, o_totalprice
    FROM ({ORACLE_FILTER_PREDICATES}) f
    """,
)
def p_project_filter(spark, sf_dir):
    """Round-11 slice-merge of ``p_project_dates`` +
    ``p_filter_predicates`` (both re-registered verbatim past the
    window in ``plans.probes``), freeing a first-50 slot for the
    round-10-continuation flagships. 'proj'/'dates' slices — P1-P6 +
    F5/F7/F11 projection shapes; 'filter' slice — S4 + P7-P10, every
    predicate class pushed to the parquet scan (PushedFilters
    plan-gated in ``tests/test_plans.py`` under the tail name).
    Disjoint scan legs null-padded to one schema."""
    proj = p_project_dates_impl(spark, sf_dir).select(
        "slice", "part_id", "name_norm", "size_l", "price_tenth",
        "discount_rate", "order_year", "order_month", "n_orders",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    filt = p_filter_predicates_impl(spark, sf_dir).select(
        F.lit("filter").alias("slice"),
        F.lit(None).cast("bigint").alias("part_id"),
        F.lit(None).cast("string").alias("name_norm"),
        F.lit(None).cast("bigint").alias("size_l"),
        F.lit(None).cast("double").alias("price_tenth"),
        F.lit(None).cast("double").alias("discount_rate"),
        F.lit(None).cast("int").alias("order_year"),
        F.lit(None).cast("int").alias("order_month"),
        F.lit(None).cast("bigint").alias("n_orders"),
        "o_orderkey", "o_orderstatus", "o_totalprice",
    )
    return proj.unionByName(filt)


def p_project_dates_impl(spark, sf_dir):
    """Round-7 slice-merge of ``p_project_rename_cast`` +
    ``p_derived_date_parts`` (both re-registered verbatim past the
    window in ``plans.probes``), freeing a first-50 slot for
    ``g_pagerank_fixed`` per the established rotation discipline.
    'proj' slice — P1-P5 + F7 + F11: rename, normalize, cast,
    arithmetic rescale (the reference's ``TG/10`` at
    ``apps/process_weather.py:91``) and a typed-null pad
    (``apps/process_listings_hosts.py:90-95``). 'dates' slice —
    P6/F5: year/month derivation (the reference's partition-key
    columns, ``apps/preprocess_data.py:92,102,112``) + a count per
    derived part. Disjoint tables (part / orders), so the union is
    two independent scan-stage legs null-padded to a common schema."""
    (part,) = load(spark, sf_dir, "part")
    projected = part.select(
        F.lit("proj").alias("slice"),
        F.col("p_partkey").alias("part_id"),
        F.lower("p_name").alias("name_norm"),
        F.col("p_size").cast("bigint").alias("size_l"),
        (F.col("p_retailprice") / 10).cast("decimal(18,4)").cast("double").alias(
            "price_tenth"
        ),
    )
    proj = with_typed_nulls(
        projected,
        {
            "discount_rate": "double",
            "order_year": "int",
            "order_month": "int",
            "n_orders": "bigint",
        },
    )
    (orders,) = load(spark, sf_dir, "orders")
    dates = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.lit("dates").alias("slice"),
            F.lit(None).cast("bigint").alias("part_id"),
            F.lit(None).cast("string").alias("name_norm"),
            F.lit(None).cast("bigint").alias("size_l"),
            F.lit(None).cast("double").alias("price_tenth"),
            F.lit(None).cast("double").alias("discount_rate"),
            "order_year",
            "order_month",
            "n_orders",
        )
    )
    return proj.unionByName(dates)


def p_filter_predicates_impl(spark, sf_dir):
    """S4 + P7-P10 (absorbs the former ``s_parquet_scan_prune`` row —
    same scan-pruning semantics, one driver slot): the projection
    prunes to 3 of 6 columns (ReadSchema) and every predicate —
    literal equality, IN-list, range, timestamp cut, null guard —
    reaches the parquet scan (PushedFilters; asserted in
    ``tests/test_plans.py``). Reference filter/scan sites
    ``apps/preprocess_data.py:95``, ``apps/process_weather.py:98``,
    ``apps/process_reviews.py:134-138``,
    ``apps/process_listings_hosts.py:87``."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderdate") > F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "p_null_pad_align_union",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_mktsegment,
           CAST(NULL AS DOUBLE) AS c_acctbal
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
    ``apps/process_listings_hosts.py:97,111,120``). Side A's key is
    deliberately narrowed to INT so the union must also widen
    int→bigint — the missing-column typing AND type-widening edge
    cases §7.4 flags, both oracle-checked (result key is BIGINT)."""
    (customer,) = load(spark, sf_dir, "customer")
    narrow_a = customer.filter(F.col("c_nationkey") < 10).select(
        F.col("c_custkey").cast("int").alias("c_custkey"), "c_name", "c_mktsegment"
    )
    narrow_b = customer.filter(F.col("c_nationkey") >= 10).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    padded_a = with_typed_nulls(narrow_a, {"c_acctbal": "double"})
    unioned = align_union(padded_a, narrow_b)
    assert dict(unioned.dtypes)["c_custkey"] == "bigint", "union must widen int→bigint"
    return unioned.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "u_three_way_union",
    oracle="""
    SELECT 'reunion' AS slice, l_orderkey AS k1,
           CAST(l_linenumber AS BIGINT) AS k2, 'returned' AS tag
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT 'reunion', l_orderkey, CAST(l_linenumber AS BIGINT), 'accepted'
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT 'reunion', l_orderkey, CAST(l_linenumber AS BIGINT), 'n/a'
    FROM lineitem WHERE l_returnflag NOT IN ('R','A')
    UNION ALL
    SELECT 'setops', CAST(nationkey AS BIGINT), CAST(NULL AS BIGINT), 'both'
    FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT
          SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'setops', CAST(nationkey AS BIGINT), CAST(NULL AS BIGINT), 'customer_only'
    FROM (SELECT c_nationkey AS nationkey FROM customer EXCEPT
          SELECT s_nationkey FROM supplier)
    """,
)
def u_three_way_union(spark, sf_dir):
    """U2 + the intersect/except surface extension (absorbs the former
    ``u_intersect_except`` row — slice-tagged so both keep a driver
    check in one slot). 'reunion' slices: the reference's
    partition-transform-reunion — split on a predicate, apply a
    different transform per slice, reassemble
    (``apps/process_reviews.py:137-140``: non-en ∪ scored-en ∪
    null-language with 'n/a' fill). 'setops' slices: nations present
    in both customer and supplier vs customer-only (SURVEY.md §2.7
    notes the reference has no intersect/except; free in Spark —
    ``subtract`` = EXCEPT DISTINCT set semantics, like the oracle)."""
    li, customer, supplier = load(spark, sf_dir, "lineitem", "customer", "supplier")
    base = li.select(
        F.lit("reunion").alias("slice"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        "l_returnflag",
    )
    returned = base.filter(F.col("l_returnflag") == "R").withColumn(
        "tag", F.lit("returned")
    )
    accepted = base.filter(F.col("l_returnflag") == "A").withColumn(
        "tag", F.lit("accepted")
    )
    other = base.filter(~F.col("l_returnflag").isin("R", "A")).withColumn(
        "tag", F.lit("n/a")
    )
    cust = customer.select(F.col("c_nationkey").alias("nationkey"))
    supp = supplier.select(F.col("s_nationkey").alias("nationkey"))
    setops = []
    for df, tag in ((cust.intersect(supp), "both"),
                    (cust.subtract(supp), "customer_only")):
        setops.append(
            df.select(
                F.lit("setops").alias("slice"),
                F.col("nationkey").cast("bigint").alias("k1"),
                F.lit(None).cast("bigint").alias("k2"),
                F.lit(tag).alias("tag"),
            )
        )
    slices = [s.select("slice", "k1", "k2", "tag")
              for s in (returned, accepted, other)] + setops
    return align_union(*slices)


@register(
    "f_string_date_functions",
    oracle="""
    WITH compact AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
             strftime(o_orderdate, '%Y%m%d') AS ymd
      FROM orders
    )
    SELECT o_orderkey,
           concat_ws('_', o_orderstatus, CAST(o_custkey AS VARCHAR)) AS status_key,
           upper(substr(o_orderpriority, 1, 8)) AS prio_prefix,
           CAST(CAST(o_totalprice / 10 AS DECIMAL(18,4)) AS DOUBLE) AS price_tenth,
           CASE WHEN o_totalprice < 50000 THEN 'small' ELSE 'large' END AS size_class,
           length(o_orderpriority) AS prio_len,
           ymd,
           CAST(strptime(ymd, '%Y%m%d') AS DATE) AS parsed_date,
           CAST(EXTRACT(year FROM strptime(ymd, '%Y%m%d')) AS INT) AS y
    FROM compact
    WHERE CAST(strptime(ymd, '%Y%m%d') AS DATE) > DATE '1998-01-01'
    """,
)
def f_string_date_functions(spark, sf_dir):
    """F1/F6/F7/F8/F11 + P10 scalar-function surface in one wide
    projection: the surrogate-key ``concat_ws`` (reference
    ``weather_id = concat(city,'_',date)``,
    ``apps/process_reviews.py:111``), substring/upper, arithmetic
    rescale, CASE, length, AND the compact-date round-trip
    (``to_date(col,'yyyyMMdd')``, the ECA&D weather dates at
    ``apps/process_weather.py:91,98``) with the date-range predicate
    over the parsed value. All scan-stage expressions — zero
    shuffles."""
    (orders,) = load(spark, sf_dir, "orders")
    compact = orders.withColumn(
        "ymd", F.date_format("o_orderdate", "yyyyMMdd")
    ).withColumn("parsed_date", F.to_date("ymd", "yyyyMMdd"))
    return compact.filter(
        F.col("parsed_date") > F.lit("1998-01-01").cast("date")
    ).select(
        "o_orderkey",
        F.concat_ws(
            "_", F.col("o_orderstatus"), F.col("o_custkey").cast("string")
        ).alias("status_key"),
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_prefix"),
        (F.col("o_totalprice") / 10).cast("decimal(18,4)").cast("double").alias(
            "price_tenth"
        ),
        F.when(F.col("o_totalprice") < 50000, "small").otherwise("large").alias(
            "size_class"
        ),
        F.length("o_orderpriority").alias("prio_len"),
        "ymd",
        "parsed_date",
        F.year("parsed_date").alias("y"),
    )


ORACLE_UNION_DEDUP_MERGE = """
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
"""


def u_union_dedup_merge_impl(spark, sf_dir):
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




# CDC change feed synthesized deterministically from the customer
# snapshot itself, shared by both engines: two update waves, a delete
# wave, and an insert wave with disjoint new keys. A key can appear in
# several waves (e.g. %15 hits both the %5 update and the delete), so
# the query exercises real latest-wins folding, not just disjoint ops.
_CDC_PAYLOAD = "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"


ORACLE_MERGE_APPLY_CDC = f"""
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey, 0.0 AS c_acctbal,
             'STALE' AS c_mktsegment, 1 AS seq, 'U' AS op
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0,
             'FRESH', 2, 'U'
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT {_CDC_PAYLOAD}, 3, 'D'
      FROM customer WHERE c_custkey % 15 = 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal,
             'INSERTED', 1, 'I'
      FROM customer WHERE c_custkey % 25 = 0
    ), latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY seq DESC, op DESC) AS rn
        FROM changes) WHERE rn = 1
    )
    SELECT {_CDC_PAYLOAD} FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
    UNION ALL
    SELECT {_CDC_PAYLOAD} FROM latest WHERE op <> 'D'
"""


def u_merge_apply_cdc_impl(spark, sf_dir):
    """MERGE INTO semantics (``operators.merge.apply_cdc``, warehouse
    extension of the reference's append-only monthly merge,
    ``apps/process_reviews.py:146-148``): a synthesized I/U/D change
    feed folds into the customer snapshot — latest change per key wins
    (seq desc, op desc tie-break), a winning delete drops the row,
    winning upserts replace the payload, untouched keys pass through.
    Scale shape: the change feed (delta-sized in production) is the
    only windowed input; the snapshot is touched once by a keyed
    anti-join — AQE picks broadcast when the folded feed is small."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        apply_cdc,
    )

    (customer,) = load(spark, sf_dir, "customer")
    payload = customer.columns
    changes = (
        customer.filter("c_custkey % 5 = 0")
        .select(
            "c_custkey", "c_name", "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            F.lit("STALE").alias("c_mktsegment"),
            F.lit(1).alias("seq"), F.lit("U").alias("op"),
        )
        .unionByName(
            customer.filter("c_custkey % 10 = 0").select(
                "c_custkey", "c_name", "c_nationkey",
                (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
                F.lit("FRESH").alias("c_mktsegment"),
                F.lit(2).alias("seq"), F.lit("U").alias("op"),
            )
        )
        .unionByName(
            customer.filter("c_custkey % 15 = 0").select(
                *payload, F.lit(3).alias("seq"), F.lit("D").alias("op")
            )
        )
        .unionByName(
            customer.filter("c_custkey % 25 = 0").select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal",
                F.lit("INSERTED").alias("c_mktsegment"),
                F.lit(1).alias("seq"), F.lit("I").alias("op"),
            )
        )
    )
    return apply_cdc(customer, changes, ["c_custkey"], "seq", "op")


# ----- round-10 continuation window rotation ------------------------------
#
# u_union_dedup_merge + u_merge_apply_cdc slice-merge into
# u_union_cdc_merge for the driver's 50-row window (both originals
# re-register verbatim, with their oracles, past the window in
# plans.probes) — the freed slot records the round-10-continuation
# conditional-MERGE flagship in plans.curation.

ORACLE_UNION_CDC_MERGE = f"""
WITH ud AS ({ORACLE_UNION_DEDUP_MERGE}),
ac AS ({ORACLE_MERGE_APPLY_CDC})
SELECT 'union_dedup' AS slice, o_orderkey AS key,
       o_orderstatus AS s1, CAST(NULL AS VARCHAR) AS s2,
       CAST(o_totalprice AS DOUBLE) AS num1,
       CAST(o_custkey AS BIGINT) AS num2, o_orderdate AS dt
FROM ud
UNION ALL
SELECT 'apply_cdc', c_custkey, c_name, c_mktsegment,
       CAST(c_acctbal AS DOUBLE), CAST(c_nationkey AS BIGINT),
       CAST(NULL AS TIMESTAMP)
FROM ac
"""


@register("u_union_cdc_merge", oracle=ORACLE_UNION_CDC_MERGE)
def u_union_cdc_merge(spark, sf_dir):
    """The two warehouse merge signatures in one window slot,
    slice-tagged (round-10 rotation; both originals re-registered
    verbatim past the window with their oracles):

    'union_dedup' — U1 + A9 + W1, the reference's core
    incremental-merge semantics (snapshot ∪ overlapping delta →
    newest row per key; ``apps/process_reviews.py:146-148``).

    'apply_cdc' — MERGE INTO semantics over a synthesized I/U/D
    change feed (latest change per key wins, winning deletes drop,
    untouched keys pass through; the warehouse extension of the
    reference's append-only monthly merge)."""
    a = u_union_dedup_merge_impl(spark, sf_dir).select(
        F.lit("union_dedup").alias("slice"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("o_totalprice").cast("double").alias("num1"),
        F.col("o_custkey").cast("bigint").alias("num2"),
        F.col("o_orderdate").alias("dt"),
    )
    b = u_merge_apply_cdc_impl(spark, sf_dir).select(
        F.lit("apply_cdc").alias("slice"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("s1"),
        F.col("c_mktsegment").alias("s2"),
        F.col("c_acctbal").cast("double").alias("num1"),
        F.col("c_nationkey").cast("bigint").alias("num2"),
        F.lit(None).cast("timestamp").alias("dt"),
    )
    return a.unionByName(b)
