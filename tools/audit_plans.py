"""Regenerate the PLANS.md shuffle/join audit table and gate the
scale invariants.

Usage: python tools/audit_plans.py [sf_dir]
Prints a markdown table of per-query physical-plan facts, then checks
the permanent plan invariants (same rules as tests/test_plans.py) and
exits nonzero if any is violated:

- no broadcast HINT over a corpus-derived frame in the dedup /
  similarity family (AQE choosing broadcast from observed sizes is
  fine; a hint pins the choice at any scale),
- no Exchange SinglePartition in the dedup/similarity/curation family,
- ann_topk_lsh's candidate dedup carries no vector columns,
- catalog-wide (every benched query, round 14): every
  ``Exchange SinglePartition`` feeds from a PARTIAL AGGREGATE (its
  rows are per-partition partial states — a handful of rows at any
  data scale) or from a frame on the explicit tiny-by-construction
  exemption list. This is the precise form of the round-13 "zero
  SinglePartition" claim: global scalar aggregates (bm25/dsir/rrf
  stats) legitimately carry the standard partial→final single
  partition hop; what must never exist is a SinglePartition exchange
  carrying DATA-SIZED rows.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

AUDITED = [
    "q1_pricing_summary",
    "a_nested_histogram",
    "u_union_dedup_merge",
    "w_latest_snapshot_per_key",
    "j_broadcast_chain_dims",
    "j_windowed_subquery_using",
    "j_asof_join",
    "d_exact_dedup",
    "d_simhash_near_dup",
    "s_near_dup_lsh_blocked",
    "w_ntile_percentiles",
    "s_knn_bruteforce",
    "n_sentiment_selective",
    "e_session_window",
    "d_decontaminate",
    "c_sample_mix",
    "c_pack_sequences",
    "c_chunk_documents",
    "t_vocab_topk",
    "u_merge_apply_cdc",
    "w_scd2_intervals",
    "j_skew_salted",
    "c_group_sample_topk",
    "e_funnel_steps",
    "e_retention_cohorts",
    "d_edit_distance_pairs",
    "a_incremental_state_merge",
    "e_resample_ffill",
    "w_cumulative_distinct",
    "j_point_in_time",
    "t_tfidf_topk",
    "t_unigram_lm_score",
    "t_bigram_lm_score",
    "t_boilerplate_strip",
    # c_budget_select's one SinglePartition exchange is the ≤n_buckets
    # offsets frame (tiny by construction) — audited for the table,
    # exempt from the SinglePartition gate like t_tfidf_topk's scalar
    "c_budget_select",
    # d_embedding_decontaminate broadcasts its held-out side by
    # CONTRACT (benchmark-sized, same exemption as d_decontaminate)
    "d_embedding_decontaminate",
    "e_interval_attribution",
    # round-4 cont.: spans stay fingerprint/doc-keyed; BM25's one
    # SinglePartition is the 1-row (n_docs, avgdl) scalar (exempt);
    # snapshot diff is one co-partitioned full-outer join
    "d_repeated_spans",
    "d_strip_repeated_spans",
    "r_bm25_search",
    "u_snapshot_diff",
    "c_temperature_rebalance",
    # closing round-4 batch: hybrid fusion (query-bounded frames), the
    # TPC-H shape probes, and BFS (iterative; audited for the table)
    "r_hybrid_rrf",
    "q14_promo_effect",
    "q16_supplier_relation",
    "q21_waiting_supplier",
    # round-5: merged window slots + the new ledger/report/serving ops
    # (unimax/drift/budget carry dim-sized single-partition frames by
    # design — audited for the table, exempt from the gate like
    # t_tfidf_topk's scalar)
    "d_minhash_dup_clusters",
    "m_multimodal_pipeline",
    "s_ivf_persisted_index",
    "c_unimax_budget",
    "a_hll_ledger",
    "a_drift_report",
    # round-6: the ledger-family additions (quantile/bottom-k/heavy-
    # hitters/segment-overlap — overlap's pair join is an explicit
    # broadcast over the segment-count frame, bounded by contract),
    # record linkage, and the new TPC-H planning shapes (q22/q15/q6
    # carry 1-row stats frames — exempt like t_tfidf_topk's scalar)
    "j_record_linkage",
    "a_quantile_ledger",
    "c_bottomk_sample",
    "a_heavy_hitters_ledger",
    "a_segment_overlap",
    "g_pagerank_fixed",
    "q13_customer_distribution",
    "q20_part_promotion",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q22_idle_customers",
    "q7_volume_shipping",
    "q8_market_share",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q9_product_profit",
    # round-7: the canon-completing TPC-H shapes (q11's global total is
    # a 1-row stats frame — exempt like q15's scalar) and the two
    # rotation slice-merges
    "q11_important_stock",
    "q12_shipping_priority_class",
    "e_watermark_json",
    "p_project_dates",
    "a_weighted_hitters",
    "e_windowed_quantiles",
    # round-8: prefix-filtered Jaccard (corpus-sized both sides — also
    # hint/SinglePartition-gated below), triangle counting (degree
    # frame is dim-sized; AQE may broadcast it, no hint pins it), and
    # the zone-map pruned scan (metadata-plane prune + one keyed agg
    # exchange)
    "d_jaccard_prefix_filter",
    "g_triangle_count",
    "l_zone_pruned_agg",
    "l_bloom_point_lookup",
    "g_kcore_extract",
    "d_cluster_best_pick",
    # round-8 rotation merged slots (each slice keeps its original
    # single-exchange window plan; disjoint tables, no cross-slice
    # exchange)
    "w_frames_ranks",
    "e_time_windows",
    "c_outlier_filter",
    "g_personalized_pagerank",
    # round-10 continuation: the facade DML/read flagships, the
    # interpolation resample (one Window node, plan-gated in
    # tests/test_dq.py), the one-scan DQ report, the VARIANT surface,
    # and the rotation merged window slots
    "u_merge_conditional",
    "l_schema_evolution_read",
    "e_resample_interpolate",
    "a_dq_report",
    "f_variant_json",
    "l_skipping_pruned",
    "u_union_cdc_merge",
    # round-12: the ledger-suite merged slot (each leg keeps its
    # original keyed exchanges), the seeds-quantizer semdedup pair
    # (assignment is scan-stage literal math; the pair join is
    # cell-keyed), the GNB classifier (its one SinglePartition
    # exchange is the 1-row stats aggregate — exempt scalar, same
    # class as t_tfidf_topk), and the epoch-shard manifest (one
    # (shard) window exchange)
    "a_sketch_ledgers",
    "s_semdedup",
    "s_text_semdedup",
    "t_quality_classifier",
    "c_epoch_shards",
]

# Every input corpus-sized → no broadcast hint allowed anywhere in the
# plan (d_decontaminate exempt: held-out side is dim-sized by contract).
NO_HINT = [
    "s_semdedup",
    "s_text_semdedup",
    "d_ngram_jaccard_pairs",
    "d_jaccard_prefix_filter",
    "d_minhash_dup_clusters",
    "d_simhash_near_dup",
    "s_embedding_near_dup",
    "s_near_dup_lsh_blocked",
]

NO_SINGLE_PARTITION = [
    "d_exact_dedup",
    "d_ngram_jaccard_pairs",
    "d_minhash_dup_clusters",
    "d_simhash_near_dup",
    "s_near_dup_lsh_blocked",
    "s_embedding_near_dup",
    "d_decontaminate",
    "c_sample_mix",
    "c_pack_sequences",
    "c_chunk_documents",
    "t_vocab_topk",
    # warehouse/behavior family: everything stays keyed end-to-end
    # (e_funnel_steps and w_cumulative_distinct are exempt — their
    # final frames are per-step/per-day sized by construction)
    "u_merge_apply_cdc",
    "w_scd2_intervals",
    "j_skew_salted",
    "c_group_sample_topk",
    "e_retention_cohorts",
    "d_edit_distance_pairs",
    "a_incremental_state_merge",
    "e_resample_ffill",
    "j_point_in_time",
    "e_interval_attribution",
    "d_repeated_spans",
    "d_strip_repeated_spans",
    "u_snapshot_diff",
    # t_tfidf_topk exempt: its only SinglePartition exchange is the
    # 1-row global doc count broadcast into the IDF (a scalar, same
    # class as e_funnel_steps' per-step frame)
    # round-6 ledger family: builds and folds stay keys-keyed end to
    # end (q22/q15/q6's 1-row stats aggregates are exempt scalars)
    "a_quantile_ledger",
    "c_bottomk_sample",
    "a_heavy_hitters_ledger",
    "a_weighted_hitters",
    "e_windowed_quantiles",
    "a_segment_overlap",
    "g_pagerank_fixed",
    "j_record_linkage",
    "q13_customer_distribution",
    "q20_part_promotion",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q4_priority_check",
    # round-8: everything stays keyed end to end
    "d_jaccard_prefix_filter",
    "g_triangle_count",
    "l_zone_pruned_agg",
    "l_bloom_point_lookup",
    "g_kcore_extract",
    "d_cluster_best_pick",
    "c_outlier_filter",
    "g_personalized_pagerank",
    # round-12: ledger suite + seeds-quantizer semdedup + epoch
    # shards stay keyed end to end (t_quality_classifier exempt: the
    # 1-row GNB stats aggregate is a scalar)
    "a_sketch_ledgers",
    "s_semdedup",
    "s_text_semdedup",
    "c_epoch_shards",
]


# Physical aggregate nodes whose appearance directly under an
# Exchange SinglePartition marks the benign partial→final scalar hop.
_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

# SinglePartition exchanges whose INPUT is not a partial aggregate but
# is tiny by construction — name: (child-line marker, rationale).
# Every entry must name WHY the frame cannot grow with the data.
SINGLE_PARTITION_NONAGG_EXEMPT: dict[str, str] = {
    # c_budget_select: the running-offset frame is ≤ n_buckets rows
    # (bucket list is a config constant), sorted once to assign
    # cumulative offsets.
    "c_budget_select": "offsets frame is <= n_buckets rows by config",
    # w_ntile_percentiles: the single-partition hop carries the
    # per-__bucket count table — rows = the ntile bucket count, a
    # query constant, not data-sized.
    "w_ntile_percentiles": "per-bucket count frame, <= n_tiles rows",
    # c_unimax_budget: every flagged child is keyed by ``lang`` — the
    # per-language count/cap tables the UniMax allocator sorts
    # globally; rows = number of languages (bounded dimension).
    "c_unimax_budget": "per-language cap frames, <= n_languages rows",
}


def single_partition_nonagg(plan: str) -> list[str]:
    """Child lines of every ``Exchange SinglePartition`` node whose
    input is NOT a partial aggregate. The child of a unary Exchange is
    the next line of the tree dump (one indent deeper)."""
    lines = plan.splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if any(a in child for a in _AGG_NODES) and "partial_" in child:
            continue
        bad.append(child.strip()[:100])
    return bad


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-audit")

    _plan_cache: dict[str, str] = {}

    def executed(name: str) -> str:
        if name not in _plan_cache:
            qe = QUERIES[name](spark, sf_dir)._jdf.queryExecution()
            _plan_cache[name] = qe.executedPlan().toString()
        return _plan_cache[name]

    print("| query | shuffles | broadcast joins | sort-merge |")
    print("|---|---|---|---|")
    for name in AUDITED:
        plan = executed(name)
        shuffles = (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        )
        print(
            f"| {name} | {shuffles} | {plan.count('BroadcastHashJoin')} |"
            f" {plan.count('SortMergeJoin')} |"
        )

    violations: list[str] = []
    for name in NO_HINT:
        analyzed = (
            QUERIES[name](spark, sf_dir)._jdf.queryExecution().analyzed().toString()
        )
        if "ResolvedHint" in analyzed:
            violations.append(f"{name}: broadcast hint over corpus-derived frame")
    for name in NO_SINGLE_PARTITION:
        if "Exchange SinglePartition" in executed(name):
            violations.append(f"{name}: Exchange SinglePartition")
    # Catalog-wide SinglePartition payload gate (round 14): every
    # benched query — the same 126-query set plan_shapes.tsv covers.
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    for name in bench.HEADLINE + bench.SIDECAR_ONLY:
        bad = single_partition_nonagg(executed(name))
        if bad and name not in SINGLE_PARTITION_NONAGG_EXEMPT:
            for child in bad:
                violations.append(
                    f"{name}: Exchange SinglePartition over "
                    f"non-aggregated rows ({child})"
                )

    ann = executed("s_ann_methods")
    if "first(qv" in ann or "first(cv" in ann:
        violations.append("s_ann_methods: candidate dedup carries vector columns")
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (emb,) = load(spark, sf_dir, "embeddings")
    lsh_leg = embedding_near_dup_pairs_lsh(
        emb, threshold=0.35, n_planes=4, n_tables=16, dim=64
    )
    if "ResolvedHint" in lsh_leg._jdf.queryExecution().analyzed().toString():
        violations.append(
            "embedding_near_dup_pairs_lsh: broadcast hint over corpus frame"
        )

    if violations:
        print("\nPLAN INVARIANT VIOLATIONS:")
        for v in violations:
            print(f"  - {v}")
        sys.exit(1)
    print("\nplan invariants: OK")


if __name__ == "__main__":
    main()
