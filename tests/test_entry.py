"""Driver-contract smoke: entry() flagship, catalog key discipline."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_attr", "num_entities"}


def test_oracle_keys_subset_of_queries(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # The r1/r2 driver recorded rows for the first 50 entries only, so
    # all coverage must sit inside the first 50; entries 51+ are the
    # cap-probe re-registrations (plans.probes).
    names = list(q)
    assert len(names) == 162
    # round-4 rotation: t_tfidf_topk and u_merge_apply_cdc moved inside
    # the driver's 50-row window (t_language_share folded into
    # n_language_detect, j_inner_composite_key into
    # j_windowed_subquery_using — both re-registered at the tail).
    # round-5 rotation: r_bm25_search, t_unigram_lm_score and
    # d_repeated_spans moved inside the window (d_simhash_near_dup
    # folded into d_minhash_dup_clusters, c_sample_mix into
    # c_pack_sequences, m_binary_frames + m_feature_extract into
    # m_multimodal_pipeline — all four originals re-registered
    # verbatim at the tail, m_binary_frames keeping its oracle).
    # round-6 rotation: the rows-only a_approx_sketches and
    # s_ann_methods moved past the window (re-registered verbatim at
    # the tail); the oracle-checked c_dsir_select and
    # q5_local_supplier_volume took the freed slots (window positions
    # 47/48, keeping d_decontaminate/c_pack_sequences at 49/50).
    # round-7 rotation: e_watermark_dedup + e_json_extraction folded
    # into e_watermark_json and p_project_rename_cast +
    # p_derived_date_parts into p_project_dates (all four originals
    # re-registered verbatim at the tail); the freed slots record the
    # round-6 flagships a_heavy_hitters_ledger (full bound-algebra
    # oracle) and g_pagerank_fixed (full rank-vector oracle) at window
    # positions 49/50.
    # round-9 rotation: the window is now 50/50 oracle-checked — the
    # rows-only d_minhash_dup_clusters, s_near_dup_lsh_blocked,
    # m_multimodal_pipeline and c_pack_sequences moved past the window
    # (re-registered verbatim at the tail; every family keeps an
    # oracle-checked window representative), j_range_join + j_asof_join
    # slice-merged into j_range_asof (originals re-registered at the
    # tail), d_decontaminate gained a full value-hash oracle in place,
    # and the freed slots record the round-8 flagships g_triangle_count,
    # l_bloom_point_lookup, d_cluster_best_pick, g_personalized_pagerank
    # plus the returning oracle-checked m_binary_frames.
    for must_have in (
        "d_decontaminate",
        "t_tfidf_topk",
        "r_bm25_search", "t_unigram_lm_score", "d_repeated_spans",
        "c_dsir_select", "q5_local_supplier_volume",
        # round-12 rotation: a_heavy_hitters_ledger + a_hll_native_ledger
        # slice-merged into a_sketch_ledgers (window slot 37) so the
        # round-11 flagship register HLL gains a hard CORRECTNESS row;
        # both originals re-registered verbatim at the tail.
        "a_sketch_ledgers",
        "w_frames_ranks", "j_range_asof",
        "g_triangle_count",
        "d_cluster_best_pick",
        "m_binary_frames",
        # round-11 rotation: six slice-merges (a_collect_set_join into
        # w_latest_snapshot_per_key's 'segments' slice;
        # j_anti_semi_cohorts + j_delta_scalar_subquery into
        # j_anti_delta; p_project_dates + p_filter_predicates into
        # p_project_filter; e_time_windows + e_watermark_json into
        # e_stream_shapes — all five SS2.10 streaming shapes in one
        # window row; d_ngram_jaccard_pairs + d_jaccard_prefix_filter
        # into d_jaccard_suite; g_pagerank_fixed +
        # g_personalized_pagerank into g_pagerank_suite; all eleven
        # originals re-registered verbatim at the tail) freed the
        # slots for the round-10-continuation flagships (moved into
        # plans.flagships) and the composite-key facade flagship.
        "j_anti_delta", "p_project_filter", "e_stream_shapes",
        "d_jaccard_suite", "g_pagerank_suite",
        "a_weighted_hitters", "u_cdc_asof_changes",
        "e_resample_interpolate", "a_dq_report", "f_variant_json",
        "l_composite_key_merge",
        # round-10 rotation: a_rollup_cube + a_pivot_unpivot folded
        # into a_cube_pivot and s_knn_bruteforce + s_embedding_near_dup
        # into s_knn_near_dup (all four originals re-registered
        # verbatim at the tail); the freed slots record the round-9
        # deletion-vector flagship u_delete_vectors (rotated in from
        # position 140) and the round-10 unified-facade flagship
        # l_table_facade_read (pointer + zone/bloom pruning + CDC fold
        # + filter law in one read).
        "a_cube_pivot", "s_knn_near_dup",
        "u_delete_vectors", "l_table_facade_read",
        # round-10 continuation rotation: l_zone_pruned_agg +
        # l_bloom_point_lookup folded into l_skipping_pruned and
        # u_union_dedup_merge + u_merge_apply_cdc into
        # u_union_cdc_merge (all four originals re-registered verbatim
        # at the tail with their oracles); the freed slots record the
        # conditional-MERGE and schema-evolution flagships.
        "l_skipping_pruned", "u_union_cdc_merge",
        "u_merge_conditional", "l_schema_evolution_read",
    ):
        assert must_have in names[:50]
    # every window entry is oracle-checked (50 green driver rows)
    assert all(n in o for n in names[:50]), [
        n for n in names[:50] if n not in o
    ]
    # new extension queries first, then the cap-probe re-registrations
    # tail order after the round-9 rotation (comment history for the
    # earlier rounds lives in plans/__init__.py and git)
    assert names[50:] == [
        "t_pii_redact",
        "t_repetition_profile",
        "c_chunk_documents",
        "t_vocab_topk",
        "e_interval_attribution",
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
        "a_grouped_quantiles",
        "c_weighted_sample",
        "q3_shipping_priority",
        "t_boilerplate_strip",
        "c_budget_select",
        "s_semdedup",
        "t_bigram_lm_score",
        "d_embedding_decontaminate",
        "q10_returned_items",
        "q18_large_orders",
        "s_text_semdedup",
        "t_bpe_merges",
        "t_data_card",
        "t_quality_classifier",
        "t_url_curation",
        "c_temperature_rebalance",
        "u_snapshot_diff",
        "d_strip_repeated_spans",
        "c_cluster_safe_split",
        "q16_supplier_relation",
        "q21_waiting_supplier",
        "g_bfs_reachability",
        "r_hybrid_rrf",
        "q14_promo_effect",
        "q19_disjunctive_filter",
        "w_range_interval_frame",
        "t_language_share",
        "j_inner_composite_key",
        "d_simhash_near_dup",
        "c_sample_mix",
        "m_feature_extract",
        "s_ivf_persisted_index",
        "c_unimax_budget",
        "a_hll_ledger",
        "a_drift_report",
        "j_record_linkage",
        "a_quantile_ledger",
        "c_bottomk_sample",
        "q17_small_qty_revenue",
        "q22_idle_customers",
        "q13_customer_distribution",
        "q20_part_promotion",
        "q2_min_cost_supplier",
        "q15_top_supplier",
        "a_segment_overlap",
        "q7_volume_shipping",
        "q8_market_share",
        "q4_priority_check",
        "q6_forecast_revenue",
        "q9_product_profit",
        "r_mmr_rerank",
        "a_approx_sketches",
        "s_ann_methods",
        "q11_important_stock",
        "q12_shipping_priority_class",
        "e_watermark_dedup",
        "e_json_extraction",
        "p_project_rename_cast",
        "p_derived_date_parts",
        "e_windowed_quantiles",
        "g_kcore_extract",
        "w_moving_frames",
        "w_rank_lag_lead",
        "e_tumbling_sliding",
        "e_session_window",
        "c_outlier_filter",
        "d_minhash_dup_clusters",
        "s_near_dup_lsh_blocked",
        "m_multimodal_pipeline",
        "c_pack_sequences",
        "j_range_join",
        "j_asof_join",
        "l_combined_pruned_lookup",
        "u_cdc_table_read",
        "t_lm_subtract",
        "a_rollup_cube",
        "a_pivot_unpivot",
        "s_knn_bruteforce",
        "s_embedding_near_dup",
        "l_zone_pruned_agg",
        "l_bloom_point_lookup",
        "u_union_dedup_merge",
        "u_merge_apply_cdc",
        "a_collect_set_join",
        "j_anti_semi_cohorts",
        "j_delta_scalar_subquery",
        "p_project_dates",
        "p_filter_predicates",
        "e_time_windows",
        "e_watermark_json",
        "d_ngram_jaccard_pairs",
        "d_jaccard_prefix_filter",
        "g_pagerank_fixed",
        "g_personalized_pagerank",
        "a_heavy_hitters_ledger",
        "a_hll_native_ledger",
        "c_epoch_shards",
    ]


def test_queries_run_at_smallest_sf(spark):
    q = entrymod.queries()
    # spot-run one per family through the public dict
    for name in ["q1_pricing_summary", "w_latest_snapshot_per_key",
                 "n_language_detect", "e_tumbling_sliding"]:
        assert q[name](spark, SF_DIR).count() > 0


def test_coverage_doc_names_match_catalog():
    """Every catalog-query-shaped name in COVERAGE.md and every bench
    HEADLINE entry must exist in the registered catalog — guards docs
    and bench against consolidation drift."""
    import os
    import re

    import bench

    q = entrymod.queries()
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    text = open(os.path.join(repo, "COVERAGE.md")).read()
    # query ids look like <family>_<words>; column names are the only
    # other backticked tokens with that shape
    column_names = {
        "o_orderdate", "o_custkey", "o_orderkey", "o_orderpriority",
        "o_totalprice", "c_custkey", "c_acctbal", "l_quantity",
        # round-6 retired cap probes: documented in COVERAGE.md as
        # unregistered plan-gate helpers, deliberately not in the
        # catalog anymore
        "s_parquet_scan_prune", "o_topk_sort_limit", "u_intersect_except",
    }
    families = ("q1_", "a_", "p_", "j_", "w_", "n_", "t_", "d_", "s_",
                "e_", "m_", "u_", "o_", "f_")
    mentioned = {
        m
        for m in re.findall(r"`([a-z0-9_]+)`", text)
        if m.startswith(families) and m not in column_names
    }
    stale = sorted(mentioned - set(q))
    assert not stale, f"stale names in COVERAGE.md: {stale}"
    missing_bench = [n for n in bench.HEADLINE if n not in q]
    assert not missing_bench, f"bench names missing from catalog: {missing_bench}"


@pytest.mark.slow
def test_no_canonicalizer_hazardous_output_columns(spark):
    """No catalog query may emit array/struct/map/binary columns: the
    driver's pandas canonicalizer cannot sort/hash them (the round-1
    a_approx_sketches / m_feature_extract failure class). Schemas are
    resolved at sf0.001; lazy queries never execute."""
    q = entrymod.queries()
    hazards = []
    for name, fn in q.items():
        df = fn(spark, SF_DIR)
        hazards += [
            (name, col, dtype)
            for col, dtype in df.dtypes
            if any(k in dtype for k in ("array", "struct", "map", "binary"))
        ]
    assert not hazards, f"unhashable catalog outputs: {hazards}"


def test_cache_fingerprint_tracks_engine_code(tmp_path):
    """Round-12 directive: cached .tmp/ artifacts must invalidate
    STRUCTURALLY when the engine code that builds them changes —
    editing a byte of the facade source must change the fingerprint
    (round 11 relied on a hand-bumped CACHE_SCHEMA_V)."""
    import os
    import shutil

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import catalog

    pkg_sources = os.path.join(
        os.path.dirname(os.path.abspath(catalog.__file__)),
        "..", "sources",
    )
    copy = tmp_path / "sources"
    shutil.copytree(pkg_sources, copy)
    h0 = catalog.engine_code_hash(str(copy))
    # the real default hash matches a faithful copy (path-independent)
    assert h0 == catalog.engine_code_hash()

    with open(copy / "table.py", "a") as fh:
        fh.write("\n# one-byte-class edit\n")
    h1 = catalog.engine_code_hash(str(copy))
    assert h1 != h0

    # and the fingerprint actually folds the hash in: flip the cached
    # module-level hash and the same data dir fingerprints differently
    data = tmp_path / "data"
    data.mkdir()
    (data / "x.parquet").write_bytes(b"stub")
    fp0 = catalog.cache_fingerprint(str(data))
    old = catalog._CODE_HASH
    try:
        catalog._CODE_HASH = h1
        fp1 = catalog.cache_fingerprint(str(data))
    finally:
        catalog._CODE_HASH = old
    assert fp0 != fp1
