"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: the scan-heavy aggregate (q1), the flagship two-level
histogram, join shapes (broadcast chain, windowed subquery, anti,
range), the merge/window signature ops, text classifiers, dedup and
similarity scale paths, and the event windowing analogs — the queries
whose plans exercise every physical strategy the engine cares about.
Each query executes with a count() action (forces the full plan, no
driver-side result materialization beyond the aggregate).

Each query runs N_RUNS times (fresh DataFrame each run) and reports
the MEDIAN — single-run timings at sf0.1 carry 20-30% noise, which
round 2's round-over-round diff mistook for plan regressions. The
query names are kept stable across rounds so BENCH_r{N}.json diffs
per query.

A "scaling" section — the same queries timed at the sibling sf0.01
directory plus the large/small time ratio per query — is written to
the SIDECAR file BENCH_SCALING.json next to this script, NOT to
stdout: the driver captures only a bounded tail of stdout, and round
4's inline scaling section grew the one JSON line past that capture
(BENCH_r04.json recorded "parsed": null). stdout stays the compact
primary dict. The data grows 10x between the two scaling points, so a
time ratio well past 10 flags super-linear work (e.g. candidate-pair
fan-out growing faster than the corpus) — the 100x-scale early
warning a single measurement point can't see. Ratios below ~3 mean
fixed overhead (session, planning, task launch) still dominates at
sf0.1 — headroom, not sub-linearity. Disable with
SPARK_GRAFT_BENCH_SCALING=0.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-over-round mapping vs BENCH_r01 keys (catalog consolidated to
# 50 entries in round 2): j_anti_new_keys→j_anti_semi_cohorts,
# w_moving_sum_frame→w_moving_frames, t_quality_score→t_text_profile,
# d_minhash_near_dup→d_minhash_dup_clusters (now includes connected
# components), e_tumbling_window→e_tumbling_sliding (now includes the
# sliding hop), a_cube→a_rollup_cube, w_scd2_versions→w_rank_lag_lead.
HEADLINE = [
    "q1_pricing_summary",
    "a_nested_histogram",
    "a_groupby_multi_measure",
    "j_left_enrich_fk",
    "j_broadcast_chain_dims",
    "j_windowed_subquery_using",
    "j_anti_semi_cohorts",
    "j_range_join",
    "j_asof_join",
    "u_union_dedup_merge",
    "w_latest_snapshot_per_key",
    "w_moving_frames",
    "n_language_detect",
    "n_sentiment_selective",
    "t_text_profile",
    "d_exact_dedup",
    "d_minhash_dup_clusters",
    "s_knn_bruteforce",
    "e_tumbling_sliding",
    "e_session_window",
    "a_rollup_cube",
    "a_column_profile",
    "w_rank_lag_lead",
    "s_embedding_near_dup",
    "m_feature_extract",
    # round-2 additions: the repaired sketch query + the new scale paths
    "a_approx_sketches",
    "s_near_dup_lsh_blocked",
    "w_ntile_percentiles",
    # round-3 additions: the curation layer's two heavier chains
    "d_decontaminate",
    "c_pack_sequences",
    # round-3 additions: warehouse merge shapes
    "u_merge_apply_cdc",
    "w_scd2_intervals",
    # round-3 additions: behavioral analytics + entity resolution
    "e_funnel_steps",
    "e_retention_cohorts",
    "d_edit_distance_pairs",
    # round-3 additions: time-series + feature-store + sampling
    "e_resample_ffill",
    "j_point_in_time",
    "a_grouped_quantiles",
    "c_weighted_sample",
    # round-3 additions: the stream-stream interval-join batch analog,
    # the TF-IDF keyword extraction chain, and the TPC-H classic
    # join-planning showcases
    "e_interval_attribution",
    "t_tfidf_topk",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # round-4 additions: corpus-LM quality scoring, chunk-level
    # boilerplate removal, and cluster-blocked semantic dedup
    "t_unigram_lm_score",
    "t_boilerplate_strip",
    "s_semdedup",
    "c_budget_select",
    "t_bigram_lm_score",
    "q10_returned_items",
    "q18_large_orders",
    "t_data_card",
    # round-4 additions (cont.): URL-level web curation and DSIR
    # importance selection
    "t_url_curation",
    "c_dsir_select",
    # round-4 additions (cont.): temperature rebalancing, BM25
    # retrieval, every-offset repeated spans, snapshot diff
    "c_temperature_rebalance",
    "r_bm25_search",
    "d_repeated_spans",
    "d_strip_repeated_spans",
    "u_snapshot_diff",
    "q16_supplier_relation",
    "q21_waiting_supplier",
    "g_bfs_reachability",
    "r_hybrid_rrf",
    # round-5 additions: the merged multimodal window slot and the
    # persisted / partition-pruned ANN serving path (first run builds
    # the on-disk index; the median therefore reports the read path,
    # which is the steady-state cost being benchmarked)
    "m_multimodal_pipeline",
    "s_ivf_persisted_index",
    "c_unimax_budget",
    "a_hll_ledger",
    "a_drift_report",
    "j_record_linkage",
    # round-7 rotation: the 5 cheapest near-duplicate slices
    # (w_range_interval_frame 0.10 s, c_cluster_safe_split 0.19,
    # q19_disjunctive_filter 0.25, q14_promo_effect 0.27,
    # d_embedding_decontaminate 0.31 — every family keeps headline
    # representation via a pricier sibling) moved to the sidecar so
    # the driver-visible total tracks the chains that matter at
    # scale: the full mergeable-ledger family and fixed-point
    # PageRank. Headline stays under the ~1.95 KB stdout guard (the
    # five new names are 17 chars shorter than the five retired).
    "a_quantile_ledger",
    "c_bottomk_sample",
    "a_heavy_hitters_ledger",
    "a_segment_overlap",
    "g_pagerank_fixed",
]

# Median-of-N per query; raise via SPARK_GRAFT_BENCH_RUNS.
N_RUNS = 3

# Round-6 additions, timed in the BENCH_SCALING.json sidecar only:
# the stdout line sits at ~1.94 KB with the 73 stable headline names
# and the driver's capture is bounded — growing the headline would
# push even the 1-dp degrade stage past the guard, so new queries
# accrue here until a rotation frees stdout budget.
SIDECAR_ONLY = [
    "q17_small_qty_revenue",
    "q22_idle_customers",
    "q13_customer_distribution",
    "q20_part_promotion",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q9_product_profit",
    "r_mmr_rerank",
    # round-7 additions
    "q11_important_stock",
    "q12_shipping_priority_class",
    # round-7 extensions
    "a_weighted_hitters",
    "e_windowed_quantiles",
    # round-7 headline retirees (the five cheapest near-duplicate
    # slices, swapped for the ledger family + PageRank — still timed
    # here every round so a regression stays visible)
    "w_range_interval_frame",
    "c_cluster_safe_split",
    "q19_disjunctive_filter",
    "q14_promo_effect",
    "d_embedding_decontaminate",
    # round-8 extensions
    "d_jaccard_prefix_filter",
    "g_triangle_count",
    "l_zone_pruned_agg",
    "l_bloom_point_lookup",
    "g_kcore_extract",
    "d_cluster_best_pick",
    # round-8 rotation merged window slots (their constituent slices
    # stay headline-timed under the original names re-registered at
    # the tail; the merged forms time here)
    "w_frames_ranks",
    "e_time_windows",
    "c_outlier_filter",
    "g_personalized_pagerank",
    # round-9 rotation merged window slot (j_range_join + j_asof_join
    # stay headline-timed under their tail re-registrations)
    "j_range_asof",
    # round-9 extensions: composed zone+bloom pruned read; keyed
    # deletion vectors (merge-on-read DELETE)
    "l_combined_pruned_lookup",
    "u_delete_vectors",
    "u_cdc_table_read",
    "t_lm_subtract",
    # round-10 rotation merged window slots (the constituent slices
    # stay headline-timed under the original names re-registered at
    # the tail; the merged forms time here)
    "a_cube_pivot",
    "s_knn_near_dup",
    # round-10 extensions: the unified Table facade's composed read
    # (pointer + zone/bloom pruning + CDC fold + filter law) and the
    # CDC as-of pin + change-data-feed read
    "l_table_facade_read",
    "u_cdc_asof_changes",
    # round-10 continuation: conditional MERGE INTO + additive schema
    # evolution on the facade (both cached-sidecar builds; the timed
    # path is the composed read)
    "u_merge_conditional",
    "l_schema_evolution_read",
    # round-10 continuation: linear-interpolation resample; the
    # one-scan DQ expectations report
    "e_resample_interpolate",
    "a_dq_report",
    # round-10 continuation rotation merged window slots (constituent
    # slices stay timed under the original names above/in HEADLINE)
    "l_skipping_pruned",
    "u_union_cdc_merge",
    # round-11 rotation merged window slots (constituent slices stay
    # timed under the original names in HEADLINE / above)
    "j_anti_delta",
    "p_project_filter",
    "e_stream_shapes",
    "d_jaccard_suite",
    "g_pagerank_suite",
    # round-11: composite-key facade DML (cached sidecar build; the
    # timed path is the composite-key CDC fold read); engine-native
    # register HLL (full value-hash oracle, unlike the DataSketches
    # form)
    "l_composite_key_merge",
    "a_hll_native_ledger",
]


# Cheap, stable queries used to NORMALIZE a whole run against the
# committed sidecar: the round-8/round-9 failure mode was UNIFORM
# +15-34% inflation on an "idle" host (point-in-time loadavg clean
# both times), which no point-in-time guard can see. Comparing a few
# cheap canaries against their committed BENCH_SCALING.json medians
# yields a run-level drift ratio a later diff can divide out instead
# of chasing ghosts.
CANARIES = ["q1_pricing_summary", "j_left_enrich_fk", "w_moving_frames"]


def drift_ratio(
    current: dict[str, float],
    committed: dict[str, float],
    canaries: list[str] = CANARIES,
) -> float | None:
    """Run-level drift vs the committed sidecar: the MEDIAN of the
    per-canary time ratios current/committed (median, not mean — one
    genuinely regressed canary must not masquerade as uniform host
    drift). None when no canary has a positive committed reference
    (first run, renamed queries)."""
    ratios = [
        current[n] / committed[n]
        for n in canaries
        if n in current and committed.get(n, 0) and committed[n] > 0
    ]
    if not ratios:
        return None
    return round(statistics.median(ratios), 2)


def host_probe_ms(n_threads: int = 32, reps: int = 2000) -> float | None:
    """CPU-contention probe: wall-clock ms for ``n_threads`` threads
    of pure SHA-256 hashing. The shared host's co-tenants are
    INVISIBLE to the guest loadavg (round-13 lesson: identical code
    measured 2-4x apart across sessions with loadavg near zero both
    times), so the loadavg guard above cannot see the dominant noise
    source. This probe can: idle it reads ~30-60 ms on this host
    class; 2x+ that means a co-tenant is live and every timing in the
    run is inflated. Recorded in the BENCH_SCALING.json sidecar (not
    stdout — the contract line is size-guarded) so a later
    round-over-round diff can adjudicate 'regression vs noisy run'
    from the artifact itself."""
    import hashlib
    import threading

    try:
        def work() -> None:
            h = hashlib.sha256(b"x" * 1024)
            for _ in range(reps):
                h.update(h.digest())

        threads = [
            threading.Thread(target=work) for _ in range(n_threads)
        ]
        start = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return round((time.perf_counter() - start) * 1000, 1)
    except Exception:
        return None


def is_contended(load1: float, cpus: int) -> bool:
    """True when the 1-minute load average says another heavy process
    is live on the host. Measured BEFORE this bench's own Spark
    session exists, an idle machine reads near zero; round 8's first
    bench run recorded 132.9 s (8x inflation on cheap queries) purely
    from a co-tenant, and only a manual re-run caught it. Threshold:
    a quarter of the cores busy — far above background jitter, far
    below a competing 32-thread Spark job."""
    return load1 >= max(2.0, cpus / 4)


def read_load1() -> float | None:
    """1-minute load average; None where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Sample load BEFORE the Spark session spins up: after it, the
    # bench's own executors dominate the reading.
    load1 = read_load1()
    probe_before = host_probe_ms()

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    spark = get_spark("bench")
    # Warm the JVM + parquet footers once so timings measure the
    # queries, not session startup.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", N_RUNS))

    # Per-query MIN across the same runs the median is computed from
    # (additions-only, round 14): under asymmetric co-tenant noise the
    # min is the better estimator of the uncontended cost — a noisy
    # run inflates the median but rarely all three repeats equally.
    # Sidecar-only; the stdout contract line keeps the median.
    mins: dict[str, float] = {}

    def time_set(at_dir: str, names: list[str] = HEADLINE) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = QUERIES[name]
            runs = []
            for _ in range(n_runs):
                start = time.perf_counter()
                df = fn(spark, at_dir)
                df.count()
                runs.append(time.perf_counter() - start)
            out[name] = round(statistics.median(runs), 3)
            if at_dir == sf_dir:
                mins[name] = round(min(runs), 3)
        return out

    # committed per-query medians from the PREVIOUS run's sidecar —
    # read BEFORE the scaling section overwrites the file below
    committed: dict[str, float] = {}
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
    )
    try:
        with open(sidecar_path) as fh:
            committed = json.load(fh).get("queries", {})
    except (OSError, ValueError):
        pass

    timings = time_set(sf_dir)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    drift = drift_ratio(timings, committed)
    if drift is not None:
        # run-level normalization factor vs the committed sidecar: a
        # future round's diff divides by this instead of chasing the
        # uniform host inflation the loadavg guard cannot see
        result["drift_vs_sidecar"] = drift
        if drift >= 1.25:
            print(
                f"bench: WARNING canary drift {drift}x vs committed "
                "BENCH_SCALING.json — this run reads uniformly "
                "inflated; normalize by the ratio or re-run idle",
                file=sys.stderr,
            )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))
    if load1 is not None and is_contended(load1, cpus):
        # Loud, machine-readable flag INSIDE the headline line: a
        # co-tenant was running when this bench started, so every
        # timing above is suspect — re-run on an idle host before
        # recording (codifies the round-8 132.9 s near-miss).
        result["contended"] = True
        result["loadavg1"] = load1
        print(
            f"bench: WARNING pre-run loadavg1={load1} on {cpus} cpus — "
            "another heavy process is live; timings are inflated, "
            "re-run idle",
            file=sys.stderr,
        )

    small_dir = os.environ.get(
        "SPARK_GRAFT_BENCH_SCALING_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01"),
    )
    if (
        os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
        and os.path.isdir(small_dir)
        and os.path.abspath(small_dir) != os.path.abspath(sf_dir.rstrip("/"))
    ):
        small = time_set(small_dir)
        extra = time_set(sf_dir, SIDECAR_ONLY)
        extra_small = time_set(small_dir, SIDECAR_ONLY)
        small_sf = small_dir.rstrip("/").rsplit("sf", 1)[-1]
        try:
            data_ratio = float(sf) / float(small_sf)
        except ValueError:
            data_ratio = None
        scaling = {
            "sf": result["sf"],
            "queries": timings,
            # additions-only noise sidecar (round 14): per-query MIN
            # across the same in-process repeats the median line is
            # built from, plus the before/after CPU-contention probe
            # (ms; idle ~30-60 on this host class) — enough to decide
            # from the artifact alone whether a cross-round delta is
            # plan or co-tenant.
            "queries_min": dict(mins),
            "probe_ms_before": probe_before,
            "probe_ms_after": host_probe_ms(),
            "small_sf": float(small_sf)
            if small_sf.replace(".", "").isdigit()
            else small_sf,
            "data_ratio": data_ratio,
            "small_queries": small,
            # time ratio large/small per query: ~data_ratio = linear,
            # << data_ratio = overhead-dominated, >> data_ratio =
            # super-linear (investigate before a 100x scale-up)
            "time_ratio": {
                n: (round(timings[n] / small[n], 2) if small[n] > 0 else None)
                for n in HEADLINE
            },
            # round-6 queries outside the stdout headline (see
            # SIDECAR_ONLY): same median timings + scaling ratios
            "sidecar_queries": extra,
            "sidecar_small_queries": extra_small,
            "sidecar_time_ratio": {
                n: (
                    round(extra[n] / extra_small[n], 2)
                    if extra_small[n] > 0
                    else None
                )
                for n in SIDECAR_ONLY
            },
        }
        # Sidecar, NOT stdout: the driver's stdout capture is bounded
        # and the inline form made round 4's bench line unparseable.
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
        )
        with open(sidecar, "w") as fh:
            json.dump(scaling, fh, indent=1)

    # Compact separators and a size guard: the driver records only a
    # bounded tail of stdout (r04's ~5 KB line came back unparsed), so
    # keep the one line comfortably inside ~2000 chars — degrade
    # per-query precision before ever exceeding it (full 3-dp timings
    # always live in the sidecar).
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1900:
        result["queries"] = {n: round(t, 2) for n, t in timings.items()}
        line = json.dumps(result, separators=(",", ":"))
    if len(line) > 1950:
        result["queries"] = {n: round(t, 1) for n, t in timings.items()}
        line = json.dumps(result, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
