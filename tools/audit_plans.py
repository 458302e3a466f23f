"""Regenerate the PLANS.md shuffle/join audit table.

Usage: python tools/audit_plans.py [sf_dir]
Prints a markdown table of per-query physical-plan facts.
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
]


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-audit")
    print("| query | shuffles | broadcast joins | sort-merge |")
    print("|---|---|---|---|")
    for name in AUDITED:
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        shuffles = (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        )
        print(
            f"| {name} | {shuffles} | {plan.count('BroadcastHashJoin')} |"
            f" {plan.count('SortMergeJoin')} |"
        )


if __name__ == "__main__":
    main()
