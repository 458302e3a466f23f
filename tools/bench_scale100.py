"""100x-scale early warning: time the heaviest corpus chains at sf0.1
AND at a generated sf1-scale corpus (10x the data), one decade above
the per-round bench's sf0.01->sf0.1 slope. A time ratio well past the
10x data ratio flags super-linear work (candidate-pair fan-out growing
faster than the corpus) that the smaller decade can't see.

Usage: python tools/bench_scale100.py  ->  BENCH_SCALE100.json

The sf1 corpus is derived from sf0.1 by 10-way replication that keeps
each replica's internal structure identical to the base while making
replicas mutually UNRELATED - replication must add data, not
duplicates, or the dedup chains would legitimately (and uselessly)
blow up on the planted cross-replica duplication:

- documents: every letter-run token gets a replica-specific letter
  prefix (``regexp_replace(text, '([a-z]+)', '<tag>$1')``) so replica
  vocabularies are DISJOINT - no cross-replica shingle, fingerprint,
  minhash or simhash collisions beyond hash randomness; per-replica
  token statistics match the base corpus exactly. doc_id += k * 1e8
  (clear of the +1e6 planted-twin offset used by the dedup probes).
- embeddings: each replica applies a circular coordinate shift by k
  (a permutation matrix: inner products and norms within a replica
  are EXACTLY preserved, so per-replica neighborhood structure equals
  the base), while shifted copies of correlated vectors decorrelate
  across replicas (expected cosine ~ N(0, 1/64), far under the 0.35
  near-dup threshold). label += k * 1000: 10x labels of constant
  size, the realistic growth mode for label-blocked forms.
- lineitem/orders: l_orderkey/o_orderkey/l_partkey/l_suppkey +=
  k * 1e8 — BOTH graph probes become 10 disjoint copies: the
  order-part bipartite graph (BFS) has no cross-replica edge, and
  the part-supplier trade graph (PageRank) keeps supplier node
  spaces disjoint too — without the l_suppkey offset all replicas
  would share supplier nodes, supplier hubs would get 10x degree,
  and the PageRank scaling chain would measure hub concentration
  instead of the intended identical-per-replica linear growth
  (round-7 ADVICE fix; the probe's +1e7 supplier-node offset stays
  below the k*1e8 replica stride, so node spaces remain disjoint).
  1e8 % 1000 == 0 keeps the BFS seed filter (o_orderkey % 1000 = 0)
  selecting 10x seeds and 1e8 % 50 == 0 keeps the PageRank part
  subset (l_partkey % 50 = 0) at the base proportion. 10x nodes,
  10x seeds, identical per-replica topology: the linear growth mode
  for graphs.
- events: user_id/event_id += k * 1e8 — sessions/attribution join on
  user_id, so replicas never pair; 10x users at constant per-user
  activity, the realistic event-stream growth mode.
- customer: c_custkey += k * max(c_custkey) — a CONTIGUOUS id range,
  deliberately not a sparse 1e8 offset: the linkage probe derives its
  match key from c_custkey arithmetic, and a huge sparse offset would
  pin the key's leading digits per replica (constant blocking pieces
  -> one giant block per replica, a replication artifact, not the
  operator's behavior). Contiguous growth keeps key-piece entropy at
  the base corpus's per-digit diversity.

Ratios are large/small medians of N_RUNS. PASS_RATIO = 13 (linear 10x
+ fixed-overhead headroom); anything past it is flagged super_linear.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAINS = [
    "d_minhash_dup_clusters",
    "s_near_dup_lsh_blocked",
    "d_repeated_spans",
    "r_bm25_search",
    "s_semdedup",
    # round 6: every remaining heavy chain (the r5 sweep caught a real
    # quadratic in its first five targets; these have the same
    # candidate-set / block-population growth risks)
    "g_bfs_reachability",
    "j_record_linkage",
    "r_hybrid_rrf",
    "c_dsir_select",
    "t_bigram_lm_score",
    "t_boilerplate_strip",
    "d_strip_repeated_spans",
    "e_interval_attribution",
    # round 6 additions with their own growth surfaces: the iterative
    # PageRank (node/edge set grows with the corpus; per-round cost
    # must track it linearly) and the heavy-hitters ledger (the
    # (keys, item) exchange is the word-count shape at corpus scale)
    "g_pagerank_fixed",
    "a_heavy_hitters_ledger",
    # round 7: the remaining round-6 ledger/rerank chains (VERDICT r6
    # gap #3) — the quantile ledger's bin-vector exchange over orders,
    # the bottom-k sample's slim-projection window over events, the
    # KMV segment-overlap pair stage (dim-sized by contract, must stay
    # that way as events grow), and MMR's per-query greedy groups
    # (candidate-list-sized; 10x labels must mean 10x groups, not
    # bigger groups)
    "a_quantile_ledger",
    "c_bottomk_sample",
    "a_segment_overlap",
    "r_mmr_rerank",
    # round 7: weighted heavy-hitters (per-item cent sums ride the
    # same (keys, item) word-count exchange — must scale like its
    # unweighted sibling)
    "a_weighted_hitters",
    # round 8: prefix-filtered Jaccard (candidate-pair fan-out is the
    # growth surface — the prefix index must grow with Σ(1−t)·|d|,
    # pairs only within shared-vocabulary replicas), triangle counting
    # (wedge join is Σ out_deg²; the replicated graphs are disjoint so
    # growth must be linear), and the zone-map pruned serving path
    # (metadata prune + kept-file scan; the build is fingerprint-cached
    # after the first run, so the median times SERVING, which is the
    # contract — at 10x data the predicate box selects one replica's
    # users, so the kept-bytes term, not the full scan, must dominate)
    "d_jaccard_prefix_filter",
    "g_triangle_count",
    "l_zone_pruned_agg",
    # round 8: the iterative peel (round count and per-round edge set
    # both grow with the corpus; must stay ~linear like BFS/PageRank)
    "g_kcore_extract",
    # round 9: the composed zone∧bloom serving path (BOTH manifests'
    # keep-set expressions grow with the 10x file count — the
    # metadata plane itself must scale; build fingerprint-cached, the
    # median times serving) and the merge-on-read DELETE (the
    # tombstone anti-join's build side stays delete-sized while the
    # corpus side grows 10x — broadcast must hold)
    "l_combined_pruned_lookup",
    "u_delete_vectors",
    # round 10: the merge-on-read CDC fold (the change-side window
    # must stay change-sized while the data side grows 10x) and the
    # unified facade's composed read (pointer + bulk manifests + tail
    # manifests + fold + re-filter — the whole metadata plane must
    # scale together; build fingerprint-cached, the median times
    # serving)
    "u_cdc_table_read",
    "l_table_facade_read",
    # round-10 continuation: conditional MERGE (the decide join must
    # stay source-bounded while the table grows 10x), the widened-
    # schema composed read (explicit-schema alignment over 10x files),
    # the interpolation resample (grid and window both grow with the
    # key set — per-key cost must stay flat), and the one-scan DQ
    # report (rule count fixed, scan grows linearly)
    "u_merge_conditional",
    "l_schema_evolution_read",
    "e_resample_interpolate",
    "a_dq_report",
]
N_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
PASS_RATIO = 13.0
REPLICAS = 10
# letter-only tags: the corpus tokenizer collapses [^a-z]+, so the
# prefix must survive normalization to keep replica vocabularies apart
TAGS = ["qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh", "qi", "qj"]


def _write_replicated(parts, out_path: str) -> None:
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.repartition(32).write.mode("overwrite").parquet(out_path)


def build_sf1(spark, base_dir: str, out_dir: str) -> None:
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{base_dir}/orders.parquet")
    events = spark.read.parquet(f"{base_dir}/events.parquet")
    cust = spark.read.parquet(f"{base_dir}/customer.parquet")
    max_c = cust.agg({"c_custkey": "max"}).first()[0]
    # contiguous customer offset must keep the %10 subset proportion
    c_off = ((max_c + 9) // 10) * 10
    parts = {t: [] for t in
             ("documents", "embeddings", "lineitem", "orders", "events",
              "customer")}
    for k in range(REPLICAS):
        tag = TAGS[k]
        parts["documents"].append(
            docs.selectExpr(
                f"doc_id + {k} * 100000000 AS doc_id",
                f"regexp_replace(text, '([a-z]+)', '{tag}$1') AS text",
                "lang",
                "source",
                "n_chars",
            )
        )
        parts["embeddings"].append(
            emb.selectExpr(
                f"vec_id + {k} * 100000000 AS vec_id",
                # circular shift by k: element i of the output takes
                # element (i + k) mod 64 of the input (Spark's [] is
                # 0-based, unlike 1-based element_at)
                f"transform(sequence(0, 63), i -> embedding[(i + {k}) % 64])"
                " AS embedding",
                f"label + {k} * 1000 AS label",
            )
        )
        parts["lineitem"].append(
            li.withColumn("l_orderkey", F.expr(f"l_orderkey + {k} * 100000000"))
            .withColumn("l_partkey", F.expr(f"l_partkey + {k} * 100000000"))
            .withColumn("l_suppkey", F.expr(f"l_suppkey + {k} * 100000000"))
        )
        parts["orders"].append(
            orders.withColumn(
                "o_orderkey", F.expr(f"o_orderkey + {k} * 100000000")
            )
        )
        parts["events"].append(
            events.withColumn("event_id", F.expr(f"event_id + {k} * 100000000"))
            .withColumn("user_id", F.expr(f"user_id + {k} * 100000000"))
        )
        parts["customer"].append(
            cust.withColumn("c_custkey", F.expr(f"c_custkey + {k} * {c_off}"))
        )
    for t, ps in parts.items():
        _write_replicated(ps, f"{out_dir}/{t}.parquet")


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = os.path.join(repo, ".tmp", "scale100_sf1")

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    spark = get_spark("scale100")
    tables = ("documents", "embeddings", "lineitem", "orders", "events",
              "customer")
    if not all(
        os.path.isdir(os.path.join(big, f"{t}.parquet")) for t in tables
    ):
        build_sf1(spark, base, big)
    n_small = spark.read.parquet(f"{base}/documents.parquet").count()
    n_big = spark.read.parquet(f"{big}/documents.parquet").count()

    def time_one(name: str, at_dir: str) -> float:
        runs = []
        for _ in range(N_RUNS):
            t = time.perf_counter()
            QUERIES[name](spark, at_dir).count()
            runs.append(time.perf_counter() - t)
        med = round(statistics.median(runs), 3)
        print(f"  {name} @ {at_dir}: {med}s", file=sys.stderr)
        return med

    small, bigt, ratio = {}, {}, {}
    for name in CHAINS:
        small[name] = time_one(name, base)
        bigt[name] = time_one(name, big)
        ratio[name] = round(bigt[name] / small[name], 2) if small[name] else None
    out = {
        "metric": "scale100_decade",
        "small_dir": base,
        "big_docs": n_big,
        "small_docs": n_small,
        "data_ratio": round(n_big / n_small, 2),
        "pass_ratio": PASS_RATIO,
        "small_sec": small,
        "big_sec": bigt,
        "time_ratio": ratio,
        "super_linear": [n for n, r in ratio.items() if r and r > PASS_RATIO],
    }
    with open(os.path.join(repo, "BENCH_SCALE100.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
