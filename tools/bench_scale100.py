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

Ratios are large/small medians of N_RUNS. PASS_RATIO = 13 (linear 10x
+ fixed-overhead headroom); anything past it is flagged super_linear.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAINS = [
    "d_minhash_dup_clusters",
    "s_near_dup_lsh_blocked",
    "d_repeated_spans",
    "r_bm25_search",
    "s_semdedup",
]
N_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
PASS_RATIO = 13.0
REPLICAS = 10
# letter-only tags: the corpus tokenizer collapses [^a-z]+, so the
# prefix must survive normalization to keep replica vocabularies apart
TAGS = ["qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh", "qi", "qj"]


def build_sf1(spark, base_dir: str, out_dir: str) -> None:
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    doc_parts = []
    emb_parts = []
    for k in range(REPLICAS):
        tag = TAGS[k]
        doc_parts.append(
            docs.selectExpr(
                f"doc_id + {k} * 100000000 AS doc_id",
                f"regexp_replace(text, '([a-z]+)', '{tag}$1') AS text",
                "lang",
                "source",
                "n_chars",
            )
        )
        emb_parts.append(
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
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionByName(p)
    all_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    all_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = os.path.join(repo, ".tmp", "scale100_sf1")

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    spark = get_spark("scale100")
    if not os.path.isdir(os.path.join(big, "documents.parquet")):
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
