"""End-to-end test of the retrieval pipeline example: incremental
BM25 index publish + hard-negative mining, with whole-DAG determinism
and merged-index ≡ full-rebuild equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.retrieval import (
    build_pipeline,
)
from tests.conftest import SF_DIR


def test_retrieval_end_to_end(spark, tmp_dir):
    run = build_pipeline(SF_DIR, f"{tmp_dir}/run1").run(spark, "epoch-0")
    assert run.executed == [
        "ingest", "index", "queries", "positives", "mined",
        "diversified", "published",
    ]
    out = run.results["published"]
    rows = out.collect()
    assert rows

    # a query never mines itself or its duplicate cluster
    positives = {
        (r.query_id, r.pos_id) for r in run.results["positives"].collect()
    }
    for r in rows:
        assert (r.query_id, r.doc_id) not in positives
        assert r.query_id != r.doc_id

    # MMR ranks are a proper 1..k prefix per query and the published
    # set is a subset of the mined candidates
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.mmr_rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    mined_pairs = {
        (r.query_id, r.doc_id) for r in run.results["mined"].collect()
    }
    assert all((r.query_id, r.doc_id) in mined_pairs for r in rows)
    # rank-1 keeps the fused order's winner (MMR's first pick is the
    # max-relevance candidate); later picks carry their similarity to
    # the already-selected set
    mined_top = {}
    for m in run.results["mined"].collect():
        cur = mined_top.get(m.query_id)
        if cur is None or (m.rrf_fp, -m.doc_id) > (cur[1], -cur[0]):
            mined_top[m.query_id] = (m.doc_id, m.rrf_fp)
    for r in rows:
        if r.mmr_rank == 1:
            assert r.doc_id == mined_top[r.query_id][0]
            assert r.max_sim_prior == -1.0

    # hybrid evidence: at least one mined negative was carried by both
    # retrieval legs somewhere (n_lists == 2), and every row names how
    # many legs carried it
    assert all(
        m.n_lists in (1, 2) for m in run.results["mined"].collect()
    )

    # the published index pair reproduces the fused operator's search
    # (merge over disjoint day batches == full rebuild)
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_search,
    )

    docs = run.results["ingest"]
    fused = bm25_search(
        docs.select("doc_id", "t"), run.results["queries"], k=12
    )
    idx_tf = spark.read.parquet(f"{tmp_dir}/run1/index_tf")
    idx_dl = spark.read.parquet(f"{tmp_dir}/run1/index_dl")
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_search_with,
    )

    indexed = bm25_search_with((idx_tf, idx_dl), run.results["queries"], k=12)
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, indexed.collect())
    )


def test_retrieval_is_deterministic(spark, tmp_dir):
    r1 = build_pipeline(SF_DIR, f"{tmp_dir}/a").run(spark, "p")
    r2 = build_pipeline(SF_DIR, f"{tmp_dir}/b").run(spark, "p")
    a = sorted(map(tuple, r1.results["published"].collect()))
    b = sorted(map(tuple, r2.results["published"].collect()))
    assert a == b and a
