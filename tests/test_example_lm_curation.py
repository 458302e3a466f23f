"""End-to-end test of the LM-curation pipeline example: persisted LM
→ frozen scoring → tier gate → token-budget knapsack → atomic
publish, with whole-DAG determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.lm_curation import (
    build_pipeline,
)
from tests.conftest import SF_DIR


def test_lm_curation_end_to_end(spark, tmp_dir):
    run = build_pipeline(SF_DIR, f"{tmp_dir}/run1", budget_frac=0.6).run(
        spark, "epoch-0"
    )
    assert run.executed == [
        "ingest", "lm", "scored", "tiered", "budgeted", "published",
    ]
    out = run.results["published"]

    # tier gate: no low-tier document survives
    assert out.filter(F.col("tier") == "low").count() == 0

    # budget: kept tokens fit the 60% budget of the tiered corpus
    tiered = run.results["tiered"]
    total = tiered.agg(F.sum("n_tokens")).collect()[0][0]
    kept = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert kept <= 0.6 * total
    # and the selection is genuinely a cut (not everything survived)
    assert 0 < out.count() < tiered.count()

    # greedy property: every kept doc outranks every dropped doc in
    # (avg_logprob desc, doc_id asc) order
    kept_rows = out.select("avg_logprob", "doc_id").collect()
    dropped = tiered.join(out.select("doc_id"), "doc_id", "left_anti")
    worst_kept = min((r.avg_logprob, -r.doc_id) for r in kept_rows)
    best_dropped = max(
        (r.avg_logprob, -r.doc_id)
        for r in dropped.select("avg_logprob", "doc_id").collect()
    )
    assert worst_kept > best_dropped

    # the LM table is persisted and additive-ready: vocabulary-sized,
    # one row per term, exact bigint counts
    lm = run.results["lm"]
    assert lm.groupBy("term").count().filter(F.col("count") > 1).count() == 0
    assert dict(lm.dtypes)["cnt"] == "bigint"


def test_lm_curation_is_deterministic(spark, tmp_dir):
    r1 = build_pipeline(SF_DIR, f"{tmp_dir}/a").run(spark, "p")
    r2 = build_pipeline(SF_DIR, f"{tmp_dir}/b").run(spark, "p")
    a = sorted(
        (r.doc_id, r.n_tokens, r.cum_measure, r.tier)
        for r in r1.results["published"].collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.cum_measure, r.tier)
        for r in r2.results["published"].collect()
    )
    assert a == b and a
