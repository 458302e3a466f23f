"""LM-driven corpus curation on the testdata: the round-4 quality
ladder composed end-to-end through the :mod:`pipeline` runner.

Where :mod:`examples.corpus` runs the heuristic-gate → dedup →
pack cadence, this DAG is the *model-based* selection cadence a
fixed-compute pretraining run uses (CCNet-style):

- **LM training** — corpus unigram counts land as a persisted,
  additive table (``unigram_lm_counts``; daily deltas would fold in
  with ``merge_lm_counts`` — the corpus is never rescanned)
- **frozen scoring** — every document scores against the PERSISTED
  LM (``unigram_lm_score_with``), not a self-trained one, so the
  filter cannot drift with the batch being filtered; OOV tokens hit
  the smoothing floor
- **tier gate** — drop the ``low`` tier (off-distribution gibberish)
- **budget selection** — ``budget_select`` keeps the best-scoring
  documents until a token budget (fraction of the surviving corpus)
  is spent: the greedy knapsack, computed as a bucketed global
  running sum with no single-partition window
- **publish** — atomic temp→final, partial output never visible

Every stage is deterministic (hash/count-derived, no RNG), so a
re-run produces byte-identical output — asserted by the test.

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.lm_curation [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    unigram_lm_counts,
    unigram_lm_score_with,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    budget_select,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
    Pipeline,
    Stage,
    no_nulls,
    non_empty,
    unique_key,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    atomic_publish,
    model_exists,
)

# the dedup-family tokenizer (plans.text.TOKS without the plans import)
_TOKS = (
    "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), ' '), "
    "x -> x != '')"
)


def build_pipeline(
    sf_dir: str,
    workdir: str,
    budget_frac: float = 0.6,
) -> Pipeline:
    """LM curation DAG: ingest → lm (persisted) → score (frozen) →
    tier gate → budget select → publish."""

    def ingest(spark: SparkSession, period: str, ctx):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.select("doc_id", "text", F.expr(_TOKS).alias("t"))

    def lm(spark: SparkSession, period: str, ctx):
        """Train-and-persist the unigram LM count table. In a daily
        cadence the delta batch's counts fold into this table with
        ``merge_lm_counts`` instead of retraining."""
        counts = unigram_lm_counts(ctx["ingest"], "t", "doc_id")
        atomic_publish(counts, f"{workdir}/lm_counts", validate=model_exists)
        return spark.read.parquet(f"{workdir}/lm_counts")

    def scored(spark: SparkSession, period: str, ctx):
        """Score every document against the PERSISTED LM — the frozen
        reference form."""
        return unigram_lm_score_with(ctx["ingest"], ctx["lm"], "t", "doc_id")

    def tiered(spark: SparkSession, period: str, ctx):
        """Drop the low tier; keep the score columns for the budget
        stage (avg_logprob is the selection priority)."""
        keep = ctx["scored"].filter(F.col("tier") != "low")
        return ctx["ingest"].select("doc_id", "text").join(keep, "doc_id")

    def budgeted(spark: SparkSession, period: str, ctx):
        """Greedy knapsack: best-scoring docs first until the token
        budget (a fraction of the surviving corpus) is spent."""
        return budget_select(
            ctx["tiered"],
            measure_col="n_tokens",
            priority_col="avg_logprob",
            tiebreak_col="doc_id",
            budget_frac=budget_frac,
        )

    def published(spark: SparkSession, period: str, ctx):
        out = ctx["budgeted"].select(
            "doc_id", "text", "n_tokens", "avg_logprob", "tier",
            "cum_measure",
        )
        atomic_publish(out, f"{workdir}/corpus", validate=model_exists)
        return spark.read.parquet(f"{workdir}/corpus")

    return Pipeline(
        [
            Stage("ingest", ingest, gates=(("non-empty", non_empty),)),
            Stage("lm", lm, deps=("ingest",), gates=(("non-empty", non_empty),)),
            Stage("scored", scored, deps=("ingest", "lm")),
            Stage(
                "tiered",
                tiered,
                deps=("ingest", "scored"),
                gates=(("non-empty", non_empty), ("pk unique", unique_key("doc_id"))),
            ),
            Stage("budgeted", budgeted, deps=("tiered",)),
            Stage(
                "published",
                published,
                deps=("budgeted",),
                gates=(
                    ("non-empty", non_empty),
                    ("pk unique", unique_key("doc_id")),
                    ("pk not null", no_nulls("doc_id")),
                ),
            ),
        ]
    )


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else ".tmp/lm_curation_demo"
    spark = get_spark("lm-curation")
    run = build_pipeline(sf_dir, workdir).run(spark, "epoch-0")
    print("executed:", run.executed)
    run.results["published"].groupBy("tier").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("tier").show()


if __name__ == "__main__":
    main()
