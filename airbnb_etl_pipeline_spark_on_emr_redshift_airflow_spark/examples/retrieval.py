"""Retrieval-index maintenance + hard-negative mining on the testdata:
the round-4 lexical-retrieval family composed end-to-end through the
:mod:`pipeline` runner.

Where :mod:`examples.lm_curation` maintains a persisted LM ledger,
this DAG maintains the persisted BM25 INVERTED INDEX and uses it the
way a training-data pipeline does — mining hard negatives for
retrieval/embedding training sets:

- **incremental indexing** — the (tf, dl) index is built from the
  day-0 batch, then the day-1 batch's index FOLDS IN with
  ``merge_bm25_index`` (a pure union over disjoint doc ids: the
  corpus is never rescanned), and the merged pair publishes
  atomically. df / n_docs / avgdl are rollups of the pair, so the
  two tables ARE the whole index.
- **query selection** — one deterministic exemplar document per
  language (``group_sample_topk``, md5 pseudo-order) becomes a
  keyword query from its own tokens.
- **positives** — the exemplar's exact-duplicate cluster (normalized
  fingerprint groups): the documents a contrastive loss must NOT see
  as negatives.
- **mining** — HYBRID retrieval: BM25 top-k from the PERSISTED
  index (``bm25_search_with``) fused with exact-cosine top-k over
  the exemplars' embeddings by reciprocal rank fusion
  (``rrf_fuse``, integer-exact combiner), minus the query doc and
  its positives (anti-join), re-ranked: similar-but-not-duplicate
  documents in either modality — textbook hard negatives.
- **diversification** (round 6) — MMR re-rank of the mined set
  (``mmr_rerank``): the contrastive batch wants coverage of the
  confusion region, not five copies of the same near-miss, so the
  final negatives greedily trade RRF relevance against
  max-cosine-to-selected.
- **publish** — atomic temp→final.

Every stage is deterministic (hash-derived, no RNG); a re-run
produces identical output — asserted by the test, along with
merged-index ≡ full-rebuild search equality.

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.retrieval [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
    fingerprint,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
    bm25_index,
    bm25_search_with,
    merge_bm25_index,
    rrf_fuse,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
    brute_force_topk,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    group_sample_topk,
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
    k_candidates: int = 12,
    k_negatives: int = 5,
) -> Pipeline:
    """Retrieval DAG: ingest → incremental index (publish) → queries →
    positives → mined hard negatives (publish)."""

    def ingest(spark: SparkSession, period: str, ctx):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return docs.select(
            "doc_id", "lang", "text", F.expr(_TOKS).alias("t")
        )

    def index(spark: SparkSession, period: str, ctx):
        """Day-0 index + day-1 batch folded in, published atomically.
        A daily cadence reads yesterday's published pair instead of
        rebuilding day-0."""
        day0 = ctx["ingest"].filter("doc_id % 2 = 0")
        day1 = ctx["ingest"].filter("doc_id % 2 = 1")
        merged_tf, merged_dl = merge_bm25_index(
            bm25_index(day0), bm25_index(day1)
        )
        atomic_publish(merged_tf, f"{workdir}/index_tf", validate=model_exists)
        atomic_publish(merged_dl, f"{workdir}/index_dl", validate=model_exists)
        return spark.read.parquet(f"{workdir}/index_tf")

    def queries(spark: SparkSession, period: str, ctx):
        """One exemplar doc per language; its tokens are the query."""
        exemplars = group_sample_topk(
            ctx["ingest"], "lang", k=1, key_cols=["doc_id"]
        )
        return exemplars.select(
            F.col("doc_id").alias("query_id"), F.col("t").alias("q")
        )

    def positives(spark: SparkSession, period: str, ctx):
        """The exemplar's exact-duplicate cluster — never negatives."""
        fp = ctx["ingest"].select("doc_id", fingerprint("text").alias("f"))
        qf = (
            ctx["queries"]
            .join(fp, F.col("query_id") == F.col("doc_id"))
            .select("query_id", "f")
        )
        return (
            fp.join(qf, "f")
            .select("query_id", F.col("doc_id").alias("pos_id"))
        )

    def mined(spark: SparkSession, period: str, ctx):
        """HYBRID candidates: BM25 top-k from the PERSISTED index +
        exact-cosine top-k over the exemplars' embeddings, fused by
        reciprocal rank fusion (pure integer combiner), minus self
        and positives, re-ranked to the top hard negatives —
        lexically-or-semantically-similar-but-not-duplicate docs."""
        idx = (
            spark.read.parquet(f"{workdir}/index_tf"),
            spark.read.parquet(f"{workdir}/index_dl"),
        )
        lex = bm25_search_with(idx, ctx["queries"], k=k_candidates)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qids = ctx["queries"].select(
            F.col("query_id").alias("vec_id")
        )
        dense = brute_force_topk(
            emb, emb.join(qids, "vec_id"), k=k_candidates
        ).select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("rnk"),
        )
        fused = rrf_fuse([lex, dense], topk=2 * k_candidates)
        not_pos = fused.join(
            ctx["positives"].withColumnRenamed("pos_id", "doc_id"),
            ["query_id", "doc_id"],
            "left_anti",
        ).filter(F.col("doc_id") != F.col("query_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("rrf_fp").desc(), F.col("doc_id").asc()
        )
        return (
            not_pos.withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= k_negatives)
            .select("query_id", "doc_id", "rrf_fp", "n_lists", "neg_rank")
        )

    def diversified(spark: SparkSession, period: str, ctx):
        """MMR re-rank of the mined negatives (round 6): a fused list
        often stacks several near-identical hard negatives; the
        contrastive batch wants COVERAGE of the confusion region, so
        the final set greedily trades relevance (the integer RRF
        score) against max-cosine-to-already-picked
        (``mmr_rerank``, lam=0.7). Deterministic — the greedy loop is
        sequential per query group — and candidate-list sized (never
        the corpus)."""
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
            mmr_rerank,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cands = ctx["mined"].join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        ).select(
            "query_id",
            "doc_id",
            F.col("rrf_fp").cast("double").alias("score"),
            "embedding",
        )
        return mmr_rerank(cands, k=k_negatives, lam=0.7)

    def published(spark: SparkSession, period: str, ctx):
        out = ctx["diversified"].select(
            "query_id", "doc_id", "mmr_rank", "relevance", "max_sim_prior"
        )
        atomic_publish(
            out, f"{workdir}/hard_negatives", validate=model_exists
        )
        return spark.read.parquet(f"{workdir}/hard_negatives")

    return Pipeline(
        [
            Stage("ingest", ingest, gates=(("non-empty", non_empty),)),
            Stage(
                "index",
                index,
                deps=("ingest",),
                gates=(("non-empty", non_empty),),
            ),
            Stage("queries", queries, deps=("ingest",),
                  gates=(("pk unique", unique_key("query_id")),)),
            Stage("positives", positives, deps=("ingest", "queries")),
            Stage("mined", mined, deps=("index", "queries", "positives")),
            Stage("diversified", diversified, deps=("mined",)),
            Stage(
                "published",
                published,
                deps=("diversified",),
                gates=(
                    ("non-empty", non_empty),
                    ("pk not null", no_nulls("query_id")),
                ),
            ),
        ]
    )


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else ".tmp/retrieval_demo"
    spark = get_spark("retrieval")
    run = build_pipeline(sf_dir, workdir).run(spark, "epoch-0")
    print("executed:", run.executed)
    run.results["published"].orderBy("query_id", "neg_rank").show(20)


if __name__ == "__main__":
    main()
