"""End-to-end pretraining-corpus curation on the testdata.

The training-data counterpart of :mod:`examples.monthly`: where that
example composes the reference's ETL operators (ingest → dims → fact →
publish, ``airbnb-etl-airflow.py:536-551``), this one composes the
LLM-data extensions into the standard corpus-curation DAG a
large-scale training pipeline runs before tokenization:

- **quality gate** — heuristic scoring (length band, stopword ratio,
  punctuation density) + token-count bounds; scan-stage expressions
- **benchmark decontamination** — drop training docs that contain the
  held-out evaluation set, exact (fingerprint) + fuzzy (13-gram
  shingle overlap); anti-join, never O(train × heldout)
- **exact dedup** — normalized-text fingerprint, min-id survivor
- **near dedup** — MinHash + banded LSH candidates, exact-Jaccard
  verify, connected-component cluster resolution, min-id survivor
- **mixture weighting** — per-source deterministic keep rates (the
  "100% curated + downsampled everything-else" recipe)
- **PII redaction** — emails / IPs / phone-shaped runs → typed
  tokens, after the raw-text matching stages, before publish
- **sequence packing** — greedy first-fit of documents into fixed
  context windows, grouped Arrow batches
- **epoch shuffle** — seeded hash placement + within-partition sort:
  a reproducible global permutation per epoch, one shuffle

Every stage is a deterministic DataFrame plan (hash-derived sampling,
no RNG state), so a re-run — or a retried task on a 1000-executor
cluster — produces byte-identical output. Quality gates and the
atomic temp→final publish come from the same :mod:`pipeline`
machinery as the ETL example.

Run: ``python -m airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.corpus [sf_dir] [workdir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
    dup_token_frac,
    quality_score,
    redact_pii,
    token_count,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
    decontaminate,
    dedup_by_clusters,
    exact_dedup_fingerprint,
    minhash_near_dups,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    chunk_documents,
    deterministic_sample,
    epoch_shuffle,
    pack_sequences,
    weighted_mix,
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


def build_pipeline(
    sf_dir: str,
    workdir: str,
    max_len: int = 512,
    heldout_rate: float = 0.05,
    curated_lang: str = "en",
    other_rate: float = 0.4,
) -> Pipeline:
    """Corpus DAG: ingest → {heldout ∥ quality} → decontaminate →
    dedup → mix → pack → publish; epoch order derives from the
    published packs."""

    def ingest(spark: SparkSession, period: str, ctx):
        return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang", "source"
        )

    def heldout(spark: SparkSession, period: str, ctx):
        """The evaluation benchmark: a deterministic slice of the
        corpus (same (key, seed) → same slice on any layout). In
        production this stage reads the published eval sets instead."""
        return deterministic_sample(
            ctx["ingest"], heldout_rate, ["doc_id"], seed=7
        ).select("doc_id", "text")

    def quality(spark: SparkSession, period: str, ctx):
        """Heuristic quality gate + per-doc token length (kept as a
        column — packing consumes it) + the Gopher-rule repetition
        gate (duplicate-token fraction). Pure scan-stage expressions."""
        docs = ctx["ingest"].withColumn("tok_len", token_count("text"))
        return docs.filter(
            (quality_score("text") >= 1.0)
            & F.col("tok_len").between(5, 4096)
            & (dup_token_frac("text") <= 0.7)
        )

    def decontaminated(spark: SparkSession, period: str, ctx):
        """Drop training docs overlapping the held-out set — verbatim
        copies via fingerprint equality, embedded passages via 13-gram
        shingle overlap. Both probes broadcast the (benchmark-sized)
        held-out side."""
        return decontaminate(ctx["quality"], ctx["heldout"], n=13)

    def deduped(spark: SparkSession, period: str, ctx):
        """Exact then near dedup. Exact keeps each fingerprint's min-id
        row (left-semi on survivors); near-dup pairs come from
        MinHash(32) + 8-band LSH with exact-Jaccard verify, resolved to
        clusters whose min-id doc survives."""
        docs = ctx["decontaminated"]
        survivors = exact_dedup_fingerprint(docs).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        exact = docs.join(survivors, "doc_id", "left_semi")
        pairs = minhash_near_dups(exact, k=32, bands=8, n=3, threshold=0.5)
        return dedup_by_clusters(exact, pairs)

    def mixed(spark: SparkSession, period: str, ctx):
        """Mixture weighting: keep all of the curated language, a
        deterministic ``other_rate`` fraction of everything else. The
        ``source`` tag is rewritten to the mixture component."""
        docs = ctx["deduped"]
        return weighted_mix(
            {
                "curated": (docs.filter(F.col("lang") == curated_lang), 1.0),
                "other": (docs.filter(F.col("lang") != curated_lang), other_rate),
            },
            ["doc_id"],
        )

    def redacted(spark: SparkSession, period: str, ctx):
        """PII scrub before the corpus ships: emails / IPs /
        phone-shaped runs become typed tokens. Runs LAST among the
        text transforms on purpose — decontamination and dedup match
        on raw text (redaction would break fingerprint equality with
        the unredacted held-out set). Scan-stage regexp chain;
        tok_len stays the pre-redaction measure (packing budgets the
        real text length, the typed tokens are a training-side
        convention)."""
        return ctx["mixed"].withColumn("text", redact_pii("text"))

    def chunked(spark: SparkSession, period: str, ctx):
        """Docs longer than ``max_len`` split into overlapping token
        windows BEFORE packing, so packing never truncates
        (``pack_sequences`` clamps oversized rows to ``max_len``).
        Chunk rows get a surrogate ``doc_id`` (parent id in the high
        bits, chunk index low) so downstream keys stay unique; short
        docs pass through as their own single chunk. Scan-stage
        sequence+explode+slice — no shuffle."""
        toked = ctx["redacted"].withColumn("__t", F.split("text", " "))
        chunks = chunk_documents(toked, "__t", max_len, overlap=max_len // 16)
        return chunks.select(
            F.expr("doc_id * 4096 + chunk_id").alias("doc_id"),
            F.col("doc_id").alias("parent_doc_id"),
            F.array_join("chunk_tokens", " ").alias("text"),
            "lang",
            "source",
            F.col("n_chunk_tokens").alias("tok_len"),
        )

    def packed(spark: SparkSession, period: str, ctx):
        """Greedy first-fit packing into ``max_len``-token windows,
        then the atomic temp→final publish (a partial write is never
        visible to the training reader)."""
        packs = pack_sequences(
            ctx["chunked"], "tok_len", max_len, ["doc_id"], n_groups=8
        )
        atomic_publish(packs, f"{workdir}/corpus", validate=model_exists)
        return spark.read.parquet(f"{workdir}/corpus")

    def epoch(spark: SparkSession, period: str, ctx):
        """Epoch-0 serving order over the published packs: seeded hash
        placement + within-partition sort — a new seed is a new
        permutation, identically reproducible per seed."""
        return epoch_shuffle(ctx["packed"], ["doc_id"], seed=0)

    return Pipeline(
        [
            Stage("ingest", ingest),
            Stage("heldout", heldout, deps=("ingest",), gates=(("non-empty", non_empty),)),
            Stage("quality", quality, deps=("ingest",), gates=(("non-empty", non_empty),)),
            Stage(
                "decontaminated",
                decontaminated,
                deps=("quality", "heldout"),
                gates=(("non-empty", non_empty),),
            ),
            Stage(
                "deduped",
                deduped,
                deps=("decontaminated",),
                gates=(
                    ("non-empty", non_empty),
                    ("pk unique", unique_key("doc_id")),
                    ("pk not null", no_nulls("doc_id")),
                ),
            ),
            Stage("mixed", mixed, deps=("deduped",)),
            Stage("redacted", redacted, deps=("mixed",)),
            Stage(
                "chunked",
                chunked,
                deps=("redacted",),
                gates=(("non-empty", non_empty), ("pk unique", unique_key("doc_id"))),
            ),
            Stage(
                "packed",
                packed,
                deps=("chunked",),
                gates=(("non-empty", non_empty), ("pk unique", unique_key("doc_id"))),
            ),
            Stage("epoch", epoch, deps=("packed",)),
        ]
    )


def main() -> None:
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else ".tmp/corpus_demo"
    spark = get_spark("corpus-pipeline")
    run = build_pipeline(sf_dir, workdir).run(spark, "epoch-0")
    print("executed:", run.executed)
    run.results["packed"].groupBy("source").agg(
        F.count("*").alias("docs"), F.sum("tok_len").alias("tokens")
    ).orderBy("source").show()


if __name__ == "__main__":
    main()
