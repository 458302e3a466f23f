"""Catalog: text operators over ``documents`` — the reference's NLP
stage (SURVEY.md §2.9) rebuilt as deterministic column expressions,
plus the text-analysis surface a pretraining-data pipeline needs
(language ID, quality scoring, token counting, fingerprinting).

The classifier SQL is *generated once* in ``functions.text`` and used
verbatim on both engines — Spark via ``F.expr``, DuckDB as the oracle —
so parity is structural, not coincidental.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions import text as T
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


@register(
    "n_language_detect",
    oracle=f"""
    SELECT doc_id, {T.lang_detect_sql("text")} AS comment_language
    FROM documents
    """,
)
def n_language_detect(spark, sf_dir):
    """N1 — language detection as a pure row-wise string→label function
    (reference ``apps/process_reviews.py:125-127``, Spark-NLP
    ``detect_language_220`` → here a deterministic marker-count
    heuristic). Two-phase projection (normalize once, score markers) —
    JVM-side expressions, zero shuffles: runs inside the scan stage at
    any scale."""
    (docs,) = load(spark, sf_dir, "documents")
    return T.with_language(docs, "text").select("doc_id", "comment_language")


@register(
    "n_sentiment_selective",
    oracle=f"""
    SELECT doc_id,
           {T.lang_detect_sql("text")} AS comment_language,
           CASE WHEN {T.lang_detect_sql("text")} = 'en'
                THEN {T.sentiment_sql("text")}
                ELSE 'n/a' END AS sentiment
    FROM documents
    """,
)
def n_sentiment_selective(spark, sf_dir):
    """N2 + U2 — the reference's selective-apply semantics: sentiment
    scored only on detected-English rows, everything else 'n/a'
    (``apps/process_reviews.py:133-140``). The reference executes this
    as three filtered slices re-unioned (three scans); here the fused
    single-pass form (``with_language_sentiment``) produces identical
    rows from ONE scan — the union *shape* itself is covered by
    ``u_three_way_union`` and the align_union unit tests."""
    (docs,) = load(spark, sf_dir, "documents")
    return T.with_language_sentiment(docs, "text").select(
        "doc_id", "comment_language", "sentiment"
    )


@register(
    "t_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({T.token_count_sql("text")} AS BIGINT) AS n_tokens,
           length(text) AS n_chars_measured,
           CAST({T.stopword_ratio_sql("text")} AS DOUBLE) AS stopword_share
    FROM documents
    """,
)
def t_token_stats(spark, sf_dir):
    """Token counting + stopword ratio — per-document text statistics
    (training-data extension; whitespace tokenizer expressed portably
    via the space-delta trick, see functions.text)."""
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        T.stopword_ratio("text").cast("double").alias("stopword_share"),
    )


@register(
    "t_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def t_bpe_token_count(spark, sf_dir):
    """BPE-ish regex token counting (training-data extension): runs of
    letters, runs of digits, or single non-alphanumeric marks — the
    pre-tokenizer split a byte-pair encoder sees. Same RE2-compatible
    pattern both engines."""
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


@register(
    "t_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST({T.quality_score_sql("text")} AS DOUBLE) AS quality,
           CASE WHEN {T.quality_score_sql("text")} >= 0.66
                THEN 'keep' ELSE 'drop' END AS gate
    FROM documents
    """,
)
def t_quality_score(spark, sf_dir):
    """Document quality scoring + keep/drop gate — the pretraining
    filter stage (length band, stopword band, punctuation density)."""
    (docs,) = load(spark, sf_dir, "documents")
    q = T.quality_score("text")
    return docs.select(
        "doc_id",
        q.cast("double").alias("quality"),
        F.when(q >= 0.66, "keep").otherwise("drop").alias("gate"),
    )


@register(
    "t_fingerprint",
    oracle=f"""
    SELECT doc_id, {T.fingerprint_sql("text")} AS fp
    FROM documents
    """,
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over case/whitespace-normalized
    text — the exact-duplicate key (both engines emit identical hex)."""
    (docs,) = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fp"))


@register(
    "t_language_share",
    oracle=f"""
    WITH tagged AS (
      SELECT {T.lang_detect_sql("text")} AS comment_language FROM documents
    )
    SELECT comment_language, count(*) AS cnt,
           CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS share
    FROM tagged GROUP BY comment_language
    """,
)
def t_language_share(spark, sf_dir):
    """The reference's language-share analytical query
    (``README.md:265-266``: en 72% / fr 13% / …) over the detected
    labels — classifier N1 composed with A3/A5."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        ratio_to_total,
    )

    (docs,) = load(spark, sf_dir, "documents")
    tagged = T.with_language(docs, "text").select("comment_language")
    return ratio_to_total(tagged, ["comment_language"])
