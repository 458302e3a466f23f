"""Catalog: deduplication over ``documents`` — exact, n-gram Jaccard,
MinHash-LSH, SimHash (training-data extensions; first-class per the
build contract).

Exact and Jaccard dedup are fully SQL-expressible and oracle-checked
(the DuckDB side regenerates the same shingles with list functions).
MinHash/SimHash signatures hinge on ``xxhash64``, which DuckDB doesn't
expose — those register rows-only here and get semantic unit tests
(crafted near-duplicates must be found; disjoint docs must not) in
``tests/test_dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
    fingerprint_sql,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
    exact_dedup_fingerprint,
    jaccard_pairs,
    minhash_near_dups,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)

# Jaccard self-join is quadratic in shared-shingle fan-out; the checked
# query runs on a deterministic 1-in-20 doc subset to bound pair count
# at sf0.01 (the operator itself takes any DataFrame).
_SUBSET = "doc_id % 20 = 0"
_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z]+', ' '))"


@register(
    "d_exact_dedup",
    oracle=f"""
    SELECT {fingerprint_sql("text")} AS fp, MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def d_exact_dedup(spark, sf_dir):
    """Exact dedup: normalized-text md5 fingerprint → min-doc_id
    survivor per duplicate class. The corpus-scale analog of the
    reference's key dedup (``apps/process_reviews.py:148``). The
    ``fp`` column is the document-fingerprinting operator itself
    (``functions.text.fingerprint``) — both engines emit identical hex
    over case/whitespace-normalized text."""
    (docs,) = load(spark, sf_dir, "documents")
    return exact_dedup_fingerprint(docs)


@register(
    "d_ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
      FROM documents WHERE {_SUBSET}
    ), idx AS (
      SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
      FROM idx
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.008
    """,
)
def d_ngram_jaccard_pairs(spark, sf_dir):
    """N-gram Jaccard near-dup pairs via inverted shingle index —
    exact set similarity, no docs² blowup (only pairs sharing a
    shingle are scored). Word-3-gram shingles; integers throughout, so
    the jaccard double is cross-engine exact."""
    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.filter(F.expr(_SUBSET))
    return jaccard_pairs(subset, n=3, threshold=0.008)


@register("d_minhash_dup_clusters")
def d_minhash_dup_clusters(spark, sf_dir):
    """The full 100 TB near-dedup chain in one query: MinHash(32) +
    LSH(8 bands) candidates, verified with exact shingle Jaccard ≥ 0.5
    — cost bounded by bucket collisions, never O(docs²) — then the
    verified pairs resolved into duplicate CLUSTERS by connected
    components (iterative min-label propagation with localCheckpoint
    lineage cuts). Returns (doc_id, cluster_id), cluster_id = the
    canonical min-id survivor.

    The synthetic corpus has no natural near-duplicates, so the query
    PLANTS them: each subset doc gets a mutated twin (one word
    appended, Jaccard ≈ 0.95, id+10^6) — every doc must land in a
    cluster with its twin. The verify arrays are capped at 512
    hashes/doc (bottom-k sketch) so a pathological long document
    cannot blow executor memory; every doc in this corpus sits far
    under the cap, so the output is bit-identical to the uncapped
    form (asserted in tests). Rows-only check (xxhash64 signatures
    and iterative propagation are not DuckDB-expressible); pairing,
    chain-transitivity, and convergence semantics unit-tested."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
    )

    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.select("doc_id", "text").filter(F.expr(_SUBSET))
    twins = subset.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    )
    corpus = subset.unionByName(twins)
    pairs = minhash_near_dups(
        corpus, k=32, bands=8, n=3, threshold=0.5, max_shingles_per_doc=512
    )
    return connected_components(pairs)


@register("d_simhash_near_dup")
def d_simhash_near_dup(spark, sf_dir):
    """SimHash-64 near-duplicate pairs at hamming > 0 via signature
    banding (8 bands of 8 bits ⇒ exhaustive for hamming ≤ 7),
    verified with exact XOR popcount. Planted twins (one appended
    word) land mostly at hamming 0-5 on this corpus — all within the
    banding guarantee, including the distance-1 ones; twins mutated
    past 7 bits are out of contract (raise bands to chase them, at
    the cost of narrower bands ⇒ more bucket collisions). Exact-
    signature (hamming-0) buckets remain available as
    ``operators.dedup.simhash_dup_buckets``. Rows-only check
    (xxhash64-based signatures are not DuckDB-expressible);
    bit-majority + banding semantics unit-tested."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        simhash_near_dups,
    )

    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.select("doc_id", "text").filter(F.expr(_SUBSET))
    twins = subset.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    )
    corpus = subset.unionByName(twins)
    return simhash_near_dups(corpus, bands=8, max_hamming=7)
