"""Catalog: embedding similarity search over ``embeddings``
(training-data extension — ANN over an ``array<float>`` column).

Brute-force cosine top-k is the oracle-checked baseline (DuckDB
recomputes the identical dot/norm expression with list functions);
the hyperplane-LSH ANN variant is rows-only (random planes are not
oracle-expressible) with a recall-vs-brute-force unit test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    cosine,
    embedding_near_dup_pairs,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)

# Explicit dot/norm SQL so DuckDB reproduces the exact same IEEE
# operation order as the Spark fold in operators.similarity.
_DOT = (
    "list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))"
)


def _cos_sql(av: str, bv: str) -> str:
    dot = f"list_dot_product({av}, {bv})"
    na = f"sqrt(list_dot_product({av}, {av}))"
    nb = f"sqrt(list_dot_product({bv}, {bv}))"
    return f"({dot} / ({na} * {nb}))"


@register(
    "s_knn_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_cos_sql("CAST(c.embedding AS DOUBLE[])", "q.qv")} AS cos_sim
      FROM embeddings c, q
      WHERE c.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= 5
    """,
)
def s_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 neighbors for query vectors (vec_id < 10):
    broadcast queries × corpus scan, JVM array-fold dot products,
    per-query top-k window. The correctness baseline for every ANN
    variant."""
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).withColumnRenamed("rank", "rnk")


@register(
    "s_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) a
    JOIN (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql("a.v", "b.v")} >= 0.35
    """,
)
def s_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by cluster label
    (the blocking key bounds the self-join — at 100 TB swap the label
    for an LSH bucket). Threshold 0.35 sits inside the testdata's
    intra-label cosine distribution (max ≈ 0.475) so the check returns
    real pairs; value spacing near the cut (~1e-5) dwarfs cross-engine
    float noise (<1e-14), so membership can't flip."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35, bucket_col="label")


@register("s_ann_ivf")
def s_ann_ivf(spark, sf_dir):
    """IVF approximate top-5: KMeans(16) coarse quantizer, 2-cell
    probe, exact cosine within probed cells. Rows-only check (the
    quantizer is iterative/learned); recall vs s_knn_bruteforce
    asserted in tests."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_topk,
    )

    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=2)


@register("s_ann_lsh")
def s_ann_lsh(spark, sf_dir):
    """Multi-table hyperplane-LSH approximate top-5 (4 planes × 8
    tables, OR-amplified): candidates limited to shared sign-buckets,
    exact cosine inside. Rows-only check; recall vs s_knn_bruteforce
    asserted in tests."""
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_topk_lsh(emb, queries, k=5, n_planes=4, n_tables=8, dim=64)
