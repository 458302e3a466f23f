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
    brute_force_topk,
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
    "s_knn_near_dup",
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
    SELECT 'knn' AS slice, query_id, neighbor_id, rnk,
           CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
    FROM ranked WHERE rnk <= 5
    UNION ALL
    SELECT 'near_dup', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), a.vec_id, b.vec_id
    FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) a
    JOIN (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql("a.v", "b.v")} >= 0.35
    """,
)
def s_knn_near_dup(spark, sf_dir):
    """Round-10 slice-merge of ``s_knn_bruteforce`` +
    ``s_embedding_near_dup`` (both re-registered verbatim past the
    window in ``plans.probes``), freeing a first-50 slot for the
    rotated-in ``u_delete_vectors`` per the established discipline.

    'knn' slice — exact cosine top-5 neighbors for query vectors
    (vec_id < 10): broadcast queries × corpus scan, JVM array-fold
    dot products, per-query top-k window; the correctness baseline
    for every ANN variant. 'near_dup' slice — embedding-cosine
    near-duplicate pairs blocked by cluster label (the small-scale
    oracle-checked form; ``s_near_dup_lsh_blocked`` is the 100 TB
    path); threshold 0.35 sits inside the testdata's intra-label
    cosine distribution with value spacing near the cut (~1e-5)
    dwarfing cross-engine float noise (<1e-14). Disjoint legs
    null-padded to a common schema."""
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    knn = brute_force_topk(emb, queries, k=5).select(
        F.lit("knn").alias("slice"),
        "query_id", "neighbor_id",
        F.col("rank").cast("bigint").alias("rnk"),
        F.lit(None).cast("bigint").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
    )
    nd = embedding_near_dup_pairs(
        emb, threshold=0.35, bucket_col="label"
    ).select(
        F.lit("near_dup").alias("slice"),
        F.lit(None).cast("bigint").alias("query_id"),
        F.lit(None).cast("bigint").alias("neighbor_id"),
        F.lit(None).cast("bigint").alias("rnk"),
        "id_a", "id_b",
    )
    return knn.unionByName(nd)


# round-9 rotation: s_near_dup_lsh_blocked moved past the driver window
# (re-registered verbatim in plans.probes) — the similarity family keeps
# window representation via the oracle-checked s_knn_bruteforce /
# s_embedding_near_dup; the freed slot records a round-8 oracle-checked
# flagship (see plans.curation).
# round-6 rotation: s_ann_methods moved past the driver window
# (re-registered verbatim in plans.probes) — the ANN family keeps
# window representation via s_knn_bruteforce / s_embedding_near_dup /
# s_near_dup_lsh_blocked, and the persisted-index serving path plus
# the per-method recall-floor tests cover the learned quantizers; the
# freed slot records the oracle-checked TPC-H Q5 snowflake-join
# showcase (q5_local_supplier_volume, registered in plans.curation).
