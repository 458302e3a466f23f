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
    — the SMALL-SCALE oracle-checked form (with L coarse labels the
    in-bucket self-join is O((N/L)²); ``s_near_dup_lsh_blocked`` is
    the 100 TB path). Threshold 0.35 sits inside the testdata's
    intra-label cosine distribution (max ≈ 0.475) so the check returns
    real pairs; value spacing near the cut (~1e-5) dwarfs cross-engine
    float noise (<1e-14), so membership can't flip."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35, bucket_col="label")


@register("s_near_dup_lsh_blocked")
def s_near_dup_lsh_blocked(spark, sf_dir):
    """Embedding near-dup pairs blocked on hyperplane-LSH buckets
    (adaptive planes × 16 tables) instead of the class label — the corpus-
    scale form: expected in-bucket population pinned at the target per
    table, candidate dedup before the exact-cosine verify. Rows-only
    check (random planes are not oracle-expressible); recall +
    no-false-positive semantics vs the exact all-pairs ground truth
    unit-tested with planted twins.

    SELF-CERTIFYING (round 6): the corpus carries 50 planted EXACT
    twins (vec_id < 50 duplicated at +10^6 — cosine 1 pairs share
    every sign bit, so LSH recall for them is 1.0 at ANY adaptive
    plane count, making the invariant scale-independent). Every 'pair'
    row re-emits its exact cosine (``cos_fp``, 1e-6 fixed point) with
    ``ok = cos_fp ≥ 350000`` — the verify gate is reviewable from the
    row itself — and the 'twin_coverage' row records planted (k=50)
    vs recovered twin pairs with ``ok`` = equality."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    (emb,) = load(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(twins)
    # n_planes=None: plane count sized from the corpus (one cheap
    # count) so bucket population — and with it the candidate-pair
    # self-join — stays LINEAR in N; a pinned plane count went 26x
    # super-linear in the round-5 scale-decade bench.
    # lazy checkpoint: the pair rows and the coverage count both
    # consume the LSH chain — materialize it once
    pairs = embedding_near_dup_pairs_lsh(
        corpus, threshold=0.35, n_planes=None, n_tables=16, dim=64
    ).localCheckpoint(eager=False)
    # re-attach exact cosine per returned pair (output-sized, slim):
    # the per-row invariant is the verify gate itself
    vecs = corpus.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x as double) / "
            "sqrt(aggregate(embedding, cast(0.0 as double), "
            "(a, y) -> a + cast(y as double) * cast(y as double))))"
        ).alias("vn"),
    )
    scored = (
        pairs.join(
            vecs.select(F.col("vec_id").alias("id_a"), F.col("vn").alias("va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("vec_id").alias("id_b"), F.col("vn").alias("vb")),
            "id_b",
        )
        .select(
            F.lit("pair").alias("slice"),
            "id_a",
            "id_b",
            F.floor(
                F.expr(
                    "aggregate(zip_with(va, vb, (x, y) -> x * y), "
                    "cast(0.0 as double), (a, x) -> a + x)"
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cos_fp"),
        )
        .withColumn("ok", F.col("cos_fp") >= F.lit(350_000))
    )
    # literal-key group, not a global agg: keeps the plan free of
    # Exchange SinglePartition (the family-wide plan gate). The
    # observed count is LEFT-JOINED onto a 1-row literal anchor and
    # coalesced to 0: if recall collapses entirely the filter yields
    # an empty frame whose grouped count has ZERO rows, and a bare
    # projection of it would silently drop the twin_coverage row —
    # failing open in exactly the total-failure case. The anchor
    # guarantees the row exists with ok=false instead
    # (presence pinned in tests/test_similarity.py).
    found_twins = (
        pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("id_a") < 50)
        )
        .groupBy(F.lit(1).alias("__one"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("found"))
    )
    anchor = spark.range(1).select(F.lit(1).alias("__one"))
    coverage = (
        anchor.join(found_twins, "__one", "left")
        .select(
            F.lit("twin_coverage").alias("slice"),
            F.lit(50).cast("bigint").alias("id_a"),
            F.coalesce(F.col("found"), F.lit(0)).cast("bigint").alias("id_b"),
            F.lit(None).cast("bigint").alias("cos_fp"),
            (F.coalesce(F.col("found"), F.lit(0)) == F.lit(50)).alias("ok"),
        )
    )
    return scored.unionByName(coverage)


# round-6 rotation: s_ann_methods moved past the driver window
# (re-registered verbatim in plans.probes) — the ANN family keeps
# window representation via s_knn_bruteforce / s_embedding_near_dup /
# s_near_dup_lsh_blocked, and the persisted-index serving path plus
# the per-method recall-floor tests cover the learned quantizers; the
# freed slot records the oracle-checked TPC-H Q5 snowflake-join
# showcase (q5_local_supplier_volume, registered in plans.curation).
