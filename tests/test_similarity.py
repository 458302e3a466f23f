"""Tests: brute-force cosine top-k correctness on known vectors, ANN
recall vs the exact baseline on real testdata."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    embedding_near_dup_pairs,
)
from tests.conftest import SF_DIR


def test_brute_force_topk_known_geometry(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # closest to 0
        (2, [0.0, 1.0]),   # orthogonal to 0
        (3, [0.7, 0.7]),   # diagonal
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    ranked = [r.neighbor_id for r in out.orderBy("rank").collect()]
    assert ranked == [1, 3, 2]


def test_embedding_near_dup_identical_vectors(spark):
    vecs = [
        (0, 1, [1.0, 2.0, 3.0]),
        (1, 1, [1.0, 2.0, 3.0]),   # identical, same bucket
        (2, 1, [-3.0, 1.0, 0.0]),  # unrelated, same bucket
        (3, 2, [1.0, 2.0, 3.0]),   # identical but different bucket
    ]
    df = spark.createDataFrame(vecs, "vec_id long, label int, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(df, 0.99).collect()}
    assert pairs == {(0, 1)}


def test_embedding_near_dup_guard_fires_on_oversized_bucket(spark):
    """The quadratic label-blocked form must fail loudly — naming the
    LSH sibling — when any blocking bucket exceeds max_bucket_rows,
    instead of silently launching an O(n²) self-join."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    vecs = [(i, 1, [1.0, float(i), 3.0]) for i in range(6)]
    df = spark.createDataFrame(
        vecs, "vec_id long, label int, embedding array<float>"
    )
    guarded = embedding_near_dup_pairs(df, 0.5, max_bucket_rows=3)
    with pytest.raises(SparkRuntimeException) as exc:
        guarded.collect()
    assert "embedding_near_dup_pairs_lsh" in str(exc.value)
    # same data passes with the guard sized up or disabled
    assert embedding_near_dup_pairs(df, 0.5, max_bucket_rows=6).count() > 0
    assert embedding_near_dup_pairs(df, 0.5, max_bucket_rows=None).count() > 0


def test_ann_recall_against_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_lsh(
            emb, queries, k=5, n_planes=4, n_tables=8, dim=64
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # OR-amplified multi-table LSH; the bound is a regression floor.
    assert recall >= 0.5, f"ANN recall collapsed: {recall}"


@pytest.mark.slow
def test_probe_cells_vectorized_matches_literal_at_1024_cells(spark):
    """Past _PROBE_LITERAL_MAX_CENTROIDS the probe-cell selection runs
    as an Arrow-batched numpy matmul instead of unrolling one struct
    literal per centroid into the expression tree (a 2^14-cell
    production quantizer breaks codegen that way). Both forms must
    pick the same cells, hence identical search results."""
    import numpy as np
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        _PROBE_LITERAL_MAX_CENTROIDS,
        ivf_build,
        ivf_search,
    )

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(3000)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    assigned, cents = ivf_build(df, n_centroids=1024, seed=7)
    assigned = assigned.cache()
    assert len(cents) == 1024 > _PROBE_LITERAL_MAX_CENTROIDS
    queries = df.filter(F.col("vec_id") < 5)
    auto = ivf_search(assigned, cents, queries, k=3, n_probe=4)
    # auto-dispatch at 1024 cells goes through the Arrow-batched stage
    assert "ArrowEvalPython" in (
        auto._jdf.queryExecution().executedPlan().toString()
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank) for r in auto.collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_search(
            assigned, cents, queries, k=3, n_probe=4, probe_impl="literal"
        ).collect()
    )
    assert got == want
    assigned.unpersist()


def test_probe_cells_small_quantizer_stays_jvm_side(spark):
    """At small centroid counts the probe stage must remain a literal
    JVM expression — no Python eval node in the plan."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_build,
        ivf_search,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_centroids=8)
    plan = (
        ivf_search(assigned, cents, emb.filter(F.col("vec_id") < 3), k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cosine_pandas_matches_expression(spark):
    """The Arrow-vectorized path must agree with the JVM fold to float
    tolerance on real embeddings."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        as_double,
        cosine,
        cosine_pandas,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    a = emb.select(
        F.col("vec_id"),
        as_double("embedding").alias("v1"),
        F.reverse(as_double("embedding")).alias("v2"),
    )
    both = a.select(
        "vec_id",
        cosine("v1", "v2").alias("jvm"),
        cosine_pandas("v1", "v2").alias("arrow"),
    ).collect()
    assert all(abs(r.jvm - r.arrow) < 1e-9 for r in both)


def test_ivf_recall_against_brute_force(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_lsh_blocked_near_dup_recall(spark):
    """embedding_near_dup_pairs_lsh must recover most of the exact
    all-pairs near-dups and all planted identical twins."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    twins = emb.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "label",
        "embedding",
    )
    corpus = emb.unionByName(twins)
    # Exact ground truth: all-pairs cosine via a constant blocking key
    # (fine at test scale).
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            corpus.withColumn("all", F.lit(1)), 0.35, bucket_col="all"
        ).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            corpus, 0.35, n_planes=4, n_tables=16, dim=64
        ).collect()
    }
    assert got <= exact  # verify step is exact: no false positives
    twin_pairs = {(i, i + 1_000_000) for i in range(10)}
    assert twin_pairs <= got  # identical vectors collide in every table
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, f"LSH-blocked recall collapsed: {recall}"


def test_ivf_index_roundtrip_and_partition_pruning(spark, tmp_dir):
    """Build/search split: persisted index returns the same results as
    the fused ivf_topk; the cell-partitioned store prunes to the
    probed cells via dynamic partition pruning (the partitioning IS
    the index — no row-level structure)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_build,
        ivf_read_index,
        ivf_search,
        ivf_topk,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)

    assigned, centroids = ivf_build(emb, n_centroids=8)
    ivf_write_index(assigned, centroids, f"{tmp_dir}/ivf")
    stored, stored_centroids = ivf_read_index(spark, f"{tmp_dir}/ivf")
    assert stored_centroids == centroids  # JSON round-trip exact

    fused = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2).collect()
    }
    from_store = ivf_search(
        stored, stored_centroids, queries, k=3, n_probe=2
    )
    got = {(r.query_id, r.neighbor_id, r.rank) for r in from_store.collect()}
    assert got == fused

    # dynamic partition pruning reaches the cell-partitioned scan:
    # the corpus side carries a runtime pruning filter on `cell`
    plan = from_store._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_ivf_build_with_train_fraction(spark):
    """Sampled quantizer training (the corpus-scale path) still
    assigns EVERY vector and keeps usable recall."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_build,
        ivf_search,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    assigned, centroids = ivf_build(emb, n_centroids=8, train_fraction=0.5)
    assert assigned.count() == emb.count()  # full assignment coverage
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_search(assigned, centroids, queries, k=5, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"sampled-train IVF recall collapsed: {recall}"


def test_pq_compression_and_rerank_recall(spark):
    """PQ codes: valid range, deterministic encode; ADC alone is a
    coarse scorer, ADC + exact re-rank of the shortlist recovers
    near-exact recall — the production search shape (scan 8-byte
    codes, touch full vectors for only queries x rerank rows)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    cb = pq_train(emb, m=8, k_codes=64, dim=64)
    assert len(cb) == 8 and len(cb[0]) == 64 and len(cb[0][0]) == 8

    codes = pq_encode(emb, cb).cache()
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 64 for r in rows for c in r.codes)
    # encode is deterministic (seeded KMeans, pure argmin)
    again = {r.id: list(r.codes) for r in pq_encode(emb, cb).collect()}
    assert {r.id: list(r.codes) for r in rows} == again

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(codes, cb, queries, k=5).collect()
    }
    reranked = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(
            codes, cb, queries, k=5, rerank=50, corpus=emb
        ).collect()
    }
    coarse = len(exact & plain) / len(exact)
    fine = len(exact & reranked) / len(exact)
    assert coarse >= 0.2, f"ADC recall collapsed: {coarse}"
    assert fine >= 0.8, f"reranked recall collapsed: {fine}"
    assert fine > coarse


def test_ivfpq_compose_prune_and_compress(spark):
    """IVF-PQ: residual-encoded codes per cell; ADC search probes
    n_probe cells only. The recall ceiling is set by CELL PRUNING
    (exact-score IVF at the same probe level ~0.67 on this data);
    the reranked IVF-PQ result must sit near that ceiling — i.e.
    quantization through the shortlist costs little — and strictly
    above the coarse ADC-only ranking's floor."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    index, cents, cbs = ivfpq_build(emb, n_centroids=8, m=8, k_codes=32, dim=64)
    index = index.cache()
    rows = index.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r.codes)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(index, cents, cbs, queries, k=5, n_probe=3).collect()
    }
    reranked = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            index, cents, cbs, queries, k=5, n_probe=3, rerank=50, corpus=emb
        ).collect()
    }
    coarse = len(exact & plain) / len(exact)
    fine = len(exact & reranked) / len(exact)
    assert coarse >= 0.15, f"IVF-PQ coarse recall collapsed: {coarse}"
    assert fine >= 0.5, f"IVF-PQ reranked recall collapsed: {fine}"
    assert fine > coarse


def test_vector_index_lifecycle_versioned(spark, tmp_dir):
    """The production lifecycle composed end-to-end: build IVF-PQ →
    publish the cell-partitioned index through versioned_publish →
    read_latest → search gives identical results to the in-memory
    index; a republish later doesn't disturb the pointer semantics
    (rollback returns the v1 answer)."""
    import json

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_topk,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        read_latest,
        rollback_version,
        versioned_publish,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    root = f"{tmp_dir}/vecindex"

    index, cents, cbs = ivfpq_build(emb, n_centroids=8, m=8, k_codes=32, dim=64)
    v = versioned_publish(
        index,
        root,
        writer=lambda df, p: df.write.partitionBy("cell").parquet(p),
    )
    with open(f"{root}/v={v}/quantizers.json", "w") as fh:
        json.dump({"centroids": cents, "codebooks": cbs}, fh)

    with open(f"{root}/v={v}/quantizers.json") as fh:
        q = json.load(fh)
    stored = read_latest(spark, root)
    mem = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(index, cents, cbs, queries, k=3, n_probe=3).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(
            stored, q["centroids"], q["codebooks"], queries, k=3, n_probe=3
        ).collect()
    }
    assert got == mem

    # republish a decoy v2, then roll back — search answers from v1
    versioned_publish(
        index.filter(F.col("cell") == 0),
        root,
        writer=lambda df, p: df.write.partitionBy("cell").parquet(p),
    )
    rollback_version(root, v)
    back = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(
            read_latest(spark, root), q["centroids"], q["codebooks"],
            queries, k=3, n_probe=3,
        ).collect()
    }
    assert back == mem


def test_semdedup_drops_planted_twins_keeps_originals(spark):
    """SemDeDup: two well-separated clusters of vectors, twins planted
    with higher ids — every twin drops, every original (and every
    non-duplicated vector) survives, across clusters nothing pairs."""
    import math

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        semdedup,
    )

    rows = []
    # cluster A around +x, cluster B around +y, 6 vectors each spaced
    # 0.12 rad apart (cos 0.9928 < 0.995 threshold) so only the exact
    # twins pair; cross-cluster cosine tops out at sin(0.6) ≈ 0.56
    for i in range(6):
        ang = 0.12 * i
        rows.append((i, [math.cos(ang), math.sin(ang), 0.0]))
        rows.append((100 + i, [0.0, math.cos(ang), math.sin(ang)]))
    twins = [(1000 + vid, v) for vid, v in rows if vid in (0, 3, 103)]
    df = spark.createDataFrame(
        rows + twins, "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r.is_dup for r in semdedup(
        df, n_clusters=2, threshold=0.995, seed=7
    ).collect()}
    assert len(out) == 15
    # planted twins are exact copies with larger ids → dropped
    assert out[1000] and out[1003] and out[1103]
    # originals and all other vectors survive
    assert not any(out[vid] for vid, _ in rows)


def test_semdedup_inherits_cluster_size_guard(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        semdedup,
    )

    # 9 near-parallel vectors over 2 cells → some cell holds ≥ 5 > 4
    vecs = [(i, [1.0, float(i) / 100.0]) for i in range(9)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    with pytest.raises(SparkRuntimeException, match="embedding_near_dup_pairs_lsh"):
        semdedup(df, n_clusters=2, threshold=0.99, max_cluster_rows=4).collect()


def test_embedding_decontaminate_flags_near_heldout(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),        # exact copy of eval item
            (1, [0.999, 0.045]),    # paraphrase-close to eval (cos≈0.999)
            (2, [0.0, 1.0]),        # orthogonal — clean
            (3, [-1.0, 0.0]),       # opposite — clean
        ],
        "vec_id long, embedding array<float>",
    )
    heldout = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {
        r.vec_id: r.is_contaminated
        for r in embedding_decontaminate(corpus, heldout, 0.97).collect()
    }
    assert out == {0: True, 1: True, 2: False, 3: False}


def test_hashed_doc_vectors_geometry_and_text_semdedup(spark):
    """Feature-hashed vectors: identical texts → identical unit
    vectors (cosine 1), token-disjoint texts → cosine 0 (modulo
    bucket collisions — dim 512 over 6 tokens makes them vanishingly
    unlikely), and composing with semdedup finds planted TEXT twins
    with no external embeddings."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        cosine,
        hashed_doc_vectors,
        semdedup,
    )

    rows = [
        (0, ["alpha", "beta", "gamma"]),
        (1, ["alpha", "beta", "gamma"]),     # twin of 0
        (2, ["delta", "epsilon", "zeta"]),   # disjoint
        (3, []),                             # empty → no row
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    vecs = hashed_doc_vectors(toked, dim=512)
    got = {r.doc_id: r.embedding for r in vecs.collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == got[1]
    # unit norm
    assert abs(sum(x * x for x in got[0]) - 1.0) < 1e-12
    # disjoint tokens → orthogonal buckets
    pair = spark.createDataFrame(
        [(got[0], got[2])], "a array<double>, b array<double>"
    )
    assert abs(pair.select(cosine("a", "b").alias("c")).collect()[0].c) < 1e-12

    # text-only semantic dedup: twin 1 drops, everything else survives
    out = {
        r.vec_id: r.is_dup
        for r in semdedup(
            vecs.withColumnRenamed("doc_id", "vec_id"),
            n_clusters=2,
            threshold=0.99,
            seed=7,
        ).collect()
    }
    assert out == {0: False, 1: True, 2: False}


def test_catalog_persisted_ivf_probe_prunes_partitions(spark):
    """The driver-visible persisted-index probe must actually serve
    from the cell-partitioned store with dynamic partition pruning in
    its executed plan, and agree with the fused in-session form."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import (
        QUERIES,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ivf_topk,
    )

    df = QUERIES["s_ivf_persisted_index"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    fused = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=2
        ).collect()
    }
    got = {(r.query_id, r.neighbor_id, r.rank) for r in df.collect()}
    assert got == fused


def test_adaptive_n_planes_keeps_bucket_population_bounded():
    """Plane count must grow with log2(N) so expected bucket
    population (N / 2^planes) stays near the target — the fixed-plane
    form is quadratic under corpus growth (round-5 scale bench)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        adaptive_n_planes,
    )

    assert adaptive_n_planes(100) == 4          # floor for tiny corpora
    assert adaptive_n_planes(2_000) == 4        # 2000/16 = 125 <= 256ish
    assert adaptive_n_planes(20_000) == 7       # 20000/128 ~ 156
    assert adaptive_n_planes(2_000_000) == 13
    assert adaptive_n_planes(10**12) == 16      # capped
    for n in (10_000, 100_000, 10_000_000):
        p = adaptive_n_planes(n)
        if p < 16:  # below the cap the population bound must hold
            assert n / 2**p <= 256 * 2  # within 2x of target


def test_multiprobe_lsh_superset_and_monotone_recall(spark):
    """Multi-probe query bucketing emits a strict superset of the
    single-probe rows (probe 0 IS the base bucket), so ann_topk_lsh
    recall@k is monotone in n_probes; multi-probe must also beat or
    match single-probe recall vs exact brute force on real data."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        ann_topk_lsh,
        brute_force_topk,
        hyperplane_buckets,
        hyperplane_probe_buckets,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)

    single = {
        (r["vec_id"], r["table_id"], r["bucket"])
        for r in hyperplane_buckets(queries, 4, 4, 64).select(
            "vec_id", "table_id", "bucket").collect()
    }
    multi = {
        (r["vec_id"], r["table_id"], r["bucket"])
        for r in hyperplane_probe_buckets(
            queries, 4, 4, 64, n_probes=3
        ).select("vec_id", "table_id", "bucket").collect()
    }
    assert single <= multi
    # 3 probes over 4 tables: at most 12 distinct (vec, table, bucket)
    assert len(multi) <= 3 * len(single)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(n_probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(
                emb, queries, k=5, n_planes=4, n_tables=4,
                n_probes=n_probes,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1  # candidate superset ⇒ monotone recall
    assert r3 >= 0.5, f"multi-probe recall collapsed: {r3}"

    # bounds validation
    import pytest

    with pytest.raises(ValueError, match="n_probes"):
        hyperplane_probe_buckets(queries, 4, 4, 64, n_probes=6).collect()


def test_seed_quantize_sql_literals_match_lit_build(spark):
    """Round-13 optimization pin: seed_quantize builds its argmax
    expression as ONE parsed SQL string (the F.lit-per-element form
    cost ~n_seeds x dim py4j round-trips of pure driver time). The
    parsed literals must round-trip bit-exactly — repr() doubles with
    the D suffix / DOUBLE cast — so cell assignment is identical to
    the Column-built tree, including knife-edge cosine ties."""
    import math

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        _dot,
        _norm,
        as_double,
        seed_quantize,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r["vec_id"]: r["cell"]
        for r in seed_quantize(emb, n_seeds=8).select("vec_id", "cell").collect()
    }

    # reference: the pre-round-13 Column-by-Column build (bit-exact
    # same tree, just constructed via py4j literals)
    c = emb.select(F.col("vec_id").alias("id"), as_double("embedding").alias("cv"))
    seeds = (
        c.orderBy("id").limit(8)
        .select(F.col("id").alias("seed_id"), F.col("cv").alias("sv"))
        .collect()
    )

    def pynorm(vals):
        acc = 0.0
        for x in vals:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    with_n = c.select("id", "cv", _norm("cv").alias("__ncv"))
    cands = F.array(*[
        F.struct(
            (
                _dot("cv", F.array(*[F.lit(float(x)) for x in r["sv"]]))
                / (F.col("__ncv") * F.lit(pynorm(r["sv"])))
            ).alias("c"),
            F.lit(-int(r["seed_id"])).cast("bigint").alias("negid"),
        )
        for r in seeds
    ])
    ref = {
        r["id"]: r["cell"]
        for r in with_n.select(
            "id", (-F.array_max(cands)["negid"]).alias("cell")
        ).collect()
    }
    assert got == ref


def test_embedding_near_dup_matmul_matches_fold_verify(spark):
    """Round-13 optimization pin: the in-bucket verify is a numpy
    matmul over unit vectors (Arrow applyInPandas) instead of the
    interpreted per-pair zip_with fold. Pair membership must match
    the fold form exactly — float-order noise (~1e-15) is far below
    the threshold spacing on real data."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        _dot,
        _norm,
        as_double,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for thr in (0.35, 0.92):
        got = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(
                emb, threshold=thr, bucket_col="label"
            ).collect()
        }
        base = (
            emb.select(
                F.col("label").alias("bucket"),
                F.col("vec_id").alias("id"),
                as_double("embedding").alias("v"),
            )
            .select("bucket", "id", "v", _norm("v").alias("nrm"))
            .select(
                "bucket", "id", F.expr("transform(v, x -> x / nrm)").alias("vn")
            )
        )
        a = base.select(
            "bucket", F.col("id").alias("id_a"), F.col("vn").alias("vna")
        )
        b = base.select(
            "bucket", F.col("id").alias("id_b"), F.col("vn").alias("vnb")
        )
        ref = {
            (r.id_a, r.id_b)
            for r in (
                a.join(b, "bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .filter(_dot("vna", "vnb") >= thr)
                .select("id_a", "id_b")
            ).collect()
        }
        assert got == ref, f"pair set diverged at threshold {thr}"


def test_lsh_int8_screen_certify_membership_exact(spark):
    """Round 14: the bucket exchange carries int8-quantized unit
    vectors and the in-bucket matmul only SCREENS (threshold − proven
    margin); membership is decided by the exact float64 certify. Plant
    pairs INSIDE the int8 margin band on both sides of the threshold —
    the output must equal the exact-threshold pairs over co-bucketed
    candidates, i.e. quantization must be invisible in the result."""
    import math

    import numpy as np

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
        hyperplane_buckets,
    )

    dim = 16
    thr = 0.35
    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    base_vecs = rng.randn(40, dim)
    for v in base_vecs:
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    # planted pairs at exact cosine thr ± eps for eps inside the int8
    # band (margin at dim 16 ≈ 2·4/254 ≈ 0.0316) and outside it
    for eps in (0.02, 0.005, 1e-4, -1e-4, -0.005, -0.02, 0.2, -0.2):
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        u = rng.randn(dim)
        u -= u.dot(v) * v
        u /= np.linalg.norm(u)
        c = thr + eps
        w = c * v + math.sqrt(1 - c * c) * u
        rows.append((vid, v.tolist()))
        rows.append((vid + 1, w.tolist()))
        vid += 2
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_lsh(
            emb, threshold=thr, n_planes=3, n_tables=12, dim=dim
        ).collect()
    }
    # expected: exact float64 threshold over CO-BUCKETED pairs (same
    # bucket assignment the operator uses)
    co = {}
    for r in hyperplane_buckets(
        emb, n_planes=3, n_tables=12, dim=dim
    ).collect():
        co.setdefault((r.table_id, r.bucket), []).append(r.vec_id)
    # float32-cast first: the operator receives array<float> parquet/
    # createDataFrame columns, so its float64 unit vectors derive from
    # the float32 values
    vec = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).collect()
    }
    expected = set()
    for members in co.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                va, vb = vec[a], vec[b]
                cos = float(
                    np.dot(va, vb)
                    / (np.linalg.norm(va) * np.linalg.norm(vb))
                )
                if cos >= thr:
                    expected.add((min(a, b), max(a, b)))
    assert got == expected


def test_probe_cells_sql_build_matches_column_build(spark):
    """Round 14: the literal probe expression builds as ONE parsed SQL
    string (the Column-by-Column form issued ~n_centroids × dim py4j
    round-trips of pure driver time per plan build). The parsed tree
    must select bit-identical probe cells to the F.lit build."""
    import numpy as np

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.similarity import (
        _probe_cells,
    )

    rng = np.random.RandomState(3)
    cents = [[float(x) for x in rng.randn(8)] for _ in range(16)]
    qs = [(i, [float(x) for x in rng.randn(8)]) for i in range(64)]
    df = spark.createDataFrame(qs, "qid long, v array<double>")
    sql_built = {
        r.qid: list(r.p)
        for r in df.select(
            "qid",
            _probe_cells(cents, F.col("v"), 3, qv_sql="v").alias("p"),
        ).collect()
    }
    col_built = {
        r.qid: list(r.p)
        for r in df.select(
            "qid", _probe_cells(cents, F.col("v"), 3).alias("p")
        ).collect()
    }
    assert sql_built == col_built
