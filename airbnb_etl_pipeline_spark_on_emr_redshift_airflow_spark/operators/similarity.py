"""Embedding similarity search — brute-force cosine baseline + LSH
bucketed ANN (training-data extension; SURVEY.md §7.2 step 8).

Vectors stay as ``array<float>`` columns; all math is JVM-side array
expressions (``zip_with`` products folded with ``aggregate``) — no
Python, no per-row UDF — except where a stage is a genuinely dense
matrix op (hyperplane matmuls, PQ codebook argmins/LUTs), which runs
as an Arrow-batched numpy Pandas UDF instead. The brute-force path
broadcasts the (small) query set against the corpus: O(queries ×
corpus) dot products inside whole-stage codegen, then a per-query
top-k window. Three scale strategies compose on top:

- **pruning** — hyperplane-LSH buckets and IVF cells cut which rows
  a query touches (recall tuned by planes/tables or cells/probes);
- **persistence** — IVF's cell-partitioned store and DPP make the
  partitioning itself the index;
- **compression** — product quantization shrinks vectors ~64× to
  m one-byte codes; ADC scores by table lookup and an exact re-rank
  of the shortlist recovers near-exact recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two double-array columns (cast float
    embeddings to ``array<double>`` first for cross-engine-stable
    arithmetic)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(vec: str) -> Column:
    return F.col(vec).cast("array<double>")


def cosine_pandas(a: str | Column, b: str | Column) -> Column:
    """Arrow-vectorized cosine via a Pandas UDF — the alternative hot
    path when vector math outgrows expression trees (e.g. 1k+ dims,
    where per-element ``zip_with`` codegen bloats). Batches arrive as
    numpy-convertible arrays; one BLAS-ish pass per batch.

    Note: float summation order inside numpy differs from the JVM
    fold, so results match :func:`cosine` to ~1e-12, not bit-exact —
    keep the expression version for oracle-checked queries.
    """
    @F.pandas_udf("double")
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        am = np.stack(av.to_numpy())
        bm = np.stack(bv.to_numpy())
        dots = np.einsum("ij,ij->i", am, bm)
        norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(dots / norms)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast; the corpus streams through the
    dot-product map stage once; the only shuffle is the per-query
    top-k window. Self-matches excluded. Ties broken by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("qv", "cv").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: a KMeans coarse quantizer assigns
    every corpus vector to a centroid cell; each query probes its
    ``n_probe`` nearest cells and exact-cosine ranks only those
    candidates. The second ANN family next to hyperplane LSH — better
    for clustered data (cells adapt to density; hyperplanes don't).

    One-shot convenience form: :func:`ivf_build` + :func:`ivf_search`
    fused — the build/search split (with :func:`ivf_write_index` /
    :func:`ivf_read_index` persistence) is the production path, where
    the quantizer trains once and queries prune to their probed
    cells."""
    assigned, centroids = ivf_build(
        corpus, n_centroids=n_centroids, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    return ivf_search(
        assigned, centroids, queries, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Train the IVF coarse quantizer and assign every corpus vector
    to its cell. Returns ``(assigned, centroids)``: a
    (neighbor_id, cv, cell) frame and the centroid list (tiny —
    n_centroids × dim floats — safe as plan literals / JSON).

    The KMeans fit is MLlib's distributed Lloyd iteration. At corpus
    scale pass ``train_fraction``: the quantizer trains on a
    deterministic hash-sample (id-keyed, layout-independent) — cell
    quality needs a representative sample, not every vector — while
    ASSIGNMENT still covers the full corpus in one scan-stage
    ``model.transform``. ``max_iter`` trades quantizer quality for
    training jobs (each Lloyd round is a cluster-wide pass over the
    training sample); blocking/pruning uses converge-enough in a few
    rounds — recall comes from the verify stage, not centroid
    optimality."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    ).withColumn("features", array_to_vector("cv"))
    train = base
    if train_fraction is not None:
        keep = F.pmod(F.xxhash64(F.col("neighbor_id"), F.lit(seed)), 10000)
        train = base.filter(keep < int(train_fraction * 10000))
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="features", maxIter=max_iter
    ).fit(train)
    assigned = model.transform(base).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )
    return assigned, [c.tolist() for c in model.clusterCenters()]


def ivf_write_index(
    assigned: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Persist an IVF index: the assigned corpus lands PARTITIONED BY
    CELL (``cell=<i>/`` hive layout), the centroids as one small JSON
    file beside it. Partitioning is the index: a search that probes
    ``n_probe`` of ``n_centroids`` cells scans only those directories
    (partition pruning — verified by plan test), i.e. ~n_probe/n_cells
    of the corpus bytes, with no row-level index structure at all."""
    import json as _json

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors"
    )
    # one tiny metadata file: the centroid list is n_cells × dim
    # floats by construction (KB), never data-sized. Routed through
    # the Hadoop FileSystem so the index root may live beside the
    # vectors on any store the session reaches (s3a://, hdfs://, …).
    spark = assigned.sparkSession
    fsutil.mkdirs(spark, path)
    fsutil.write_text_atomic(
        spark, f"{path.rstrip('/')}/centroids.json", _json.dumps(centroids)
    )


def ivf_read_index(
    spark, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """Load a persisted IVF index: (cell-partitioned vectors frame,
    centroid list). Filters on ``cell`` prune at the directory level."""
    import json as _json

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    centroids = _json.loads(
        fsutil.read_text(spark, f"{path.rstrip('/')}/centroids.json")
    )
    return spark.read.parquet(f"{path}/vectors"), centroids


# Above this many centroids the literal expression tree (one struct +
# dim-wide array literal per centroid) bloats the plan and eventually
# breaks codegen (~2^16 branches); the Arrow-batched numpy form takes
# over — one matmul per record batch, centroid matrix in the closure.
_PROBE_LITERAL_MAX_CENTROIDS = 256


def _sql_double(x: float) -> str:
    """A SQL literal that parses to exactly the double ``x`` —
    ``repr`` round-trips doubles and the ``D`` suffix keeps Spark from
    reading them as decimals (the seed_quantize round-13 device)."""
    r = repr(float(x))
    return f"{r}D" if ("e" not in r and "E" not in r) else f"CAST({r} AS DOUBLE)"


def _probe_cells(
    centroids: list[list[float]],
    qv,
    n_probe: int,
    impl: str | None = None,
    qv_sql: str | None = None,
):
    """Expression: the ``n_probe`` nearest centroid cell ids (an
    ``array<int>``, nearest first) for a query vector.

    Two interchangeable implementations, dispatched on quantizer size
    (``impl`` forces one for testing): up to
    ``_PROBE_LITERAL_MAX_CENTROIDS`` the centroids compile in as
    expression literals (no driver loop over data, no join, stays in
    the JVM); past that — a production IVF index at 10⁹ vectors wants
    2¹⁴–2¹⁶ cells — the distances compute in ONE Arrow-batched numpy
    matmul per batch (same dense-matrix rationale as
    :func:`hyperplane_buckets`). Ties break toward the lower cell id
    in both forms.

    ``qv_sql`` (round 14): the query vector as a SQL fragment. When
    given, the whole literal expression is BUILT as one SQL string
    parsed by a single ``F.expr`` call — the Column-by-Column form
    issues ~n_centroids × dim py4j round-trips for the literals alone
    (~0.5 s of DRIVER time per plan build at 8 × 64, measured on the
    IVF serving read, guide §1: the cost was plan CONSTRUCTION, not
    the stages). ``repr``-round-tripped double literals make the
    parsed tree node-for-node the one ``F.lit`` built, so probe
    selection is bit-identical (pinned by
    test_probe_cells_sql_build_matches_column_build)."""
    n = len(centroids)
    if impl is None:
        impl = (
            "literal" if n <= _PROBE_LITERAL_MAX_CENTROIDS else "vectorized"
        )
    if impl == "literal":
        if qv_sql is not None:
            structs = []
            for cid, center in enumerate(centroids):
                arr = ", ".join(_sql_double(x) for x in center)
                dist2 = (
                    f"aggregate(zip_with({qv_sql}, array({arr}), "
                    "(x, y) -> (x - y) * (x - y)), "
                    "cast(0.0 as double), (acc, v) -> acc + v)"
                )
                structs.append(
                    f"named_struct('d', {dist2}, 'cell', {cid})"
                )
            return F.expr(
                f"transform(slice(array_sort(array({', '.join(structs)})), "
                f"1, {int(n_probe)}), s -> s.cell)"
            )
        cells = []
        for cid, center in enumerate(centroids):
            lit_center = F.array(*[F.lit(float(x)) for x in center])
            dist2 = F.aggregate(
                F.zip_with(qv, lit_center, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
            cells.append(F.struct(dist2.alias("d"), F.lit(cid).alias("cell")))
        return F.transform(
            F.slice(F.array_sort(F.array(*cells)), 1, n_probe),
            lambda s: s["cell"],
        )
    if impl != "vectorized":
        raise ValueError(f"unknown probe impl {impl!r}")
    cent = np.asarray(centroids, dtype=np.float64)  # (C, dim)
    cent_sq = (cent ** 2).sum(axis=1)
    k_probe = min(n_probe, n)

    @F.pandas_udf("array<int>")
    def probe_of(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(v, "_probe_cells")
        # ||q - c||² = ||q||² + ||c||² - 2 q·c ; ||q||² is constant per
        # row, hence rank-invariant and dropped.
        d2 = cent_sq[None, :] - 2.0 * (mat @ cent.T)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k_probe]
        return pd.Series(list(idx.astype(np.int32)))

    return probe_of(qv)


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_impl: str | None = None,
) -> DataFrame:
    """Search an IVF index (from :func:`ivf_build` or
    :func:`ivf_read_index`): each query probes its ``n_probe`` nearest
    cells, exact cosine ranks the candidates, top-``k`` per query.

    The (small by contract) query set broadcasts with its probed cells
    exploded. When ``assigned`` comes off a cell-partitioned store,
    DYNAMIC PARTITION PRUNING fires on the broadcast join key: the
    probed cell set (≤ n_queries × n_probe ints) reaches the file
    index as a runtime filter and whole cell directories are skipped —
    the scan touches ~n_probe/n_centroids of the corpus bytes with no
    driver-side cell harvesting (asserted via the plan's
    dynamicpruning subquery in tests)."""
    qv = as_double(vec_col)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        F.explode(
            _probe_cells(
                centroids,
                qv,
                n_probe,
                impl=probe_impl,
                qv_sql=f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)",
            )
        ).alias("cell"),
    )

    scored = (
        assigned.join(F.broadcast(qb), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("qv", "cv").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.92,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_rows: int | None = 50_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking bucket
    (e.g. a cluster label): equi-join on the bucket key bounds the
    pair explosion, exact cosine filters. Returns (id_a, id_b) with
    id_a < id_b.

    SMALL-SCALE ONLY: with L coarse labels the in-bucket self-join is
    O((N/L)²). At corpus scale use
    :func:`embedding_near_dup_pairs_lsh`, which blocks on hyperplane-
    LSH buckets instead (exponentially smaller buckets, tunable
    recall). The quadratic is GUARDED: any bucket larger than
    ``max_bucket_rows`` fails the job with an error naming the LSH
    form, instead of silently launching an O(n²) self-join. The guard
    is a per-bucket count window folded into a filter via
    ``assert_true`` — fully lazy and distributed (no driver-side
    count), one extra exchange-free window on the partitioning the
    join needs anyway. Pass ``max_bucket_rows=None`` to disable.

    The in-bucket verify is ONE numpy matmul over the bucket's unit
    vectors (Arrow-batched ``applyInPandas``, guide §4.2) — the same
    verify shape :func:`embedding_near_dup_pairs_lsh` documents: a
    BLAS dot is ~100× cheaper than the interpreted per-pair
    ``zip_with`` fold this replaced (CodegenFallback, boxed per
    element; measured 1.05 s → ~0.1 s for the in-bucket stage at
    sf0.1), and the exchange count drops from two (window + self-join)
    to one (the group-by bucket shuffle the window guard rides).
    Membership is unchanged: float-order noise (~1e-15 for dim-64
    unit vectors) sits many orders of magnitude below the value
    spacing at any realistic threshold — the same argument the LSH
    form's verify makes. The matmul is row-blocked so transient
    memory stays bounded even near ``max_bucket_rows``."""
    base = emb.select(
        F.col(bucket_col).alias("bucket"),
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("v"),
    )
    if max_bucket_rows is not None:
        # count(*) over (partition by bucket) — no orderBy, so no sort;
        # its hash partitioning is the same one the group-by verify
        # requires, so the window rides that exchange. assert_true
        # inside a FILTER can't be pruned away by Catalyst (an unused
        # projected column would be).
        n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
        guard = F.assert_true(
            F.col("__bucket_n") <= max_bucket_rows,
            F.concat_ws(
                "",
                F.lit("embedding_near_dup_pairs: bucket "),
                F.col("bucket").cast("string"),
                F.lit(" holds "),
                F.col("__bucket_n").cast("string"),
                F.lit(
                    f" rows (> max_bucket_rows={max_bucket_rows}); the "
                    "in-bucket self-join is O(n²) — use "
                    "embedding_near_dup_pairs_lsh (hyperplane-LSH "
                    "blocking) at this scale, or raise max_bucket_rows "
                    "explicitly."
                ),
            ),
        )
        base = (
            base.withColumn("__bucket_n", n_in_bucket)
            .filter(guard.isNull())
            .drop("__bucket_n")
        )
    thr = float(threshold)

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        mat = _stack_batch(pdf["v"], "embedding_near_dup_pairs")
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        mat = mat / nrm[:, None]
        ids = pdf["id"].to_numpy(dtype="int64")
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # row-blocked matmul: transient block is block×n doubles, so
        # memory stays bounded for buckets near the guard ceiling
        block = 1024
        for s in range(0, n, block):
            sims = mat[s : s + block] @ mat.T
            ia, ib = np.nonzero(sims >= thr)
            ia = ia + s
            keep = ids[ia] < ids[ib]
            out_a.append(np.minimum(ids[ia][keep], ids[ib][keep]))
            out_b.append(np.maximum(ids[ia][keep], ids[ib][keep]))
        id_a = np.concatenate(out_a) if out_a else np.array([], dtype="int64")
        id_b = np.concatenate(out_b) if out_b else np.array([], dtype="int64")
        if len(id_a) == 0:
            return empty
        return pd.DataFrame({"id_a": id_a, "id_b": id_b})

    return base.groupBy("bucket").applyInPandas(
        _verify, "id_a bigint, id_b bigint"
    )


def hashed_doc_vectors(
    toked: DataFrame,
    dim: int = 256,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Feature-hashed TF document vectors (the hashing trick,
    Weinberger et al. 2009 / MLlib HashingTF, rebuilt as pure column
    expressions): every token hashes to one of ``dim`` buckets, the
    per-document bucket counts become a dense L2-normalized
    ``array<double>``. Model-free embeddings — they turn the
    embedding-space operators (:func:`semdedup`, :func:`ann_topk_lsh`,
    :func:`embedding_decontaminate`, the PQ/IVF family) loose on RAW
    TEXT corpora with no external encoder: bag-of-words cosine is
    exactly what the hashed vectors' cosine approximates (collisions
    only ever merge buckets, which biases similarity UP slightly at
    small ``dim``).

    Returns (id, embedding). Zero-token documents emit no row.
    Determinism: xxhash64 bucketing is seed-stable across runs,
    partitionings, and cluster sizes; the scatter + L2 divide are
    order-independent.

    Scale shape: explode is scan-stage; ONE shuffle on (doc, bucket)
    for the counts; the densify step is an Arrow-batched numpy
    scatter (sparse entries → zeros[dim] → normalize). The tempting
    pure-expression form — ``map_from_entries`` probed by
    ``transform(sequence(0, dim-1), i -> element_at(m, i))`` — is
    O(entries) PER PROBE (Catalyst's map lookup is a linear scan),
    i.e. O(entries·dim) interpreted work per row: ~10× slower at
    dim 256. Same placement rationale as ``hyperplane_buckets``.
    Keep ``dim`` modest (128–1024): the dense row costs 8·dim bytes
    and downstream ANN folds are O(dim). Iterative consumers
    (KMeans in :func:`semdedup`) re-evaluate their input lineage
    several times — persist/checkpoint the returned frame first."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col("term")), F.lit(dim))
    counts = (
        terms.withColumn("bucket", bucket.cast("int"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = counts.groupBy("id").agg(
        F.collect_list(F.struct("bucket", "cnt")).alias("entries")
    )

    @pandas_udf("array<double>")
    def densify(entries: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for ent in entries:
            v = np.zeros(dim, dtype=np.float64)
            for e in ent:
                v[int(e["bucket"])] = float(e["cnt"])
            n = float(np.linalg.norm(v))
            out.append((v / n if n else v).tolist())
        return pd.Series(out)

    return per_doc.select(
        F.col("id").alias(id_col), densify("entries").alias("embedding")
    )


def embedding_decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic benchmark decontamination: flag every corpus vector
    whose embedding sits within ``threshold`` cosine of ANY held-out
    evaluation vector — the embedding-space complement of
    :func:`..dedup.decontaminate` (verbatim fingerprints + 13-gram
    shingles catch copies; this catches paraphrases and translations
    that share no n-gram with the benchmark). Returns one row per
    corpus vector: (id, is_contaminated); train on ``NOT
    is_contaminated``.

    Scale shape (same contract as the n-gram form): the held-out side
    is BENCHMARK-sized by contract — thousands of eval items, never
    corpus-sized — so it broadcasts explicitly and the comparison is
    one corpus scan with a per-(row, eval-item) cosine fold; the hit
    set reduces to distinct slim ids and re-attaches with one keyed
    left join. Nothing corpus-sized shuffles beyond that join. For an
    eval suite too big to broadcast, block both sides through
    :func:`hyperplane_buckets` first and verify only co-bucketed
    pairs."""
    c = corpus.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("cv")
    )
    h = heldout.select(as_double(vec_col).alias("hv"))
    hits = (
        c.crossJoin(F.broadcast(h))
        .filter(cosine("cv", "hv") >= threshold)
        .select("id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__hit", F.lit(False)).alias("is_contaminated"),
        )
    )


def seed_quantize(
    emb: DataFrame,
    n_seeds: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic nearest-SEED coarse quantizer (round 12): the
    ``n_seeds`` lowest-id vectors anchor the cells; every vector
    assigns to the anchor of maximum cosine (ties → smaller seed id).
    This is one Lloyd ASSIGNMENT step from a deterministic init — the
    "data-points-as-coarse-centroids" IVF variant — and exists as the
    SQL-REPLAYABLE rung of the quantizer ladder: unlike the MLlib
    KMeans fit (:func:`ivf_build` — kmeans|| init, order-dependent
    float means), every quantity here is a deterministic double
    expression (the same sequential-fold cosine the oracle-checked
    kNN family uses), so DuckDB reproduces the assignment bit for bit
    and cluster-blocked consumers (:func:`semdedup`) become
    value-hash-checkable end to end. Quantization quality is a notch
    below a fitted KMeans (anchors aren't density-adapted) — the
    cluster-then-threshold semantics are unchanged, only WHERE the
    cell boundaries fall.

    Scale shape: the seeds collect to the driver (``n_seeds`` rows —
    metadata-sized by contract, keep it ≤ a few hundred) and become
    LITERAL arrays, so assignment is pure scan-stage expression math:
    zero shuffles, zero joins, one corpus pass. Returns
    (id_col, vec_col as array<double>, cell)."""
    c = emb.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("cv")
    )
    seeds = (
        c.orderBy("id").limit(n_seeds)
        .select(F.col("id").alias("seed_id"), F.col("cv").alias("sv"))
        .collect()
    )
    if not seeds:
        raise ValueError("seed_quantize: empty input")

    # argmax cosine with smaller-id tie-break, as ONE expression:
    # max over (cos, -seed_id) structs, then negate the id back.
    # The row norm hoists to ONE fold per row (its own projection —
    # the folds are CodegenFallback, so per-seed reuse matters ~2×)
    # and each seed's norm precomputes in Python — bit-identical to
    # the SQL fold (same sequential 0.0-seeded accumulation, same
    # IEEE sqrt), so dot / (ncv · lit_norm) equals the textbook
    # cosine bit for bit and the DuckDB oracle replays unchanged.
    #
    # The expression is BUILT as one SQL string parsed by a single
    # ``F.expr`` call (round 13): the Column-by-Column form issued
    # ~n_seeds × dim py4j round-trips for the literals alone, which
    # dominated the whole query's wall time driver-side (guide §1:
    # the time was in neither stage nor shuffle but in plan
    # CONSTRUCTION). ``repr(float)`` round-trips doubles exactly and
    # the ``D`` suffix keeps Spark from parsing them as decimals, so
    # the parsed tree is node-for-node the one ``F.lit`` built —
    # bit-identical assignment (pinned by
    # test_seed_quantize_sql_literals_match_lit_build).
    import math

    def _pynorm(vals) -> float:
        acc = 0.0
        for x in vals:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    def _dlit(x: float) -> str:
        r = repr(float(x))
        return f"{r}D" if ("e" not in r and "E" not in r) else f"CAST({r} AS DOUBLE)"

    with_n = c.select("id", "cv", _norm("cv").alias("__ncv"))
    seed_exprs = []
    for r in seeds:
        arr = ", ".join(_dlit(x) for x in r["sv"])
        dot = (
            f"aggregate(zip_with(cv, array({arr}), (x, y) -> x * y), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
        )
        seed_exprs.append(
            f"named_struct('c', {dot} / (__ncv * {_dlit(_pynorm(r['sv']))}), "
            f"'negid', CAST({-int(r['seed_id'])} AS BIGINT))"
        )
    cands = F.expr(f"array({', '.join(seed_exprs)})")
    return with_n.select(
        F.col("id").alias(id_col),
        F.col("cv").alias(vec_col),
        (-F.array_max(cands)["negid"]).alias("cell"),
    )


def semdedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.92,
    seed: int = 42,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int | None = 50_000,
    max_iter: int = 8,
    quantizer: str = "kmeans",
) -> DataFrame:
    """Semantic deduplication à la SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then mark
    near-duplicates WITHIN each cluster by exact cosine — the
    clustering makes the quadratic verify tractable by construction
    (pairs only form inside a cell, and cells track data density,
    unlike fixed label blocking). The published recipe for pruning
    semantically-redundant web data before pretraining.

    Returns one row per vector: (id, is_dup) where ``is_dup`` marks a
    vector having a near-duplicate with a SMALLER id in its cluster —
    the deterministic greedy keep rule (the paper keeps one exemplar
    per duplicate group; min-id is the engine's canonical survivor
    convention, cf. ``dedup.exact_dedup_fingerprint``). Filtering
    ``NOT is_dup`` yields the deduplicated corpus. Chains where a→b
    and b→c but a̸→c keep both a and c: only *direct* near-duplicates
    drop, matching SemDeDup's ε-ball semantics (for transitive
    cluster collapse compose with ``dedup.connected_components``).

    Scale shape: the KMeans fit trains on a deterministic hash-sample
    when ``train_fraction`` is set (:func:`ivf_build`), assignment is
    one scan-stage ``model.transform``; the in-cluster self-join
    inherits :func:`embedding_near_dup_pairs`'s lazy per-bucket size
    guard (``max_cluster_rows``) — an over-dense cell fails loudly
    with the count that broke it instead of detonating an O(n²) join,
    the signal to raise ``n_clusters`` for the corpus; the final
    membership attach is one keyed left join of slim id pairs.

    ``quantizer`` picks the cell partitioner: ``"kmeans"`` (default —
    the paper's fitted Lloyd clustering via :func:`ivf_build`) or
    ``"seeds"`` (:func:`seed_quantize` — the deterministic,
    SQL-replayable nearest-seed assignment; same cluster-then-
    threshold semantics, value-hash-checkable end to end, slightly
    less density-adapted cells)."""
    if quantizer == "seeds":
        clustered = seed_quantize(
            emb, n_seeds=n_clusters, id_col=id_col, vec_col=vec_col
        )
    elif quantizer == "kmeans":
        assigned, _ = ivf_build(
            emb,
            n_centroids=n_clusters,
            seed=seed,
            train_fraction=train_fraction,
            id_col=id_col,
            vec_col=vec_col,
            max_iter=max_iter,
        )
        clustered = assigned.select(
            F.col("neighbor_id").alias(id_col),
            F.col("cv").alias(vec_col),
            "cell",
        )
    else:
        raise ValueError(
            f"semdedup: unknown quantizer {quantizer!r} "
            "(expected 'kmeans' or 'seeds')"
        )
    pairs = embedding_near_dup_pairs(
        clustered,
        threshold=threshold,
        bucket_col="cell",
        id_col=id_col,
        vec_col=vec_col,
        max_bucket_rows=max_cluster_rows,
    )
    drops = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        clustered.select(id_col)
        .join(drops, id_col, "left")
        .select(
            id_col, F.coalesce("__dup", F.lit(False)).alias("is_dup")
        )
    )


def adaptive_n_planes(
    n_rows: int, target_bucket_rows: int = 256, floor: int = 4, cap: int = 16
) -> int:
    """Plane count that keeps the expected LSH bucket population
    (``n_rows / 2^planes``) near ``target_bucket_rows`` as the corpus
    grows: ``ceil(log2(n / target))`` clamped to [floor, cap]. With a
    FIXED plane count the bucket count is constant, in-bucket
    population grows with N, and the bucket self-join is O(N²) — the
    round-5 scale-decade bench caught exactly that (3.3 s → 86 s at
    10× data). Log-scaled planes make candidate pairs ≈
    n_tables × N × target / 2 — linear in N."""
    import math

    if n_rows <= target_bucket_rows:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n_rows / target_bucket_rows))))


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.92,
    n_planes: int | None = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_rows: int = 160,
    max_bucket_rows: int | None = 4096,
    max_planes: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs blocked by hyperplane-LSH
    buckets — the 100 TB form of :func:`embedding_near_dup_pairs`.

    ``max_planes`` caps the adaptive plane count (recall at loose
    thresholds falls with every added plane — the standard LSH trade).
    Past ``N ≈ 2^max_planes × target_bucket_rows`` rows (~10 M at the
    defaults) the per-table pattern space is exhausted: the hash-mod
    can only merge patterns, never split them, so bucket populations
    grow past the target and the ``max_bucket_rows`` guard eventually
    fires. At that corpus size raise ``max_planes`` (and ``n_tables``
    to buy the recall back) — the guard's error is the loud signal.

    The label-blocked variant is small-scale only: with L coarse
    labels the in-bucket self-join is O((N/L)²) pairs. Here the
    blocking key is (table_id, bucket) from
    :func:`hyperplane_buckets`, so the expected in-bucket population
    is N/2^n_planes per table — tunable, and collision probability
    concentrates on high-cosine pairs (p1 = 1 - θ/π per plane).

    ``n_planes=None`` sizes the plane count from the corpus
    (:func:`adaptive_n_planes`): one cheap count, then
    ``ceil(log2(N / target_bucket_rows))`` planes for recall, and the
    sign patterns hash-mod onto EXACTLY ``ceil(N / target)`` buckets —
    population is pinned at the target for every N (no power-of-2
    wobble), so candidate pairs (and wall-clock) scale LINEARLY
    instead of quadratically. A fixed ``n_planes`` is a fixed bucket
    count: fine for a known corpus size, quadratic under growth.

    Recall for pairs at cosine s: 1 - (1 - p1(s)^n_planes)^n_tables.
    At 4 planes × 16 tables that is ≈0.92 recall at s = 0.35 and
    ≈1.0 at s ≥ 0.9. More planes (bigger corpora) sharpen the bias
    toward high-cosine pairs: recall at loose thresholds falls while
    true near-dups (s ≥ 0.9) stay ≈1.0 — raise n_tables to win loose
    recall back (standard LSH trade).

    VERIFY SHAPE (round 7, payload slimmed round 14): the in-bucket
    pass runs INSIDE each (table, bucket) group as ONE numpy matmul
    (Arrow-batched ``applyInPandas``) — but over INT8-QUANTIZED unit
    vectors carried as ``dim``-byte BINARY through the bucket
    exchange, screening at ``threshold − margin`` where ``margin`` is
    the proven worst-case quantization error (≤ 2·√d/254 + d/254²
    for round-to-nearest on unit vectors). The surviving candidates —
    output-sized plus the tiny margin band — dedup across tables and
    re-attach the exact float64 unit vectors by keyed join for the
    final unquantized threshold (the JVM sequential-fold dot, the
    catalog's oracle arithmetic). Structure per guide §8: every
    corpus-sized exchange moves a lightweight proxy (16 × ~dim bytes
    per doc instead of 16 × ~8·dim — ~5× fewer bytes at dim 64); the
    full-precision vectors are only ever touched by scans and a
    candidate-sized join.

    Why screen-then-certify instead of exact in-bucket emission (the
    round-7..13 form): the bucket exchange was the chain's one
    corpus×n_tables shuffle of full doubles — at 10⁹ docs × 16 tables
    ~8 TB of vector bytes. The certify join costs two extra corpus
    SCANS (no exchange: AQE broadcasts the candidate side when small;
    past that the keyed join streams the vector table) — scans are
    the cheap currency at 100 TB, exchanges are not. Membership is
    EXACT-threshold by construction: the screen margin makes false
    negatives impossible, and the certify applies the same fold
    arithmetic the catalog's cos_fp gates replay (pairs planted
    inside the margin band on both sides pin this in
    tests/test_similarity.py).

    ``max_bucket_rows`` is the loud-failure guard (same philosophy as
    :func:`embedding_near_dup_pairs`): a group larger than it — a
    duplicate-heavy corpus collapsing into one sign pattern, or a
    fixed ``n_planes`` outgrown by N — raises with the offending
    bucket and count instead of silently densifying a (pop × pop)
    similarity matrix (4096² doubles ≈ 134 MB is the default ceiling;
    the adaptive path pins expected population at ``target``, ~26×
    under it). ``None`` disables the guard.
    """
    n_buckets = None
    if n_planes is None:
        n_rows = emb.count()
        n_planes = adaptive_n_planes(
            n_rows, target_bucket_rows, cap=max_planes
        )
        # Power-of-2 granularity smoothing (round 6): 2^ceil(log2(...))
        # lets the realized bucket population wobble anywhere in
        # (target/2, target] depending on where N lands between powers
        # of two, so the candidate-pair count — N·pop/2 per table —
        # drifts up to 2x off linear between scale decades. Mapping
        # the sign patterns onto EXACTLY ceil(N/target) buckets via a
        # per-table hash-mod pins the population at the target for
        # every N: candidates become exactly linear. Merging patterns
        # can only add false-positive candidates (the exact-cosine
        # verify removes them); recall is set by n_planes alone, which
        # is unchanged.
        n_buckets = max(1, -(-n_rows // target_bucket_rows))
    b = hyperplane_buckets(
        emb, n_planes=n_planes, n_tables=n_tables, dim=dim, seed=seed,
        vec_col=vec_col,
    ).select("table_id", "bucket", F.col(id_col).alias("id"))
    if n_buckets is not None and n_buckets < 2 ** n_planes:
        # table_id in the hash → each table merges a DIFFERENT random
        # pattern subset, preserving the OR-amplification independence
        b = b.withColumn(
            "bucket",
            F.pmod(F.xxhash64("table_id", "bucket"), F.lit(n_buckets)),
        )
    # QUANTIZED CARRIAGE through the bucket exchange (round 14, guide
    # §2.3 narrower types + §8 "decide with small rows, move big rows
    # once"): the only corpus×n_tables exchange in the chain used to
    # ship each unit vector as array<double> (~530 B/row) — at 10⁹
    # docs × 16 tables that exchange alone is ~8 TB. The in-bucket
    # pass only needs enough precision to SCREEN candidates, so the
    # exchange now carries an int8 quantization of the unit vector
    # (dim bytes packed as BINARY, ~5× fewer bytes/row), the in-bucket
    # matmul screens at ``threshold − margin`` where ``margin`` is the
    # PROVEN worst-case quantization error (per element ≤ 1/254 after
    # round-to-nearest, so |q̂·ŵ − q·w| ≤ 2·√d/254 + d/254² for unit
    # vectors — no false negative is possible), and the surviving
    # candidate pairs (output-sized + the tiny margin band) re-attach
    # the exact float64 unit vectors by keyed join for the final
    # threshold — the SAME sequential-fold cosine the catalog's
    # oracle-checked queries use. Exact-threshold semantics are
    # unchanged by construction; the equivalence test plants pairs on
    # both sides INSIDE the int8 margin band to pin it.
    vecs = (
        emb.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
        # norm lands as a materialized attribute first so the transform
        # divides by a per-row value, not a re-evaluated fold.
        .select("id", "v", _norm("v").alias("nrm"))
        .select("id", F.expr("transform(v, x -> x / nrm)").alias("vn"))
    )

    @F.pandas_udf("binary")
    def _quantize(vn: pd.Series) -> pd.Series:
        if len(vn) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vn.to_numpy()).astype(np.float64)
        q = np.rint(mat * 127.0)
        # NaN rows (zero-norm inputs) become garbage candidates at
        # worst — the exact certify below rejects them, matching the
        # pre-quantization behavior (NaN cosine compares false).
        q = np.nan_to_num(q, nan=0.0, posinf=127.0, neginf=-127.0)
        arr = q.astype(np.int8)
        return pd.Series([row.tobytes() for row in arr])

    qvecs = vecs.select("id", _quantize("vn").alias("qv"))
    # The attach is ONE keyed join of the slim bucket frame to the
    # quantized vector table — NO broadcast hint: the vector table is
    # corpus-sized (the 100 TB path). At small scale AQE sees the
    # actual sizes and converts to broadcast-hash on its own.
    grouped = b.join(qvecs, "id")
    # The verify stage's parallelism is pinned to cluster width, not
    # inherited from the input layout: per-row cost here is a matmul
    # ROW (dim × pop multiplies), far above what AQE's byte-based
    # sizing assumes, so letting it coalesce the exchange would stack
    # whole buckets onto few tasks. An explicit-count repartition is
    # exempt from AQE coalescing and doubles as the applyInPandas
    # grouping exchange (same keys), so it costs nothing extra.
    sess = emb.sparkSession
    try:
        shuffle_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        # platforms that auto-size the shuffle report a non-numeric
        # value (e.g. "auto") — fall back to the cluster width
        shuffle_parts = sess.sparkContext.defaultParallelism
    width = max(sess.sparkContext.defaultParallelism, shuffle_parts)
    thr = float(threshold)
    guard = int(max_bucket_rows) if max_bucket_rows is not None else None

    def _screen(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        if guard is not None and n > guard:
            raise ValueError(
                "embedding_near_dup_pairs_lsh: bucket (table_id="
                f"{int(pdf['table_id'].iloc[0])}, bucket="
                f"{int(pdf['bucket'].iloc[0])}) holds {n} rows > "
                f"max_bucket_rows={guard} — raise n_planes / lower "
                "target_bucket_rows, or pre-collapse exact duplicates"
            )
        buf = b"".join(pdf["qv"].tolist())
        d = len(buf) // n
        mat = (
            np.frombuffer(buf, dtype=np.int8)
            .reshape(n, d)
            .astype(np.float64)
            / 127.0
        )
        ids = pdf["id"].to_numpy(dtype="int64")
        sims = mat @ mat.T
        # Worst-case screen margin for round-to-nearest int8 on unit
        # vectors: per-element error ≤ 1/254, so the dot moves by at
        # most 2·√d/254 + d/254² (plus a float-arithmetic crumb). No
        # pair with true cosine ≥ threshold can fall below
        # threshold − margin, so the exact certify sees every true
        # pair; margin-band false positives are certify's to drop.
        margin = 2.0 * np.sqrt(d) / 254.0 + d / (254.0 * 254.0) + 1e-9
        ia, ib = np.nonzero(np.triu(sims >= thr - margin, k=1))
        if len(ia) == 0:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia], ids[ib]),
                "id_b": np.maximum(ids[ia], ids[ib]),
            }
        )

    cand = (
        grouped.repartition(width, "table_id", "bucket")
        .groupBy("table_id", "bucket")
        .applyInPandas(_screen, "id_a bigint, id_b bigint")
    )
    # cross-table dedup of the CANDIDATES (a pair screened in several
    # tables emits once per table) — output-sized plus the margin
    # band, the cheapest frame in the whole chain — then the exact
    # float64 certify: re-attach the unit vectors by keyed join (AQE
    # broadcasts the candidate side when it is small; at scale the
    # keyed plan streams the vector table once per side, which is a
    # SCAN, not an exchange) and apply the UNQUANTIZED threshold with
    # the sequential-fold dot. Membership is decided here, in exactly
    # the arithmetic the pre-quantization implementation used.
    cand = cand.repartition(width, "id_a", "id_b").dropDuplicates(
        ["id_a", "id_b"]
    )
    return (
        cand.join(
            vecs.select(F.col("id").alias("id_a"), F.col("vn").alias("__va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("vn").alias("__vb")),
            "id_b",
        )
        .filter(_dot("__va", "__vb") >= F.lit(thr))
        .select("id_a", "id_b")
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH: per table, the sign bits of
    ``n_planes`` seeded hyperplane dot products pack into a bucket id;
    one output row per (vector, table). OR-amplification across tables
    is what buys recall — collision prob for similarity s is
    ``1 - (1 - p1^n_planes)^n_tables`` with ``p1 = 1 - θ(s)/π``.

    All ``n_tables × n_planes`` dots compute in ONE Arrow-batched
    numpy matmul per record batch (a Pandas UDF): expression-tree
    folds are CodegenFallback (interpreted, boxed per element) and an
    unrolled per-element tree blows past the codegen method limit, so
    for this genuinely dense-matrix stage the vectorized Python path
    is the fast one (~10× over the fold — same trade cosine_pandas
    documents). The seeded plane matrix ships in the UDF closure — a
    few KB of deterministic constants, no driver loop over data, no
    shuffle beyond the explode."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim)
    flat = planes.reshape(n_tables * n_planes, dim)  # (T*P, dim)
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def bucket_ids(v: pd.Series) -> pd.Series:
        # Arrow may hand an empty batch (e.g. an empty partition after
        # a selective filter) — np.stack raises on it, so short-circuit.
        if len(v) == 0:
            return pd.Series([], dtype=object)
        if v.isna().any():
            raise ValueError(
                "hyperplane_buckets: null embedding vector — filter "
                "nulls upstream (buckets for missing vectors are "
                "undefined)"
            )
        try:
            mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        except ValueError as exc:  # ragged batch → np.stack refuses
            raise ValueError(
                "hyperplane_buckets: embedding vectors have "
                f"inconsistent lengths (expected dim={flat.shape[1]})"
            ) from exc
        if mat.shape[1] != flat.shape[1]:
            raise ValueError(
                f"hyperplane_buckets: embedding dim {mat.shape[1]} != "
                f"configured dim {flat.shape[1]}"
            )
        bits = (mat @ flat.T >= 0).reshape(len(mat), n_tables, n_planes)
        buckets = bits @ weights  # (n, n_tables)
        return pd.Series(list(buckets.astype(np.int32)))

    return emb.withColumn("__b", bucket_ids(F.col(vec_col))).select(
        *emb.columns, F.posexplode("__b").alias("table_id", "bucket")
    )



def hyperplane_probe_buckets(
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Query-side multi-probe bucketing: per (vector, table), the base
    sign-pattern bucket PLUS the ``n_probes - 1`` buckets reached by
    flipping the single lowest-|dot| plane bits, in margin order — the
    step-wise 1-bit probing sequence of multi-probe LSH (Lv et al.,
    VLDB 2007). The planes, seeding, bit packing and Arrow-batched
    matmul are IDENTICAL to :func:`hyperplane_buckets` (same seed ⇒
    probing is compatible with any index built by it); the first probe
    per table IS the base bucket, so the emitted set is a strict
    superset of the single-probe rows. One output row per
    (vector, table, probe); requires ``1 ≤ n_probes ≤ n_planes + 1``
    (there are only n_planes single-bit flips)."""
    if not 1 <= n_probes <= n_planes + 1:
        raise ValueError(
            f"hyperplane_probe_buckets: need 1 <= n_probes <= "
            f"n_planes + 1, got n_probes={n_probes} n_planes={n_planes}"
        )
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim)
    flat = planes.reshape(n_tables * n_planes, dim)
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def probe_ids(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(v, "hyperplane_probe_buckets")
        if mat.shape[1] != flat.shape[1]:
            raise ValueError(
                f"hyperplane_probe_buckets: embedding dim {mat.shape[1]} "
                f"!= configured dim {flat.shape[1]}"
            )
        dots = (mat @ flat.T).reshape(len(mat), n_tables, n_planes)
        bits = dots >= 0
        base = (bits @ weights).astype(np.int64)  # (n, T)
        out = np.empty((len(mat), n_tables, n_probes), dtype=np.int64)
        out[:, :, 0] = base
        if n_probes > 1:
            # planes ranked by |margin| ascending: the cheapest flips
            order = np.argsort(np.abs(dots), axis=2)  # (n, T, P)
            for j in range(1, n_probes):
                out[:, :, j] = base ^ weights[order[:, :, j - 1]]
        return pd.Series(list(out.reshape(len(mat), -1).astype("int32")))

    return (
        emb.withColumn("__probes", probe_ids(F.col(vec_col)))
        .select("*", F.posexplode("__probes").alias("__pos", "bucket"))
        .withColumn(
            "table_id", (F.col("__pos") / F.lit(n_probes)).cast("int")
        )
        .drop("__probes", "__pos")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing any
    (table, bucket) with the query, deduped, then exact-cosine ranked.
    The corpus-side scan shrinks by ~2^n_planes per table — the scale
    path when the corpus no longer fits a broadcast cross-join; tune
    (n_planes, n_tables) for the recall/cost point.

    MULTI-PROBE (round 7, ``n_probes`` > 1 — Lv et al. 2007): each
    QUERY additionally probes the buckets reached by flipping its
    lowest-|margin| sign bits, the table's most likely misses (a
    near-boundary plane dot is exactly where a true neighbor lands on
    the other side). Recall per table rises without touching the
    CORPUS side — the index stays one row per (vector, table), only
    the dim-sized query frame fans out ×n_probes — so at 100 TB the
    same recall costs fewer tables, i.e. fewer stored index copies
    and a proportionally smaller probe join. Candidate sets are
    supersets of the single-probe sets by construction, so recall@k
    is monotone in ``n_probes`` (pinned in ``tests/test_similarity``
    together with the superset property)."""
    cb = hyperplane_buckets(corpus, n_planes, n_tables, dim, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "table_id", "bucket"
    )
    qb = hyperplane_probe_buckets(
        queries, n_planes, n_tables, dim, vec_col=vec_col, n_probes=n_probes
    ).select(F.col(id_col).alias("query_id"), "table_id", "bucket")
    # Dedup SLIM (a pair colliding in several tables scores once): the
    # dropDuplicates exchange carries bare id pairs, not the two dense
    # vectors — otherwise shuffle bytes multiply by ~2x dim. Vectors
    # re-attach once per *distinct* pair: queries are small by contract
    # (broadcast), the corpus attach is a plain keyed join AQE sizes.
    cands = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv_tab = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    cv_tab = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        cands.join(F.broadcast(qv_tab), "query_id")
        .join(cv_tab, "neighbor_id")
        .select("query_id", "neighbor_id", cosine("qv", "cv").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _stack_batch(v: "pd.Series", what: str) -> "np.ndarray":
    """Stack an Arrow batch of vectors with a clear failure mode:
    null or ragged embedding vectors raise a named error instead of
    an opaque np.stack traceback from inside a task."""
    if v.isna().any():
        raise ValueError(
            f"{what}: null embedding vector — filter nulls upstream"
        )
    try:
        return np.stack(v.to_numpy()).astype(np.float64)
    except ValueError as exc:
        raise ValueError(
            f"{what}: embedding vectors have inconsistent lengths"
        ) from exc


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 256,
    dim: int = 64,
    seed: int = 42,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector splits into
    ``m`` subspaces of ``dim/m`` dims; each subspace gets its own
    ``k_codes``-centroid KMeans codebook fit on the (unit-normalized)
    corpus. Returns ``codebooks[m][k_codes][dim/m]`` — KB-to-MB-sized,
    safe in UDF closures or JSON beside an index.

    PQ is the memory half of the ANN story (IVF/LSH are the pruning
    half): a 64-dim float64 vector (512 B) compresses to ``m``
    one-byte codes (8 B at the defaults) — the difference between an
    embedding table that fits executor memory at 10⁹ docs and one
    that doesn't. Train on a hash-sample via ``train_fraction`` at
    corpus scale (same contract as :func:`ivf_build`)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    base = _unit_vectors(corpus, id_col, vec_col)
    if train_fraction is not None:
        keep = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), 10000)
        base = base.filter(keep < int(train_fraction * 10000))
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        feats = base.select(
            array_to_vector(
                F.slice(F.col("vn"), j * dsub + 1, dsub)
            ).alias("features")
        )
        model = KMeans(
            k=k_codes, seed=seed + j, featuresCol="features"
        ).fit(feats)
        codebooks.append([c.tolist() for c in model.clusterCenters()])
    return codebooks


def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
        .select("id", "v", _norm("v").alias("nrm"))
        .select("id", F.expr("transform(v, x -> x / nrm)").alias("vn"))
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every corpus vector to its ``m`` nearest-centroid codes:
    (id, codes array<int>). One Arrow-batched scan-stage projection —
    the m × k_codes argmin per vector is a dense matrix op (at 8-bit
    codebooks, 2048 distance evaluations per row), which outgrows
    expression trees the same way :func:`hyperplane_buckets`'s matmul
    does: numpy does all batch × m × k_codes distances in a few
    einsums; the codebook rides the UDF closure (MB at most). No
    shuffle, no join."""
    cb = np.asarray(codebooks)  # (m, k, dsub)
    m, k_codes, dsub = cb.shape
    # ||x - c||² = ||x||² + ||c||² - 2x·c ; per-subspace const ||c||²
    cb_sq = (cb ** 2).sum(axis=2)  # (m, k)

    @F.pandas_udf("array<int>")
    def codes_of(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(v, "pq_encode")
        sub = mat.reshape(len(mat), m, dsub)  # (n, m, dsub)
        cross = np.einsum("nmd,mkd->nmk", sub, cb)  # (n, m, k)
        d2 = cb_sq[None, :, :] - 2.0 * cross  # + ||x||² (rank-invariant)
        return pd.Series(list(d2.argmin(axis=2).astype(np.int32)))

    base = _unit_vectors(corpus, id_col, vec_col)
    return base.select("id", codes_of("vn").alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes its m × k_codes lookup table of exact subspace
    distances (one numpy pass on the tiny query side), and a corpus
    row scores as the SUM OF m TABLE LOOKUPS on its codes —
    approximate L2² on unit vectors, monotone with cosine. The
    per-pair cost is m ``element_at`` adds inside whole-stage codegen;
    the codes table is scanned once (queries broadcast); ranking is
    the per-query top-k window.

    PQ is a coarse scorer, so production searches re-rank: pass
    ``rerank=N`` (with ``corpus``) to take the top-``N`` PQ shortlist
    per query and re-score JUST THOSE rows with exact cosine — the
    scan stays over 8-byte codes, the full vectors are touched for
    only queries × N rows (a keyed join on the shortlist ids).

    Returns (query_id, neighbor_id, rank)."""
    cb = np.asarray(codebooks)
    m, k_codes, dsub = cb.shape
    cb_sq = (cb ** 2).sum(axis=2)

    @F.pandas_udf("array<double>")
    def lut_of(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(v, "pq_topk")
        sub = mat.reshape(len(mat), m, dsub)
        cross = np.einsum("nmd,mkd->nmk", sub, cb)
        lut = cb_sq[None, :, :] - 2.0 * cross  # (n, m, k)
        return pd.Series(list(lut.reshape(len(mat), m * k_codes)))

    qb = _unit_vectors(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), lut_of("vn").alias("lut")
    )
    score = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"),
            F.lit(j * k_codes + 1) + F.element_at(F.col("codes"), j + 1),
        )
        score = term if score is None else score + term
    scored = (
        codes_df.select(F.col("id").alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qb))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("approx_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= (rerank if rerank is not None else k))
    )
    if rerank is None:
        return shortlist.select("query_id", "neighbor_id", "rank")
    if corpus is None:
        raise ValueError("rerank requires the corpus vector table")
    cv = _unit_vectors(corpus, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vn").alias("cv")
    )
    qv = _unit_vectors(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vn").alias("qv")
    )
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", _dot("qv", "cv").alias("cos_sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivfpq_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    k_codes: int = 64,
    dim: int = 64,
    seed: int = 42,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]], list[list[list[float]]]]:
    """IVF-PQ index build — the canonical composition of the pruning
    and compression legs: a KMeans coarse quantizer assigns each
    (unit-normalized) vector to a cell, and PQ encodes the RESIDUAL
    ``vn - centroid[cell]`` (residuals are centered near zero, so the
    same code budget quantizes them much more finely than raw
    vectors). Returns ``(index, centroids, codebooks)`` where index is
    (neighbor_id, cell, codes) — ~9 B/vector at the defaults; persist
    it partitioned by cell exactly like :func:`ivf_write_index` and
    BOTH directory pruning and code compression apply.

    Training (coarse KMeans + m sub-KMeans on residual slices) runs on
    an optional hash-sample; ASSIGNMENT and encoding cover the full
    corpus in one scan-stage pass each."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    base = _unit_vectors(corpus, id_col, vec_col)
    train = base
    if train_fraction is not None:
        keep = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), 10000)
        train = base.filter(keep < int(train_fraction * 10000))
    coarse = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(
        train.withColumn("features", array_to_vector("vn"))
    )
    centroids = [c.tolist() for c in coarse.clusterCenters()]
    assigned = coarse.transform(
        base.withColumn("features", array_to_vector("vn"))
    ).select(
        "id", "vn", F.col("prediction").alias("cell")
    )
    cent_arr = np.asarray(centroids)  # (C, dim)

    # residuals, Arrow-batched (vector minus its cell centroid)
    @F.pandas_udf("array<double>")
    def residual_of(v: pd.Series, cell: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(v, "ivfpq_build") - cent_arr[cell.to_numpy()]
        return pd.Series(list(mat))

    with_res = assigned.withColumn("res", residual_of("vn", "cell"))
    res_train = with_res
    if train_fraction is not None:
        keep = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), 10000)
        res_train = with_res.filter(keep < int(train_fraction * 10000))
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub = res_train.select(
            array_to_vector(F.slice(F.col("res"), j * dsub + 1, dsub)).alias(
                "features"
            )
        )
        model = KMeans(k=k_codes, seed=seed + 1 + j, featuresCol="features").fit(sub)
        codebooks.append([c.tolist() for c in model.clusterCenters()])

    cb = np.asarray(codebooks)
    cb_sq = (cb ** 2).sum(axis=2)

    @F.pandas_udf("array<int>")
    def codes_of(res: pd.Series) -> pd.Series:
        if len(res) == 0:
            return pd.Series([], dtype=object)
        mat = _stack_batch(res, "ivfpq_build codes")
        sub = mat.reshape(len(mat), m, dsub)
        cross = np.einsum("nmd,mkd->nmk", sub, cb)
        d2 = cb_sq[None, :, :] - 2.0 * cross
        return pd.Series(list(d2.argmin(axis=2).astype(np.int32)))

    index = with_res.select(
        F.col("id").alias("neighbor_id"), "cell", codes_of("res").alias("codes")
    )
    return index, centroids, codebooks


def ivfpq_topk(
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search an IVF-PQ index: each query probes its ``n_probe``
    nearest cells and ADC-scores ONLY those cells' codes against a
    per-(query, cell) residual lookup table — approximate
    ``||q - x||²`` via ``||（q − c) − r||²``, exact in the LUT and
    quantized only in ``r``. The LUT column lives on the exploded
    (query × probed-cell) side (tiny by contract: queries × n_probe
    rows), built in one numpy pass; the index scan joins on cell
    (directory-pruned on a partitioned store) and scores with m
    ``element_at`` adds in whole-stage codegen. ``rerank=N`` re-scores
    the top-N shortlist with exact cosine against ``corpus``."""
    cb = np.asarray(codebooks)
    m, k_codes, dsub = cb.shape
    cb_sq = (cb ** 2).sum(axis=2)
    cent_arr = np.asarray(centroids)

    @F.pandas_udf("array<double>")
    def lut_of(v: pd.Series, cell: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        target = _stack_batch(v, "ivfpq_topk") - cent_arr[cell.to_numpy()]  # q - c
        sub = target.reshape(len(target), m, dsub)
        cross = np.einsum("nmd,mkd->nmk", sub, cb)
        lut = cb_sq[None, :, :] - 2.0 * cross
        # Unlike single-table PQ, the dropped ||q-c||² term VARIES
        # across a query's probed cells, so it is not rank-invariant:
        # spread it evenly over the m entries (summing the m lookups
        # then reconstitutes it exactly).
        lut = lut + (target ** 2).sum(axis=1)[:, None, None] / m
        return pd.Series(list(lut.reshape(len(target), m * k_codes)))

    qb = (
        _unit_vectors(queries, id_col, vec_col)
        .select(
            F.col("id").alias("query_id"),
            F.col("vn").alias("qv"),
            F.explode(
                _probe_cells(centroids, F.col("vn"), n_probe, qv_sql="vn")
            ).alias("cell"),
        )
        .select("query_id", "cell", lut_of("qv", "cell").alias("lut"))
    )
    score = None
    for j in range(m):
        term = F.element_at(
            F.col("lut"),
            F.lit(j * k_codes + 1) + F.element_at(F.col("codes"), j + 1),
        )
        score = term if score is None else score + term
    scored = (
        index.join(F.broadcast(qb), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("approx_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    shortlist = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= (rerank if rerank is not None else k)
    )
    if rerank is None:
        return shortlist.select("query_id", "neighbor_id", "rank")
    if corpus is None:
        raise ValueError("rerank requires the corpus vector table")
    cv = _unit_vectors(corpus, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vn").alias("cv")
    )
    qv = _unit_vectors(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vn").alias("qv")
    )
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", _dot("qv", "cv").alias("cos_sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
