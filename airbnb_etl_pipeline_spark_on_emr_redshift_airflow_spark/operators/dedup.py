"""Document deduplication operators — exact and near-duplicate.

Training-data extensions beyond the reference (whose only dedup is
key-based ``dropDuplicates``, ``apps/process_reviews.py:148``): the
standard pretraining-corpus dedup ladder, each expressed as
shuffle-conscious DataFrame compositions (no Python on the hot path):

- **exact**: md5 fingerprint of normalized text → min-id survivor
- **n-gram Jaccard**: word-shingle inverted index → candidate pairs →
  exact Jaccard (the verify step of MinHash, usable alone at small N)
- **MinHash + LSH**: k permutations via seeded xxhash64, banded into
  buckets; candidates join on (band, band_hash) — the 100 TB path:
  cost is O(docs × shingles) + one shuffle per groupBy, never O(docs²)
- **SimHash**: 64-bit bit-majority signature; near-dups share bucket
  keys on rotated signatures (here: exact-signature buckets)

All signatures derive from ``xxhash64`` — deterministic across runs,
partitions, and cluster sizes.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared normalization: lowercase, collapse non-letters to single
# spaces. Same expression family as functions.text (portable SQL).
_NORM = "trim(regexp_replace(lower(text), '[^a-z]+', ' '))"


def normalized_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the normalized token array. Reuse contract: a frame that
    ALREADY carries ``__tokens`` (a pre-tokenized, typically
    lazily-checkpointed corpus) is returned as-is — callers that
    materialize tokenization once share it across every signature
    family (MinHash shingles, verify arrays, SimHash bit votes)
    instead of re-running normalize+split per chain; see
    ``plans.dedup.d_minhash_dup_clusters``."""
    if "__tokens" in docs.columns:
        return docs
    norm = _NORM.replace("text", text_col)
    return docs.withColumn("__tokens", F.split(F.expr(norm), " "))


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """doc_id → exploded distinct word n-gram shingles (one row per
    (doc, shingle)). Shingling is a pure array expression — no UDF."""
    toked = normalized_tokens(docs, text_col)
    # Guard: sequence(1, 0) would *descend* in Spark, so docs shorter
    # than n tokens get an explicit empty shingle array.
    shingle_expr = F.expr(
        f"""
        CASE WHEN size(__tokens) >= {n} THEN
          array_distinct(transform(
            sequence(1, size(__tokens) - {n - 1}),
            i -> concat_ws(' ', slice(__tokens, i, {n}))
          ))
        ELSE array() END
        """
    )
    return (
        toked.select("doc_id", F.explode(shingle_expr).alias("shingle"))
    )


def shingle_hash_arrays(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    max_shingles_per_doc: int | None = None,
) -> DataFrame:
    """doc_id → the doc's distinct word ``n``-gram shingles as one
    ``array<bigint>`` of xxhash64 values — the no-shuffle form of the
    shingle set (a pure scan-stage projection; :func:`word_shingles`
    is the exploded inverted-index form). Hashing shrinks the payload
    to 8 bytes/shingle; a cross-shingle hash collision inside one pair
    needs ~|sh|²/2⁶⁴ luck, far below any near-dup threshold's
    resolution.

    ``max_shingles_per_doc`` bounds per-row memory for pathological
    documents (a 1 GB doc would otherwise carry a ~1 GB array through
    every verify join): keep only the ``k`` SMALLEST hashes — a
    bottom-k (KMV) sketch. Because the global hash order is one shared
    "permutation", two capped sets estimate the true Jaccard with
    error O(1/√k); docs at or under the cap keep their exact shingle
    set (sorting never changes membership), so results change only
    for docs past the bound."""
    toked = normalized_tokens(docs, text_col)
    arr = f"""
        CASE WHEN size(__tokens) >= {n} THEN
          array_distinct(transform(
            sequence(1, size(__tokens) - {n - 1}),
            i -> xxhash64(concat_ws(' ', slice(__tokens, i, {n})))
          ))
        ELSE array() END
        """
    if max_shingles_per_doc is not None:
        arr = f"slice(array_sort({arr}), 1, {int(max_shingles_per_doc)})"
    return toked.select("doc_id", F.expr(arr).alias("shingles"))


def exact_dedup_fingerprint(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5(normalized text) fingerprint, min-doc_id
    survivor. Two hash shuffles (fingerprint groupBy); fully
    deterministic."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
        fingerprint,
    )

    fp = docs.select("doc_id", fingerprint("text").alias("fp"))
    return fp.groupBy("fp").agg(F.min("doc_id").alias("keep_doc_id"))


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all candidate pairs sharing
    ≥1 shingle: inverted index (shingle → docs) self-joined, pair
    intersection counted, union derived from per-doc shingle counts.

    Scale: never materializes the docs² matrix — only pairs that share
    a shingle. Hot shingles fan out quadratically: a shingle in d docs
    contributes d² pair rows. ``max_shingle_df`` prunes shingles whose
    document frequency exceeds the cap before the self-join (the
    stopword-shingle guard for corpus scale) — candidate *discovery*
    then misses pairs whose overlap is exclusively hot shingles, but
    scored pairs keep their exact full-set Jaccard (intersection and
    union still count every shingle). Default ``None`` = fully exact.
    At 100 TB prefer a cap (or :func:`minhash_near_dups`, which never
    builds co-shingle pairs at all).

    Deliberately not persisted here: shingling is a cheap scan-stage
    expression, and a persist without a matching unpersist would leak
    executor storage for the session lifetime (callers that
    materialize immediately can persist/unpersist around the call).
    """
    sh = word_shingles(docs, n)
    if max_shingle_df is not None:
        # Discovery on the pruned index, exact scoring on the full
        # shingle sets — the same candidates + array-intersect verify
        # shape as minhash_near_dups.
        cold = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        pruned = sh.join(cold, "shingle", "left_semi")
        cands = (
            pruned.select(F.col("doc_id").alias("doc_a"), "shingle")
            .join(pruned.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        arrs = shingle_hash_arrays(docs, n)
        va = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
        vb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
        return (
            cands.join(va, "doc_a")
            .join(vb, "doc_b")
            .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
            .withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.size("sa") + F.size("sb") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    size_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    size_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(size_a, "doc_a")
        .join(size_b, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_prefix(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (AllPairs /
    PPJoin candidate bound, Bayardo et al. 2007; Xiao et al. 2008) —
    same output as :func:`jaccard_pairs` with no cap, but the
    inverted index holds only each doc's *prefix* under a global
    rarest-first token order, so hot shingles never enter the
    candidate join at all (they sort to the suffix of every doc).

    Soundness: order shingles globally by (document frequency asc,
    shingle asc). For J(x,y) ≥ t the overlap obeys |x∩y| ≥ t·|x∪y| ≥
    t·max(|x|,|y|), so with per-doc overlap bound α_d = ⌈t·|d|⌉ and
    prefix length p_d = |d| − α_d + 1, two qualifying docs MUST share
    a token inside both prefixes (pigeonhole on the shared order: if
    the first p_x of x miss all of y, at most |x| − p_x = α_x − 1 <
    α ≤ |x∩y| elements remain — contradiction). A length filter
    (t·|x| ≤ |y| ≤ |x|/t) prunes candidates before the verify.

    Why this beats ``max_shingle_df`` at 100 TB: the cap variant's
    candidate *discovery* silently misses pairs whose overlap is
    exclusively hot shingles; prefix filtering is EXACT — pruning
    comes from ordering, not dropping. Cost shape: one df-count
    exchange over (doc, shingle), one doc-keyed exchange to assemble
    the ordered arrays, a prefix-token self-join (index size
    Σ(1−t)·|d| rows — for t=0.5, half the full inverted index and
    the surviving tokens are the RARE half), then the standard
    bounded array_intersect verify. Pinned equal to the exact
    quadratic form in ``tests/test_dedup.py``; full value-hash
    oracle: ``d_jaccard_prefix_filter``."""
    from fractions import Fraction

    # t as an exact rational (decimal-literal reading of the float:
    # 0.07 -> 7/100, not the binary 0.07000...0001): float
    # F.ceil(t * s) rounds UP on cases like 0.07*100 =
    # 7.000000000000001 -> 8, silently shortening the prefix and
    # tightening the length filter by one — which can DROP a
    # genuinely qualifying pair. ceil(num*s/den) in bigint integer
    # arithmetic ((num*s + den - 1) div den) is exact for every t.
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator

    def _ceil_t(col):
        return F.expr(f"({num}L * {col} + {den - 1}L) div {den}L")

    sh = word_shingles(docs, n, text_col)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = sh.join(dfreq, "shingle")
    arrs = (
        ranked.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__toks")
        )
        .withColumn("__s", F.size("__toks"))
    )
    plen = (F.col("__s") - _ceil_t("__s").cast("int") + F.lit(1))
    pref = arrs.select(
        "doc_id",
        "__s",
        F.explode(F.slice("__toks", F.lit(1), plen)).alias("__t"),
    ).select("doc_id", "__s", F.col("__t.shingle").alias("shingle"))
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("__s").alias("__sa"),
        "shingle",
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("__s").alias("__sb"),
        "shingle",
    )
    cands = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.col("__sb") >= _ceil_t("__sa"))
            & (F.col("__sa") >= _ceil_t("__sb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrsh = shingle_hash_arrays(docs, n, text_col)
    va = arrsh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa")
    )
    vb = arrsh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb")
    )
    return (
        cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, k: int = 32, n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per doc
    (``min(xxhash64(seed_j, shingle))`` per j over the doc's distinct
    shingles) as a pure SCAN-STAGE array fold: the distinct-shingle
    array builds per row and one ``aggregate`` lambda accumulates all
    k mins — ZERO shuffle, where the former explode + k-column groupBy
    exchanged every (doc, shingle) row (the dominant wire cost of
    fingerprinting at corpus scale). A lambda-bound ``j`` from
    ``sequence`` hashes identically to the integer literal the
    exploded form used, so signatures are bit-identical and persisted
    indexes (:func:`minhash_index_build`) stay seed-stable. Docs with
    no shingle (< n tokens) drop, matching explode semantics — keeping
    them would hand every short doc one shared degenerate signature
    and a quadratic bucket."""
    toked = normalized_tokens(docs)
    shingles = f"""
        CASE WHEN size(__tokens) >= {n} THEN
          array_distinct(transform(
            sequence(1, size(__tokens) - {n - 1}),
            i -> concat_ws(' ', slice(__tokens, i, {n}))
          ))
        ELSE array() END
        """
    sig_sql = f"""
    aggregate({shingles}, array_repeat(cast(9223372036854775807 as bigint), {k}),
              (acc, s) -> zip_with(acc, sequence(0, {k - 1}),
                                   (a, j) -> least(a, xxhash64(j, s))))
    """
    sigarr = toked.filter(
        F.size("__tokens") >= n
    ).select("doc_id", F.expr(sig_sql).alias("__sig"))
    # selectExpr strings, not k Column objects: the per-column
    # col/getItem/alias py4j round-trips dominated plan-construction
    # time for the whole minhash chain (guide §1 — the cost was on
    # the driver, not in any stage)
    return sigarr.selectExpr(
        "doc_id", *[f"__sig[{j}] AS h{j}" for j in range(k)]
    )


def minhash_lsh_candidates(
    docs: DataFrame, k: int = 32, bands: int = 8, n: int = 3
) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of ``k/bands``
    rows; docs sharing any (band_id, band_hash) bucket become candidate
    pairs. Returns (doc_a, doc_b) distinct candidates.

    The scale path for near-dedup: shuffle on band buckets, quadratic
    only within a bucket (bounded by design via band width)."""
    buckets = minhash_band_buckets(docs, k, bands, n)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band_id", "bh")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band_id", "bh")
    return (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_band_buckets(
    docs: DataFrame, k: int = 32, bands: int = 8, n: int = 3
) -> DataFrame:
    """(doc_id, band_id, bh) band-bucket rows: the signature split into
    ``bands`` bands of ``k/bands`` mins, each band hashed to one
    bucket id. The joinable half of the LSH scheme — self-join it for
    in-corpus candidates (:func:`minhash_lsh_candidates`) or persist
    it as the corpus index an incremental batch probes
    (:func:`minhash_index_build` / :func:`dedup_against_index`)."""
    r = k // bands
    sig = minhash_signatures(docs, k, n)
    # one parsed expression instead of bands × (struct + hash + lits)
    # Column calls — same tree, a fraction of the driver round-trips
    band_structs = ", ".join(
        f"named_struct('band_id', {b}, 'bh', "
        f"xxhash64({', '.join(f'h{b * r + i}' for i in range(r))}))"
        for b in range(bands)
    )
    return sig.select(
        "doc_id",
        F.explode(F.expr(f"array({band_structs})")).alias("band"),
    ).select("doc_id", "band.band_id", "band.bh")


def minhash_near_dups(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    max_shingles_per_doc: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact shingle Jaccard.

    The verify never touches the inverted shingle index: that
    self-join fans out to EVERY co-shingle pair (the quadratic blowup
    banding exists to avoid — a hot shingle alone would explode it)
    before any candidate filter could bite. Instead the slim
    (doc_a, doc_b) candidates join twice against the per-doc
    shingle-hash arrays (:func:`shingle_hash_arrays`, a scan-stage
    projection — no explode, no shuffle to build), and the exact
    intersection is ``array_intersect`` per pair: total verify cost is
    O(candidates × shingles-per-doc), two hash joins. Returns
    (doc_a, doc_b, jaccard ≥ threshold).

    ``max_shingles_per_doc`` caps the verify arrays as a bottom-k
    sketch (see :func:`shingle_hash_arrays`): per-pair verify memory
    is then bounded regardless of document length; docs under the cap
    score their exact Jaccard, docs past it an O(1/√cap) estimate —
    set it at corpus scale (pathological documents exist at 100 TB)."""
    cands = minhash_lsh_candidates(docs, k, bands, n)
    sh = shingle_hash_arrays(docs, n, max_shingles_per_doc=max_shingles_per_doc)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_index_build(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    max_shingles_per_doc: int | None = 512,
) -> tuple[DataFrame, DataFrame]:
    """Build the persistent half of incremental near-dedup: the
    corpus's (doc_id, band_id, bh) band buckets plus its per-doc
    shingle-hash arrays. Write both to parquet once; every later
    batch probes them with :func:`dedup_against_index` instead of
    re-fingerprinting the whole corpus — the daily-crawl-vs-corpus
    cadence that makes MinHash dedup O(batch) per day, not O(corpus).

    Both frames are scan-stage projections of the corpus (one shuffle
    total, inside the signature groupBy); the bucket table is
    bands × n_docs slim rows, the shingle table one bounded array per
    doc (bottom-k capped by default — pathological documents exist at
    100 TB)."""
    buckets = minhash_band_buckets(docs, k, bands, n)
    shingles = shingle_hash_arrays(
        docs, n, max_shingles_per_doc=max_shingles_per_doc
    )
    return buckets, shingles


def minhash_index_remove(
    index_buckets: DataFrame,
    index_shingles: DataFrame,
    doc_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Retention-delete maintenance for the persisted near-dedup
    index: drop every bucket and shingle row belonging to removed
    corpus documents — two keyed anti-joins whose build side is
    delete-sized (AQE broadcasts it; the index never re-shuffles).
    Without this, a deleted document keeps vetoing future near-twins
    from ingestion forever (the index would claim docs the corpus no
    longer has — exactly the inconsistency the corpus-before-index
    publish order exists to prevent on the ADD side). Returns the two
    pruned frames; persist them with the same atomic publish the
    build used. Removal ≡ rebuilding the index from the surviving
    corpus (signatures are per-doc, so dropping a doc's rows is
    exact — pinned in tests)."""
    keys = doc_ids.select(id_col).distinct()
    return (
        index_buckets.join(keys, id_col, "left_anti"),
        index_shingles.join(keys, id_col, "left_anti"),
    )


def dedup_against_index(
    new_docs: DataFrame,
    index_buckets: DataFrame,
    index_shingles: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    max_shingles_per_doc: int | None = 512,
) -> DataFrame:
    """Incremental near-dedup: which documents of a NEW batch
    near-duplicate something already in an indexed corpus
    (:func:`minhash_index_build`)? Returns
    (new_doc_id, corpus_doc_id, jaccard ≥ threshold) — feed the
    new_doc_id set to an anti-join to drop, or union the survivors
    and append their bucket/shingle rows to the index.

    The batch side fingerprints with the SAME (k, bands, n, cap)
    parameters (hash functions are seed-stable across runs, so
    signatures computed today join signatures stored last year); the
    probe is one keyed join on (band_id, bh) — the batch side is
    delta-sized, so AQE typically broadcasts it against the corpus
    index — then the usual slim-candidate dedup and capped
    array_intersect verify. In-batch duplicates are NOT reported
    (run :func:`minhash_near_dups` on the batch for those): this
    operator's contract is batch-vs-corpus only."""
    new_buckets = minhash_band_buckets(new_docs, k, bands, n).select(
        F.col("doc_id").alias("new_id"), "band_id", "bh"
    )
    corpus_buckets = index_buckets.select(
        F.col("doc_id").alias("corpus_id"), "band_id", "bh"
    )
    cands = (
        new_buckets.join(corpus_buckets, ["band_id", "bh"])
        # a doc re-submitted verbatim in a later batch shares its id;
        # never pair a doc with itself
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )
    new_sh = shingle_hash_arrays(
        new_docs, n, max_shingles_per_doc=max_shingles_per_doc
    ).select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sa"))
    corpus_sh = index_shingles.select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sb")
    )
    return (
        cands.join(new_sh, "new_id")
        .join(corpus_sh, "corpus_id")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    broadcast_max_rows: int | None = 4_000_000,
    check_every: int = 2,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    components by iterative min-label propagation — each node adopts
    the smallest id reachable in one hop, repeated to fixpoint.
    Returns (doc_id, cluster_id) where cluster_id = min doc id in the
    component (the canonical survivor).

    The missing step between pair-finders (MinHash/Jaccard/cosine) and
    an actual deduped corpus. Iterative DataFrame algorithm, two steps
    per round:

    - **hook** — each node adopts the min label among its one-hop
      neighbors (and itself);
    - **shortcut (pointer jumping)** — each node then adopts its
      label's OWN label, doubling the effective propagation distance.

    With the shortcut, a component of diameter d converges in
    O(log d) rounds rather than the O(d) of hook-only propagation —
    the difference between 6 rounds and 60 for a pathological
    chain-shaped cluster at corpus scale. ``localCheckpoint`` cuts
    lineage each round so the plan doesn't grow exponentially;
    checkpoints are LAZY (round 13) so each round issues exactly ONE
    action — the convergence count materializes the round's hooked
    and updated frames in the same job, where the two eager
    checkpoints plus the count were three driver round-trips per
    iteration (guide §1.2: per-round fixed cost is what an iterative
    operator amortizes worst).

    ``check_every`` (round 14) spaces the convergence counts: with the
    default 2, two hook+shortcut rounds chain lazily and ONE count
    materializes both — halving the blocking driver actions of the
    fixpoint loop. Labels are unchanged for any value: a round applied
    past the fixpoint is the identity (min over self ∪ neighbors of a
    converged labeling returns the same labels), so at worst one extra
    identity round executes before the loop observes changed == 0
    (pinned set-identical in tests/test_dedup.py). ``check_every=1``
    restores the round-13 per-round check.
    """
    if check_every < 1:
        raise ValueError(
            f"connected_components: check_every must be >= 1, got {check_every}"
        )
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        # Materialize once (EAGER): every iteration joins edges, and
        # without the cut each round would recompute the whole
        # upstream pair-finding pipeline (MinHash/Jaccard) from
        # scratch.
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    # Deliberate join strategy per round (guide §3.1, same policy as
    # bfs_min_hops): checkpointed label frames carry no Catalyst
    # stats, so AQE must plan shuffle stages for BOTH join inputs
    # before it can downgrade to broadcast — per-round jobs the loop
    # pays at every scale. The node count is loop-invariant, so ONE
    # count up front (it materializes the init frame the first round
    # would have materialized anyway) licenses an explicit broadcast
    # hint on the node-sized sides (labels in the hook join, the
    # parent map in the shortcut join) while they hold
    # ≤ broadcast_max_rows slim two-column rows. Past the threshold
    # the hint drops and the keyed-shuffle plan remains the 100 TB
    # growth path. The count's only consumer is the broadcast gate —
    # skip the blocking action entirely when the gate is disabled
    # (ADVICE r13; round 1's convergence count materializes the init
    # frame either way). Driver-memory note: the hinted frames are
    # slim two-column bigint rows, so the 4M default is a ~100-150 MB
    # broadcast rebuilt per round near the threshold — lower it on
    # thin drivers (see operators/graph.py for the full rationale).
    n_nodes = labels.count() if broadcast_max_rows is not None else 0
    hint = (
        F.broadcast
        if broadcast_max_rows is not None and n_nodes <= broadcast_max_rows
        else (lambda df: df)
    )
    converged = False
    for it in range(1, max_iter + 1):
        # Hook as ONE aggregation over self ∪ neighbor labels (round
        # 13): the former join→groupBy→left-join chain re-shuffled the
        # label frame twice per round; unioning a tagged self leg into
        # the neighbor-label stream lets a single groupBy produce both
        # the hooked label (min over self ∪ neighbors ≡ the old
        # least/coalesce — every node contributes its own self row, so
        # no left-join null handling is needed) and the pre-update
        # label for the convergence test (min(when(__self)) — exactly
        # one self row per node). One exchange per round where there
        # were three; identical labels at every round, pinned by the
        # oracle's recursive-closure replay and tests/test_dedup.py.
        nbr_leg = edges.join(hint(labels), edges.dst == labels.doc_id).select(
            F.col("src").alias("doc_id"),
            F.col("cluster_id"),
            F.lit(False).alias("__self"),
        )
        hooked = (
            labels.select("doc_id", "cluster_id", F.lit(True).alias("__self"))
            .unionByName(nbr_leg)
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.min(F.when(F.col("__self"), F.col("cluster_id"))).alias(
                    "__old"
                ),
            )
            # checkpointed because the shortcut self-join reads it
            # twice; lazy — the convergence count below materializes
            # it exactly once
            .localCheckpoint(eager=False)
        )
        # Pointer jumping: adopt the label's own label. Labels are
        # always ids of nodes present in `hooked` (they start as node
        # ids and only ever move to smaller ids seen in the frame), so
        # the left join hits; coalesce is belt-and-braces.
        parents = hooked.select(
            F.col("doc_id").alias("__pid"), F.col("cluster_id").alias("__plabel")
        )
        updated = (
            hooked.join(hint(parents), hooked.cluster_id == parents.__pid, "left")
            .select(
                "doc_id",
                "__old",
                F.coalesce("__plabel", "cluster_id").alias("cluster_id"),
            )
            .localCheckpoint(eager=False)
        )
        # full count, not limit(1): materializes the lazy checkpoints
        # in the SAME job the convergence test rides on. Only every
        # ``check_every``-th round (and the last) pays the blocking
        # action — intermediate rounds chain lazily and the next check
        # materializes them all in one job (guide §1.2). The broadcast
        # builds of the hinted sides run as separate jobs BEFORE the
        # probe stage, so a chained round's label frame is cached by
        # the build before the probe-side scan reads it — no
        # race-recompute of the unmaterialized checkpoint (the failure
        # mode that sank the all-lazy pagerank variant in round 13).
        labels = updated.drop("__old")
        if it % check_every == 0 or it == max_iter:
            changed = updated.filter(
                F.col("cluster_id") != F.col("__old")
            ).count()
            if changed == 0:
                converged = True
                break
    if not converged:
        # One hop per iteration: a component whose diameter exceeds
        # max_iter would return silently-wrong labels (and downstream
        # dedup_by_clusters would under-dedup with no signal) — warn.
        warnings.warn(
            f"connected_components hit max_iter={max_iter} before the "
            "fixpoint; cluster labels may be incomplete for components "
            "with diameter > max_iter — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_incremental(
    stored: DataFrame,
    new_pairs: DataFrame,
    max_iter: int = 20,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Fold a day's near-duplicate pairs into PERSISTED cluster labels
    without re-resolving history — the cluster-level counterpart of
    the incremental MinHash index (new docs probe a stored signature
    index; new PAIRS probe stored labels).

    A full re-run is O(all pairs ever) every day. Here only the
    components TOUCHED by today's pairs can change, and a stored
    component is equivalent to its STAR (member → cluster_id edges,
    diameter ≤ 2), so the recompute runs
    :func:`connected_components` over ``star(affected) ∪ new_pairs``
    — a subgraph sized by today's batch and the clusters it touches,
    never the corpus. Untouched labels pass through via one
    left-anti join (callers that keep labels cluster-partitioned can
    skip even that and rewrite only affected partitions).

    Semantics match the one-shot resolver exactly: cluster_id is the
    min doc id of the merged component (min over a union commutes
    with min over stars), new-corpus nodes appear via their pairs,
    and bridge pairs merge any number of old components —
    ``incremental == full recompute`` is pinned property-style in
    ``tests/test_dedup.py``.

    ``stored``: (doc_id, cluster_id) from a previous
    :func:`connected_components` / this function. ``new_pairs``:
    today's verified duplicate pairs (any pair-finder in this
    module)."""
    batch_nodes = (
        new_pairs.select(F.col(a_col).alias("doc_id"))
        .unionByName(new_pairs.select(F.col(b_col).alias("doc_id")))
        .distinct()
    )
    touched = (
        stored.join(batch_nodes, "doc_id")
        .select("cluster_id")
        .distinct()
    )
    # members of every touched component (cluster_id-keyed join —
    # batch-plus-affected sized, AQE broadcasts the touched set)
    affected = stored.join(touched, "cluster_id")
    star = affected.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(a_col), F.col("cluster_id").alias(b_col)
    )
    sub = new_pairs.select(a_col, b_col).unionByName(star)
    relabeled = connected_components(
        sub, max_iter=max_iter, a_col=a_col, b_col=b_col
    )
    keep = stored.join(touched, "cluster_id", "left_anti").select(
        "doc_id", "cluster_id"
    )
    return keep.unionByName(relabeled.select("doc_id", "cluster_id"))


def dedup_by_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Full near-dedup: pairs → connected components → keep only each
    cluster's canonical (min-id) doc plus all unpaired docs."""
    clusters = connected_components(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def contaminated_ids(
    train: DataFrame,
    heldout: DataFrame,
    n: int = 13,
    min_shared_shingles: int = 1,
) -> DataFrame:
    """Training docs that overlap a held-out evaluation set — the
    benchmark-decontamination check run before pretraining:

    - **exact**: normalized-text fingerprints matching any held-out
      fingerprint (verbatim inclusion of an eval document), and
    - **fuzzy**: docs sharing ≥ ``min_shared_shingles`` word
      ``n``-gram shingles with the held-out set (the standard 13-gram
      criterion — catches embedded verbatim passages, not just whole
      documents).

    Returns distinct contaminated train ``doc_id`` rows. Scale shape:
    the held-out side is small (benchmarks), so both probes are joins
    against a dim-sized build side — fingerprints by hash equality,
    shingles via the inverted index (never O(train × heldout))."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
        fingerprint,
    )

    train_fp = train.select("doc_id", fingerprint("text").alias("fp"))
    held_fp = heldout.select(fingerprint("text").alias("fp")).distinct()
    exact = train_fp.join(F.broadcast(held_fp), "fp", "left_semi").select("doc_id")

    train_sh = word_shingles(train, n)
    held_sh = word_shingles(heldout, n).select("shingle").distinct()
    fuzzy = (
        train_sh.join(F.broadcast(held_sh), "shingle", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("__shared"))
        .filter(F.col("__shared") >= min_shared_shingles)
        .select("doc_id")
    )
    return exact.unionByName(fuzzy).distinct()


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    n: int = 13,
    min_shared_shingles: int = 1,
) -> DataFrame:
    """Drop contaminated docs from the training corpus: one left-anti
    join against :func:`contaminated_ids` (the same anti-join shape
    that replaced the reference's NOT IN)."""
    bad = contaminated_ids(train, heldout, n, min_shared_shingles)
    return train.join(bad, "doc_id", "left_anti")


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64, bit-majority vote
    across tokens (duplicates counted, as a bag). Computed as a pure
    SCAN-STAGE array fold — the token array hashes once per doc, each
    bit's set-count is an ``aggregate`` lambda over that hash array,
    and the signature reassembles with bit arithmetic in the same
    projection. ZERO shuffle: the former explode + 64-column groupBy
    moved a corpus-token-sized exchange (the dominant cost of the
    signature at scale) that a per-row fold never needs. Majority is
    ``2·set_count > n_tokens`` ≡ the ±1 vote sum being positive, so
    signatures are bit-identical to the exploded form (pinned by the
    planted-twin hamming tests)."""
    toked = normalized_tokens(docs).withColumn(
        "__sh_th", F.expr("transform(__tokens, t -> xxhash64(t))")
    )
    # One fold, not 64 per-bit aggregates: the vote array accumulates
    # all 64 set-bit counts in a single pass (the 64-term expression
    # tree quadrupled driver-side analysis/codegen time for the same
    # executor work).
    sig_sql = """
    aggregate(
      zip_with(
        aggregate(__sh_th, array_repeat(cast(0 as bigint), 64),
                  (acc, h) -> zip_with(acc, sequence(0, 63),
                                       (a, i) -> a + ((h >> i) & 1))),
        sequence(0, 63),
        (v, i) -> if(v * 2 > size(__sh_th),
                     shiftleft(cast(1 as bigint), i),
                     cast(0 as bigint))),
      cast(0 as bigint), (a, x) -> a | x)
    """
    # explode-form parity: a doc with no tokens produced no vote rows
    # (split never yields an empty array for non-null text, so this
    # only guards degenerate inputs)
    return (
        toked.filter(F.size("__sh_th") > 0)
        .select("doc_id", F.expr(sig_sql).alias("simhash"))
    )


def simhash_dup_buckets(docs: DataFrame) -> DataFrame:
    """Docs sharing an identical SimHash signature (hamming distance 0
    buckets). For distance > 0 use :func:`simhash_near_dups`."""
    sig = simhash_signatures(docs)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_dups(
    docs: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs at hamming distance > 0 via
    signature banding: the 64-bit signature splits into ``bands``
    equal bands; by pigeonhole, any pair within hamming distance
    ``bands - 1`` shares at least one unchanged band, so candidates =
    docs colliding on any (band_id, band_bits) bucket — never O(docs²).
    Candidates are verified with the exact popcount of the XOR'd
    signatures and filtered to ``hamming <= max_hamming``.

    Guarantee: exhaustive for ``max_hamming <= bands - 1`` (default
    3 ≤ 4-1); larger ``max_hamming`` values are found only
    probabilistically — raise ``bands`` to keep the guarantee (cost:
    bands× bucket rows, narrower bands → more collisions).

    Returns (doc_a, doc_b, hamming). One bucket shuffle + one verify
    join on candidate ids.

    ``signatures``: a precomputed :func:`simhash_signatures` frame
    (doc_id, simhash) — pass it when the caller also consumes the
    signatures (e.g. an exhaustiveness invariant) so the bit-vote
    fold runs once per corpus scan instead of once per consumer.
    """
    width = 64 // bands
    sig = simhash_signatures(docs) if signatures is None else signatures
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.expr(
                f"(simhash >> {b * width}) & {(1 << width) - 1}"
            ).alias("bits"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.bits")
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band_id", "bits")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band_id", "bits")
    cands = (
        a.join(b, ["band_id", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sig_a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    sig_b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return (
        cands.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def edit_distance_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Entity-resolution near-dup pairs by Levenshtein distance with
    pigeonhole piece blocking — the edit-distance rung of the dedup
    ladder (exact → Jaccard/MinHash → SimHash → edit distance), for
    short keys: names, phone/id numbers, normalized titles.

    Blocking: each string splits into ``max_dist + 1`` contiguous
    pieces; rows sharing any ``(piece_index, piece_value)`` become
    candidates. For EQUAL-LENGTH strings, ``levenshtein ≤ max_dist``
    forces at least one untouched, position-aligned piece (pigeonhole
    over substitutions), so the blocking is lossless — the planted
    typo tests assert that. For mixed lengths it is recall-oriented
    blocking like any LSH. Candidates dedup as slim id pairs before
    the verify re-attaches strings, so the exchange carries no text.

    Caveat (same as every blocking scheme): templated keys with a
    shared constant region put all rows in one bucket for that piece —
    pick a ``text_col`` whose pieces are diverse (hash-derived or
    domain keys), exactly like choosing LSH bands.

    Returns ``id_a < id_b`` pairs with the exact ``dist``.
    """
    k = max_dist + 1
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    # Piece i spans [i*L div k + 1, (i+1)*L div k] (1-based, integer
    # division) — contiguous, covering, position-aligned for equal L.
    piece_structs = []
    for i in range(k):
        piece = F.expr(
            f"substring(__t, {i} * length(__t) div {k} + 1, "
            f"({i + 1}) * length(__t) div {k} - {i} * length(__t) div {k})"
        )
        piece_structs.append(
            F.struct(F.lit(i).alias("piece_idx"), piece.alias("piece"))
        )
    blocked = base.select(
        "__id", "__t", F.explode(F.array(*piece_structs)).alias("bk")
    ).select("__id", "__t", "bk.piece_idx", "bk.piece")
    a = blocked.select(
        F.col("__id").alias("id_a"), "piece_idx", "piece"
    )
    b = blocked.select(
        F.col("__id").alias("id_b"), "piece_idx", "piece"
    )
    cands = (
        a.join(b, ["piece_idx", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = base.select(F.col("__id").alias("id_a"), F.col("__t").alias("__ta"))
    tb = base.select(F.col("__id").alias("id_b"), F.col("__t").alias("__tb"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein("__ta", "__tb").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def boilerplate_strip(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    chunk_tokens: int = 4,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (training-data extension):
    the C4-style "remove any span that repeats across documents" rule
    (Raffel et al. 2020 drop duplicated three-sentence spans; here the
    span is a fixed ``chunk_tokens``-token block so the whole pass is
    pure column expressions). Every document is cut into
    non-overlapping chunks (:func:`..sampling.chunk_documents` with
    overlap 0), each chunk is md5-fingerprinted, chunks whose
    fingerprint appears in ≥ ``min_doc_freq`` DISTINCT documents are
    boilerplate (nav bars, license headers, share buttons — anything
    template-replicated across pages), and each document is rebuilt
    from its surviving chunks in order.

    Returns (id, n_chunks, n_boilerplate, clean_text). Documents whose
    every chunk is boilerplate come back with ``clean_text = ''``;
    zero-token documents emit no row (they have no chunks — filter
    them before, or anti-join after, as the pipeline prefers).

    Scale shape: chunking is scan-stage generate+slice; the frequency
    table groups on the FIXED-WIDTH fingerprint (never the chunk text),
    so the shuffle key is 32 bytes regardless of chunk size and its
    cardinality is the distinct-chunk universe; the chunk⋈freq join is
    a plain keyed exchange (frequency table is corpus-derived — no
    broadcast hint; a viral chunk's join fan-out is bounded by its own
    occurrence count, AQE skew-split handles the head); reassembly is
    one groupBy on the doc id whose per-group state is the doc's own
    chunks — bounded by max document length, the same envelope as the
    input row."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        chunk_documents,
    )

    chunks = chunk_documents(
        toked.select(F.col(id_col).alias("__id"), tokens_col),
        tokens_col,
        chunk_tokens,
        0,
    ).select(
        "__id",
        "chunk_id",
        F.array_join("chunk_tokens", " ").alias("chunk_text"),
    )
    fp = chunks.withColumn("fp", F.md5("chunk_text"))
    freq = fp.groupBy("fp").agg(
        F.count_distinct(F.col("__id")).alias("doc_freq")
    )
    is_boiler = F.col("doc_freq") >= min_doc_freq
    return (
        fp.join(freq, "fp")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(is_boiler.cast("bigint")).cast("bigint").alias("n_boilerplate"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~is_boiler,
                                F.struct("chunk_id", "chunk_text"),
                            )
                        )
                    ),
                    lambda x: x["chunk_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_chunks",
            "n_boilerplate",
            "clean_text",
        )
    )


def repeated_spans(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-span detection at EVERY token offset —
    the ExactSubstr dedup direction (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find, per document,
    the maximal runs of tokens COVERED by duplicated ``n``-gram
    windows — every token in a span lies inside at least one
    ``n``-gram that also appears in ≥ ``min_docs - 1`` OTHER
    documents (two overlapping duplicated windows may bridge an
    offset that does not itself start a duplicated window — the
    token-coverage semantics a removal step wants). The aligned-chunk
    :func:`boilerplate_strip` misses a shared passage that starts
    mid-chunk; this operator fingerprints the sliding window at every
    position, so a verbatim passage is caught wherever it lands.
    (Lee et al. use a corpus-wide suffix array — inherently
    sequential; sliding ``n``-gram fingerprints + island merging is
    the shuffle-friendly equivalent with min-span resolution ``n``.)

    Returns (id, span_start, span_end, n_windows): token positions are
    1-based inclusive, ``span_end - span_start + 1 >= n``, and
    ``n_windows`` is the count of duplicated windows merged into the
    span. Overlapping or touching windows (next start ≤ prev start +
    n) merge; documents with no duplicated window emit nothing.

    Scale shape: window fingerprints are a scan-stage generate (one
    explode; the shuffle key is the 32-byte md5, never the token
    slice); the document-frequency rollup and the probe join are keyed
    on the fingerprint (corpus-derived — no broadcast hint; a viral
    span's fan-out is bounded by its occurrence count, AQE skew-split
    handles the head); island merging is two same-keyed windows over
    the doc id (lag + running sum — Catalyst reuses one partitioning)
    plus the final per-span rollup."""
    size = f"size({tokens_col})"
    starts = F.expr(
        f"CASE WHEN {size} < {n} THEN array() "
        f"ELSE sequence(1, {size} - {n} + 1) END"
    )
    grams = (
        toked.select(
            F.col(id_col).alias("__id"),
            F.col(tokens_col),
            F.explode(starts).alias("pos"),
        )
        .select(
            "__id",
            "pos",
            # to_json, not array_join: a space-join is ambiguous when a
            # token itself contains the delimiter (['a b','c'] vs
            # ['a','b c'] both join to 'a b c'), and a false fingerprint
            # collision here flows into strip_repeated_spans as deleted
            # legitimate tokens. JSON encoding is injective on the slice.
            F.md5(
                F.to_json(F.slice(F.col(tokens_col), F.col("pos"), n))
            ).alias("fp"),
        )
        # lazy lineage cut: the fingerprint table feeds TWO consumers
        # (the doc-frequency rollup and the probe side of the
        # semi-join), and their exchange subtrees differ, so
        # ReuseExchange can't dedup them — without the checkpoint the
        # scan + tokenize + explode + md5 prefix (the dominant CPU of
        # the whole operator: Σ-tokens md5(to_json(slice)) calls) ran
        # TWICE — the round-8 plan showed 2 parquet scans and double
        # md5 projections; with the cut the prefix materializes once
        # (≈30% faster at sf0.1 AND at the 10x decade corpus).
        .localCheckpoint(eager=False)
    )
    freq = grams.groupBy("fp").agg(
        F.count_distinct(F.col("__id")).alias("doc_freq")
    )
    marked = grams.join(
        freq.filter(F.col("doc_freq") >= min_docs).select("fp"),
        "fp",
        "left_semi",
    ).select("__id", "pos")
    w = Window.partitionBy("__id").orderBy("pos")
    islands = marked.withColumn(
        "__new",
        F.when(
            F.col("pos") > F.coalesce(F.lag("pos").over(w), F.lit(-n)) + n, 1
        ).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("__id", "__island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(n) - F.lit(1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            "n_windows",
        )
    )


def strip_repeated_spans(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style span REMOVAL: cut every cross-document
    repeated span found by :func:`repeated_spans` out of each
    document's token array (Lee et al. 2022 delete the duplicated
    bytes rather than dropping whole documents — dropping a boilerplate
    footer shouldn't cost the unique article above it).

    Returns every input document as (id, clean_tokens, n_tokens,
    n_removed): documents with no duplicated span pass through with
    ``n_removed = 0``; a fully-duplicated document comes back with an
    empty array (callers typically drop those next).

    Scale shape: the span table is doc-frequency-bounded output of
    :func:`repeated_spans`; spans fold back to one array-of-intervals
    row per affected doc (groupBy on the id — per-group state bounded
    by the doc's own span count), attach by a keyed LEFT join (no
    broadcast hint — span counts are corpus-derived), and the cut is a
    scan-stage ``filter`` with a position lambda: no explode of the
    corpus, no shuffle of token payloads beyond the one id-keyed join.
    """
    spans = repeated_spans(toked, tokens_col, id_col, n=n, min_docs=min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    joined = toked.join(per_doc, id_col, "left")
    no_spans = F.col("__spans").isNull()
    covered = lambda pos: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda sp: (sp["s"] <= pos) & (pos <= sp["e"]),
    )
    clean = F.when(
        no_spans, F.col(tokens_col)
    ).otherwise(
        # filter's 2-arg lambda indexes from 0; spans are 1-based
        F.filter(F.col(tokens_col), lambda tok, i: ~covered(i + 1))
    )
    return joined.select(
        F.col(id_col),
        clean.alias("clean_tokens"),
        F.size(clean).cast("bigint").alias("n_tokens"),
        (F.size(F.col(tokens_col)) - F.size(clean))
        .cast("bigint")
        .alias("n_removed"),
    )


def link_records_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_dist: int = 1,
    best_match: bool = False,
    max_block_rows: int | None = 100_000,
    method: str = "pieces",
) -> DataFrame:
    """Cross-TABLE record linkage by Levenshtein distance — the
    two-source form of entity resolution (matching a vendor feed's
    names/ids against the master table), where
    :func:`edit_distance_pairs_blocked` dedups within one. Two
    lossless blocking schemes, picked by ``method``:

    ``"pieces"`` (default): each side's key splits into
    ``max_dist + 1`` contiguous pieces; only (piece_idx, piece)
    collisions become candidates. Cheap (2 block rows per key at
    d=1), lossless for equal-length keys (pigeonhole over
    substitutions); mixed lengths are recall-oriented like any LSH.
    Its scale ceiling: the block-id space is positional — 10^(L/k)
    for digit keys — so once the table outgrows it, candidates grow
    as O(|L|·|R| / keyspace), quadratic with a big constant divisor.

    ``"deletion"``: FastSS/SymSpell-style deletion neighborhoods —
    each key expands to every variant reachable by ≤ ``max_dist``
    character deletions (L+1 variants at d=1, built as scan-stage
    array expressions and hashed to slim 8-byte block keys); two keys
    within Levenshtein ``max_dist`` ALWAYS share a variant (for any
    edit mix — substitutions delete the edited position on both
    sides, insert/delete align directly), so recall is guaranteed for
    all lengths, not just equal ones. Block keyspace ≈ the key-string
    entropy at length L−d (~10^7 for 8-digit keys vs pieces' 10^4):
    the scheme that stays near-linear when tables reach the size
    where pieces saturate. Cost: (L+1)× block rows instead of 2×.

    Candidates dedup as slim id pairs before the verify re-attaches
    both strings — the exchange never carries text — and the exact
    ``levenshtein`` verify makes false candidates (hash collisions,
    2d-apart variant sharers) harmless in both schemes.

    Piece blocks have the fixed-bucket failure mode every blocking
    scheme has (the adaptive-plane LSH lesson): a templated key with a
    constant region — every vendor id sharing the prefix ``"CUST-"``
    — puts BOTH whole tables in one block and the candidate join goes
    |L|×|R| silently. ``max_block_rows`` is the lazy per-block
    population guard (the ``embedding_near_dup_pairs`` idiom): a
    no-sort count window over (piece_idx, piece) on EACH side — it
    rides the candidate join's own exchange, costs no extra action —
    and ``assert_true`` fails the job loudly, naming the hot block and
    the remedy, before the quadratic join launches. ``None`` disables.

    ``best_match=True`` keeps one row per left id: the minimum
    distance, tie-broken by right id (deterministic cross-engine).

    Returns (left_id, right_id, dist) with ``dist <= max_dist``.
    """
    k = max_dist + 1

    def _block_guard(blocked: DataFrame, side: str) -> DataFrame:
        if max_block_rows is None:
            return blocked
        n_in_block = F.count(F.lit(1)).over(
            Window.partitionBy("piece_idx", "piece")
        )
        guard = F.assert_true(
            F.col("__block_n") <= max_block_rows,
            F.concat_ws(
                "",
                F.lit(f"link_records_blocked: {side} block (piece_idx="),
                F.col("piece_idx").cast("string"),
                F.lit(", piece='"),
                F.col("piece"),
                F.lit("') holds "),
                F.col("__block_n").cast("string"),
                F.lit(
                    f" rows (> max_block_rows={max_block_rows}); the "
                    "cross-table candidate join is O(|block_l|x|"
                    "block_r|) — keys with a shared constant region "
                    "block on it; strip the template prefix / pick a "
                    "hash-diverse key column, or raise max_block_rows "
                    "explicitly."
                ),
            ),
        )
        return (
            blocked.withColumn("__block_n", n_in_block)
            .filter(guard.isNull())
            .drop("__block_n")
        )

    def _pieces(df: DataFrame, id_col: str, text_col: str, side: str):
        base = df.select(
            F.col(id_col).alias(f"__id_{side}"),
            F.col(text_col).alias(f"__t_{side}"),
        )
        structs = []
        for i in range(k):
            piece = F.expr(
                f"substring(__t_{side}, {i} * length(__t_{side}) div {k} + 1, "
                f"({i + 1}) * length(__t_{side}) div {k} "
                f"- {i} * length(__t_{side}) div {k})"
            )
            structs.append(
                F.struct(F.lit(i).alias("piece_idx"), piece.alias("piece"))
            )
        return base, base.select(
            f"__id_{side}", F.explode(F.array(*structs)).alias("bk")
        ).select(f"__id_{side}", "bk.piece_idx", "bk.piece")

    def _deletions(df: DataFrame, id_col: str, text_col: str, side: str):
        base = df.select(
            F.col(id_col).alias(f"__id_{side}"),
            F.col(text_col).alias(f"__t_{side}"),
        )
        # radius-d deletion neighborhood, built by iterating the
        # single-deletion expansion d times (scan-stage array ops)
        var = f"array(__t_{side})"
        for _ in range(max_dist):
            var = f"""
            array_distinct(array_union({var},
              flatten(transform({var}, v ->
                transform(sequence(1, greatest(length(v), 1)), i ->
                  concat(substring(v, 1, i - 1),
                         substring(v, i + 1, length(v) - i)))))))
            """
        blocked = base.select(
            f"__id_{side}",
            F.explode(F.expr(var)).alias("__variant"),
        ).select(
            f"__id_{side}",
            # slim 8-byte block key; hash collisions only add
            # verified-away candidates
            F.lit(0).alias("piece_idx"),
            F.xxhash64("__variant").cast("string").alias("piece"),
        )
        return base, blocked

    if method == "deletion":
        lbase, lblocked = _deletions(left, left_id, left_text, "l")
        rbase, rblocked = _deletions(right, right_id, right_text, "r")
    else:
        lbase, lblocked = _pieces(left, left_id, left_text, "l")
        rbase, rblocked = _pieces(right, right_id, right_text, "r")
    lblocked = _block_guard(lblocked, "left")
    rblocked = _block_guard(rblocked, "right")
    cands = (
        lblocked.join(rblocked, ["piece_idx", "piece"])
        .select("__id_l", "__id_r")
        .distinct()
    )
    out = (
        cands.join(lbase, "__id_l")
        .join(rbase, "__id_r")
        .withColumn("dist", F.levenshtein("__t_l", "__t_r").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__id_l").alias(left_id),
            F.col("__id_r").alias(right_id),
            "dist",
        )
    )
    if best_match:
        w = Window.partitionBy(left_id).orderBy(
            F.col("dist").asc(), F.col(right_id).asc()
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out
