"""Lexical retrieval: BM25 scoring over an inverted term index.

Training-data extension (alongside TF-IDF keywords in
``aggregates.tfidf_topk``): score a dim-sized set of keyword queries
against the corpus with Okapi BM25 — the standard lexical-retrieval
primitive a data pipeline uses for topic filtering, targeted corpus
slicing ("find documents about X"), and hard-negative mining for
retrieval training sets.

Scale shape (the whole point at 100 TB):

- the (doc, term, tf) table is the inverted index — ONE corpus-wide
  shuffle, reused by df rollup and query probe alike;
- the query side is dim-sized by contract (a keyword list, not a
  corpus) and broadcasts into the index — the corpus never moves to
  the queries;
- document length and the 1-row (n_docs, avgdl) scalar attach by
  keyed join / broadcast scalar;
- per-term contributions are fixed-point-quantized BEFORE the
  per-(query, doc) sum, so the sum is an exact integer in any
  accumulation order (the catalog's cross-engine determinism device);
- the final top-k is a per-query window — partitioned by query id,
  never single-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 4-dp fixed point, the catalog-wide quantization scale.
_SCALE = 10_000.0


def bm25_search(
    toked: DataFrame,
    queries: DataFrame,
    k: int,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qterms_col: str = "q",
    k1: float = 1.2,
    b: float = 0.75,
    return_terms: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    ``toked`` is the tokenized corpus (``id_col``, ``tokens_col``:
    array<string>); ``queries`` is the dim-sized query set
    (``qid_col``, ``qterms_col``: array<string>). Per query term:

        idf = ln(1 + (N - df + 1/2) / (df + 1/2))
        w   = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    summed over the query's distinct terms per document. Returns
    (``qid_col``, ``id_col``, ``score_q4``, ``rnk`` ≤ k) where
    ``score_q4 = Σ floor(w·10⁴ + ½)`` — per-term fixed-point before
    the sum, so the score is an exact integer independent of
    accumulation order (and hash-checkable cross-engine); ties break
    on the document id.
    """
    # Materialize the tokenized corpus once (lazy checkpoint): tf, dl
    # and stats are three independent consumers, and without the cut
    # each re-runs the upstream tokenize (regex + split) scan — three
    # corpus passes for one logical input. With one shared input the
    # tf/dfreq/probe subtrees also canonicalize identically, so
    # ReuseExchange dedups the (id, term) shuffle. The persisted-index
    # path (bm25_search_with) avoids even this by reading (tf, dl)
    # from parquet — this fused form is the one-shot convenience.
    # ``materialize=False`` is for callers that ALREADY hand in a
    # checkpointed/materialized frame (e.g. the hybrid-RRF probe
    # shares one tokenized corpus between its lexical leg and its
    # query side): a second localCheckpoint would copy the corpus
    # into block storage again for nothing.
    toked = toked.select(
        F.col(id_col).alias("id"), F.col(tokens_col).alias("__t")
    )
    if materialize:
        toked = toked.localCheckpoint(eager=False)
    # Query terms are DISTINCT per query (a repeated keyword is one
    # probe, standard BM25-on-query-set semantics).
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term"),
    ).filter(F.col("term") != "")
    # Every BM25 quantity except dl/avgdl is only ever needed for
    # terms that appear in SOME query, so the dim-sized distinct query
    # vocabulary broadcast-semi-joins into the term explode BEFORE any
    # aggregation (guide §3.2 — pre-filter the big side): the
    # (id, term) shuffle and the df rollup then carry query-term rows
    # only, instead of the full corpus vocabulary. df per query term
    # is unchanged — the filter restricts terms, never the documents
    # counted per term.
    terms = (
        toked.select("id", F.explode(F.col("__t")).alias("term"))
        .filter(F.col("term") != "")
        # left_semi (not distinct-then-inner): no extra exchange to
        # dedup the query vocabulary, and the broadcast side is the
        # SAME qterms frame the probe join broadcasts, so the build
        # is shared instead of gating the explode behind a second
        # broadcast job.
        .join(F.broadcast(qterms), "term", "left_semi")
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = toked.select(
        "id",
        F.size(F.col("__t")).cast("bigint").alias("dl"),
    )
    # Global doc count / total length derive from dl — one corpus
    # pass for both, instead of a separate aggregate over toked.
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )

    # Probe the inverted index: dim-sized query terms broadcast into
    # the (doc, term, tf) table; df (vocab-rows, corpus-derived — no
    # hint) and dl (doc-rows — keyed join) attach on their keys; the
    # two exact totals attach as a 1-row broadcast scalar.
    probed = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    w_term = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl").cast("double") / avgdl
            )
        )
    )
    contrib = F.floor(w_term * F.lit(_SCALE) + F.lit(0.5)).cast("bigint")
    if return_terms:
        # diagnostic seam for the ln-boundary sweep
        # (tests/test_ln_boundary.py): the exact pre-quantization
        # per-(query, doc, term) BM25 weight the 4-dp floor quantizes
        return probed.select("qid", "id", "term", w_term.alias("raw"))
    scored = (
        probed.select("qid", "id", contrib.alias("w_q4"))
        .groupBy("qid", "id")
        .agg(F.sum("w_q4").cast("bigint").alias("score_q4"))
    )
    rank = Window.partitionBy("qid").orderBy(
        F.col("score_q4").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("id").alias(id_col),
            "score_q4",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def bm25_index(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable BM25 index for a corpus (or one ingest
    batch): ``(tf, dl)`` where ``tf`` is the inverted (id, term, tf)
    table and ``dl`` the (id, dl) document lengths. Everything else
    BM25 needs — df, n_docs, avgdl — is a rollup of these two, so the
    pair IS the index: write both as parquet (partition ``tf`` by a
    hash of ``term`` for probe locality) and maintain them additively
    (:func:`merge_bm25_index`) instead of re-scanning 100 TB per day.
    Same ledger discipline as the unigram/bigram LM tables
    (``operators.aggregates.unigram_lm_counts``)."""
    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toked.select(
        F.col(id_col).alias("id"),
        F.size(F.col(tokens_col)).cast("bigint").alias("dl"),
    )
    return tf, dl


def merge_bm25_index(
    a: tuple[DataFrame, DataFrame], b: tuple[DataFrame, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Merge two BM25 indexes over DISJOINT document sets (the daily
    ingest case: yesterday's index + today's batch). Because doc sets
    are disjoint, the merge is a pure union — no aggregation at all:
    (id, term) keys cannot collide, df/n_docs/avgdl are derived
    downstream and additivity falls out of the rollup. Exact:
    ``merge(index(A), index(B)) == index(A ∪ B)`` row-for-row."""
    return (
        a[0].unionByName(b[0]),
        a[1].unionByName(b[1]),
    )


def bm25_index_remove(
    index: tuple[DataFrame, DataFrame],
    doc_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Retention-delete maintenance for the BM25 index: every index
    state is PER-DOCUMENT ((id, term, tf) rows and (id, dl) rows), so
    removal is two delete-sized anti-joins ≡ rebuilding from the
    surviving corpus row-for-row — and df/n_docs/avgdl, being rollups
    of the pruned pair, correct themselves at search time with no
    extra work (a removed document both leaves the rankings AND stops
    distorting everyone else's idf/avgdl — pinned in tests). Same
    delete discipline as ``minhash_index_remove`` /
    ``subtract_lm_counts``."""
    keys = doc_ids.select(F.col(id_col).alias("id")).distinct()
    return (
        index[0].join(keys, "id", "left_anti"),
        index[1].join(keys, "id", "left_anti"),
    )


def bm25_search_with(
    index: tuple[DataFrame, DataFrame],
    queries: DataFrame,
    k: int,
    qid_col: str = "query_id",
    qterms_col: str = "q",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` from a persisted index (``(tf, dl)`` from
    :func:`bm25_index`, typically read back from parquet): identical
    scoring and plan shape to the fused :func:`bm25_search` — df and
    the (n_docs, sum_dl) scalar are rollups of the index tables, the
    dim-sized query terms broadcast into ``tf``, scores are exact
    fixed-point integers. Fused ≡ indexed equality is pinned by
    test."""
    tf, dl = index
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term"),
    ).filter(F.col("term") != "")
    probed = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    w_term = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl").cast("double") / avgdl
            )
        )
    )
    contrib = F.floor(w_term * F.lit(_SCALE) + F.lit(0.5)).cast("bigint")
    scored = (
        probed.select("qid", "id", contrib.alias("w_q4"))
        .groupBy("qid", "id")
        .agg(F.sum("w_q4").cast("bigint").alias("score_q4"))
    )
    rank = Window.partitionBy("qid").orderBy(
        F.col("score_q4").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("id").alias(id_col),
            "score_q4",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    topk: int,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = 60,
    scale: int = 100_000_000,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner: each ranking contributes ``1 / (k +
    rank)`` per document and the fused order is the per-(query, doc)
    sum. Rank-based, so a lexical BM25 list and a dense cosine list
    fuse without score calibration.

    Every input DataFrame carries (``qid_col``, ``id_col``,
    ``rank_col``); contributions are computed as the INTEGER division
    ``scale DIV (k + rank)`` — pure integer arithmetic end to end, so
    fused scores are identical on any engine and any accumulation
    order (no floating point anywhere). Returns (``qid_col``,
    ``id_col``, ``rrf_fp``, ``n_lists``, ``rnk`` ≤ topk), ties broken
    on the doc id; ``n_lists`` counts how many rankings carried the
    doc.

    Scale shape: each ranking is already top-k-per-query sized (query
    count × k rows — dim-sized by construction), so the union +
    groupBy + per-query window all operate on frames bounded by the
    QUERY set, never the corpus.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = [
        r.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("id"),
            F.expr(
                f"CAST({int(scale)} DIV ({int(k)} + {rank_col}) AS BIGINT)"
            ).alias("contrib"),
        )
        for r in rankings
    ]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    fused = unioned.groupBy("qid", "id").agg(
        F.sum("contrib").cast("bigint").alias("rrf_fp"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_fp").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("qid").alias(qid_col),
            F.col("id").alias(id_col),
            "rrf_fp",
            "n_lists",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def write_bm25_index(
    spark,
    index: tuple[DataFrame, DataFrame],
    path: str,
    n_term_buckets: int = 64,
) -> None:
    """Persist a BM25 index with TERM-BUCKET PARTITION LAYOUT: ``tf``
    writes under ``{path}/tf/term_bucket=<b>/`` with ``b =
    pmod(xxhash64(term), n_term_buckets)``, ``dl`` plain under
    ``{path}/dl``, and the bucket count in ``{path}/meta.json`` (via
    the Hadoop FileSystem, object-store safe).

    The layout is the point at scale: a query probes only the terms
    it contains, so a bucketed reader scans ``≤ |query terms|``
    partition directories out of ``n_term_buckets`` instead of the
    whole inverted index — partition pruning as index structure, the
    same trick as the IVF cell layout (``similarity.ivf_write_index``).
    """
    import json

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    tf, dl = index
    (
        tf.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(int(n_term_buckets))),
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/tf")
    )
    dl.write.mode("overwrite").parquet(f"{path}/dl")
    fsutil.write_text_atomic(
        spark, f"{path}/meta.json",
        json.dumps({"n_term_buckets": int(n_term_buckets)}),
    )


def bm25_search_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    qid_col: str = "query_id",
    qterms_col: str = "q",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` against a :func:`write_bm25_index` layout, with
    TERM-BUCKET PRUNING via dynamic partition pruning: the probe join
    carries ``term_bucket`` (recomputed on the dim-sized query side
    with the same hash) as a leading join key, so Catalyst inserts a
    DPP subquery on the broadcast side and the ``tf`` scan touches
    only the directories the query terms hash to
    (``PartitionFilters: [... dynamicpruning ...]`` in the plan —
    same device as the IVF cell layout, no driver-side collect). The
    df rollup runs over the pruned buckets, which is exact for every
    probed term (a term's rows never span buckets). The corpus-wide
    (n_docs, avgdl) scalar comes from ``dl``, which is doc-sized and
    bucket-independent. Results are identical to the un-bucketed
    :func:`bm25_search_with` (pinned by test)."""
    import json

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )

    meta = json.loads(fsutil.read_text(spark, f"{path}/meta.json"))
    n_buckets = int(meta["n_term_buckets"])
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(qterms_col))).alias("term"),
    ).filter(F.col("term") != "").withColumn(
        "term_bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets))
    )
    tf = spark.read.parquet(f"{path}/tf")
    dl = spark.read.parquet(f"{path}/dl")
    probe = tf.join(F.broadcast(qterms), ["term_bucket", "term"])
    # df rollup over the probed (pruned) index slice: exact per term.
    dfreq = probe.groupBy("term").agg(
        F.count_distinct(F.col("id")).alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    probed = (
        probe.join(dfreq, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    w_term = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
        )
    )
    contrib = F.floor(w_term * F.lit(_SCALE) + F.lit(0.5)).cast("bigint")
    scored = (
        probed.select("qid", "id", contrib.alias("w_q4"))
        .groupBy("qid", "id")
        .agg(F.sum("w_q4").cast("bigint").alias("score_q4"))
    )
    rank = Window.partitionBy("qid").orderBy(
        F.col("score_q4").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(rank))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("id").alias(id_col),
            "score_q4",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversity re-rank — the serving-side complement of the fusion
    stack (BM25 → dense → RRF → this): from each query's candidate
    list, greedily select k documents maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_selected``, so
    near-duplicate hits stop crowding out coverage. ``lam=1``
    degenerates to plain top-k by score (pinned in tests).

    Relevance scores are used as given — normalize upstream if the
    lists mix scales (RRF's integer scores are already comparable).

    Determinism: the greedy loop runs SEQUENTIALLY inside one
    applyInPandas group per query (float64 numpy; ties broken by
    smallest doc id), so the selection is independent of
    partitioning — unlike any distributed float reduction over the
    same math. Scale shape: groups are candidate lists (topk-sized
    by construction, NEVER the corpus — feed this search output, not
    documents); one exchange on the query id, O(k·n) dot products
    per group on L2-normalized vectors.

    Returns (qid, id, mmr_rank 1..k, relevance, max_sim_prior —
    the candidate's similarity to the already-selected set at pick
    time; -1.0 for the first pick — and mmr_value, the greedy
    objective at pick time). The objective is the SAME formula at
    every rank, ``lam·rel − (1−lam)·max(max_sim, 0)`` — classic MMR
    treats the max over the empty selected set as 0, and the penalty
    is clamped at 0 so an anti-correlated candidate earns no bonus
    (without the clamp, a negative inter-candidate cosine below
    −top_relevance would push the rank-2 value above the rank-1
    value). With the clamp, ``mmr_value`` is structurally
    NON-INCREASING by rank within a query: each candidate's value
    only falls over rounds (max(max_sim,0) is monotone in the
    only-growing max_sim) and the pool only shrinks, so each round's
    argmax is ≤ the previous round's. That is the in-result
    invariant the catalog probe checks; the anti-correlated
    adversarial case is pinned in ``tests/test_retrieval.py``."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{qid_col} bigint, {id_col} bigint, mmr_rank int, "
        f"relevance double, max_sim_prior double, mmr_value double"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf[qid_col].iloc[0]
        ids = pdf[id_col].to_numpy()
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(vecs, axis=1)
        nrm[nrm == 0.0] = 1.0
        vecs = vecs / nrm[:, None]
        n = len(ids)
        max_sim = np.full(n, -1.0)
        avail = np.ones(n, dtype=bool)
        rows = []
        for rank in range(1, min(k, n) + 1):
            # unified objective at every rank: empty-set max-sim is 0
            # (max_sim starts at -1, clamped up), and the penalty is
            # clamped at 0 so the value chain is monotone by rank
            val = lam * rel - (1.0 - lam) * np.maximum(max_sim, 0.0)
            val[~avail] = -np.inf
            # deterministic argmax: best value, then smallest doc id
            best_val = val.max()
            tie = np.flatnonzero(val == best_val)
            j = tie[np.argmin(ids[tie])]
            rows.append(
                (qid, ids[j], rank, float(rel[j]), float(max_sim[j]),
                 float(val[j]))
            )
            avail[j] = False
            sims = vecs @ vecs[j]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            rows,
            columns=[qid_col, id_col, "mmr_rank", "relevance",
                     "max_sim_prior", "mmr_value"],
        )

    return (
        candidates.select(qid_col, id_col, score_col, vec_col)
        .groupBy(qid_col)
        .applyInPandas(_mmr, out_schema)
    )
