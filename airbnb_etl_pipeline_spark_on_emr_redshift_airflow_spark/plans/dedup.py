"""Catalog: deduplication over ``documents`` — exact, n-gram Jaccard,
MinHash-LSH, SimHash (training-data extensions; first-class per the
build contract).

Exact and Jaccard dedup are fully SQL-expressible and oracle-checked
(the DuckDB side regenerates the same shingles with list functions).
MinHash/SimHash signatures hinge on ``xxhash64`` — since the round-10
xxh work (``plans.xxh`` replays Spark's xxhash64 bit-exactly in DuckDB
SQL) these carry full value-hash oracles too, on top of the semantic
unit tests (crafted near-duplicates must be found; disjoint docs must
not) in ``tests/test_dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
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


ORACLE_NGRAM_JACCARD = f"""
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
    """


def d_ngram_jaccard_pairs_impl(spark, sf_dir):
    """N-gram Jaccard near-dup pairs via inverted shingle index —
    exact set similarity, no docs² blowup (only pairs sharing a
    shingle are scored). Word-3-gram shingles; integers throughout, so
    the jaccard double is cross-engine exact."""
    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.filter(F.expr(_SUBSET))
    return jaccard_pairs(subset, n=3, threshold=0.008)


def _planted_twin_corpus(spark, sf_dir):
    """Deterministic subset + mutated-twin corpus shared by the fuzzy
    dedup probes (the synthetic corpus has no natural near-dups, so
    each subset doc gets a one-word-appended twin at id+10^6)."""
    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.select("doc_id", "text").filter(F.expr(_SUBSET))
    twins = subset.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutated")).alias("text"),
    )
    return subset.unionByName(twins)


# --- rotated into the driver window (round 9): d_cluster_best_pick ---
# The round-8 survivor-policy flagship (full value-hash oracle) moved
# here from plans.probes; the slot was freed by moving the rows-only
# d_minhash_dup_clusters past the window (re-registered verbatim in
# plans.probes — its family keeps window representation via the exact
# oracle-checked dedup siblings).

ORACLE_CLUSTER_BEST_PICK = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         concat(text, ' ', repeat('!', 120)) AS text
  FROM documents WHERE doc_id % 20 = 0),
fp AS (
  SELECT doc_id, length(text) AS n_len,
         md5(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')))
           AS cluster_fp
  FROM corpus),
r AS (
  SELECT cluster_fp, doc_id, n_len,
         row_number() OVER (PARTITION BY cluster_fp
                            ORDER BY n_len ASC, doc_id ASC) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster_fp) AS BIGINT)
           AS n_members
  FROM fp)
SELECT cluster_fp, doc_id AS keep_doc_id, n_len AS keep_len, n_members
FROM r WHERE rn = 1
"""


@register("d_cluster_best_pick", oracle=ORACLE_CLUSTER_BEST_PICK)
def d_cluster_best_pick(spark, sf_dir):
    """Dedup SURVIVOR-SELECTION POLICY (round 8): real pipelines keep
    the best cluster member, not the min-id one — here clusters are
    LETTERS-NORMALIZED fingerprint classes (same word content
    regardless of punctuation/noise junk), and the survivor is the
    LEAST-NOISE member: argmin(raw length, tie doc_id asc) — all
    members share identical letter content, so the shortest carries
    the least non-letter junk. Runs on a planted noisy-twin corpus
    (each subset doc gets a copy with 120 chars of '!' appended at
    id+10^6): every class has exactly 2 members and the clean
    original must win every pick, all value-hash-checked against the
    DuckDB replay. (The oracle's normalizer passes DuckDB's 'g' flag
    explicitly — Spark's regexp_replace is always global, DuckDB's is
    first-match-only by default; the shared-SQL oracles elsewhere
    stay flagless because the synthetic text is whitespace-clean, but
    THIS probe plants a multi-run noise suffix, the exact case where
    the defaults diverge.) 100 TB shape: one fingerprint window
    exchange — identical cost to min-id exact dedup; the policy is
    free."""
    (docs,) = load(spark, sf_dir, "documents")
    subset = docs.select("doc_id", "text").filter("doc_id % 20 = 0")
    twins = subset.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" "), F.expr("repeat('!', 120)")
        ).alias("text"),
    )
    corpus = subset.unionByName(twins)
    fp = corpus.select(
        "doc_id",
        F.length("text").cast("int").alias("n_len"),
        F.expr(
            "md5(trim(regexp_replace(lower(text), '[^a-z]+', ' ')))"
        ).alias("cluster_fp"),
    )
    w = Window.partitionBy("cluster_fp").orderBy(
        F.asc("n_len"), F.asc("doc_id")
    )
    cw = Window.partitionBy("cluster_fp")
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count(F.lit(1)).over(cw).cast("bigint")
        )
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_fp",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_len").alias("keep_len"),
            "n_members",
        )
    )




# --- rotated into the driver window (round 5): d_repeated_spans ---
# The ExactSubstr-style span detector moved here from plans.probes so
# it registers inside the first-50 driver recording window (slot freed
# by folding d_simhash_near_dup into d_minhash_dup_clusters above).
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.text import (  # noqa: E402
    TOKS,
    TOKS_DUCK,
)

SPAN_PHRASE = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu",
]
SPAN_N = 8
SPAN_PHRASE_DUCK = "[" + ", ".join(f"'{w}'" for w in SPAN_PHRASE) + "]"


@register(
    "d_repeated_spans",
    oracle=f"""
    WITH toks0 AS (SELECT doc_id, {TOKS_DUCK} AS t0 FROM documents),
         toks AS (SELECT doc_id,
                         CASE WHEN doc_id % 13 = 0
                              THEN list_concat({SPAN_PHRASE_DUCK}, t0)
                              ELSE t0 END AS t
                  FROM toks0),
         grams AS (SELECT doc_id, p AS pos,
                          md5(array_to_string(t[p:p+{SPAN_N - 1}], ' '))
                            AS fp
                   FROM toks,
                        UNNEST(range(1, len(t) - {SPAN_N} + 2)) AS u(p)),
         freq AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS nd
                                  FROM grams GROUP BY 1)
                  WHERE nd >= 2),
         marked AS (SELECT doc_id, pos FROM grams JOIN freq USING (fp)),
         isl AS (SELECT doc_id, pos,
                        CASE WHEN pos > COALESCE(lag(pos) OVER w,
                                                 -{SPAN_N}) + {SPAN_N}
                             THEN 1 ELSE 0 END AS nw
                 FROM marked
                 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         isl2 AS (SELECT doc_id, pos,
                         SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
                  FROM isl)
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {SPAN_N - 1} AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl2 GROUP BY doc_id, island
    """,
)
def d_repeated_spans(spark, sf_dir):
    """Cross-document repeated-span detection
    (``operators.dedup.repeated_spans``, the ExactSubstr direction of
    Lee et al. 2022): every document carrying a 12-token passage also
    present in another document gets its maximal duplicated span back
    — planted here by prepending a shared 12-token phrase to every
    doc_id % 13 == 0 document, which the sliding 8-gram fingerprints
    must merge into exactly the [1, 12] island (5 windows); any
    natural cross-document duplicate surfaces too and the oracle
    mirrors it. Unlike the aligned-chunk ``boilerplate_strip``, a
    passage is caught at ANY token offset. Fingerprint shuffles carry
    the 32-byte md5 (never the token slice); island merging is two
    same-keyed windows + one rollup."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        repeated_spans,
    )

    (docs,) = load(spark, sf_dir, "documents")
    phrase = F.array(*[F.lit(w) for w in SPAN_PHRASE])
    toked = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(phrase, F.expr(TOKS))
        )
        .otherwise(F.expr(TOKS))
        .alias("t"),
    )
    return repeated_spans(toked, "t", "doc_id", n=SPAN_N, min_docs=2)


# ----- prefix-filtered Jaccard self-join (round 8) --------------------

ORACLE_JACCARD_PREFIX = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, concat(text, ' mutated') AS text
  FROM documents WHERE doc_id % 20 = 0),
toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')),
                      ' ') AS t
  FROM corpus),
idx AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
  FROM idx),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
      >= CAST(0.5 AS DOUBLE)
"""


@register(
    "d_jaccard_suite",
    oracle=f"""
    SELECT 'ngram' AS slice, doc_a, doc_b, jaccard
    FROM ({ORACLE_NGRAM_JACCARD}) n
    UNION ALL
    SELECT 'prefix' AS slice, doc_a, doc_b, jaccard
    FROM ({ORACLE_JACCARD_PREFIX}) p
    """,
)
def d_jaccard_suite(spark, sf_dir):
    """Round-11 slice-merge of ``d_ngram_jaccard_pairs`` +
    ``d_jaccard_prefix_filter`` (both re-registered verbatim past the
    window in ``plans.probes``), freeing a first-50 slot for the
    round-10-continuation flagships. 'ngram' slice — exact Jaccard
    pairs via the full inverted shingle index at a low threshold;
    'prefix' slice — exact Jaccard at t=0.5 via AllPairs/PPJoin
    prefix filtering over the planted-twin corpus. Identical output
    shape (doc_a, doc_b, jaccard), so the union needs only the slice
    tag; both stay quadratic-free (pairs only form on shared
    shingles / shared prefix tokens)."""
    ngram = d_ngram_jaccard_pairs_impl(spark, sf_dir).select(
        F.lit("ngram").alias("slice"), "doc_a", "doc_b", "jaccard"
    )
    prefix = d_jaccard_prefix_filter_impl(spark, sf_dir).select(
        F.lit("prefix").alias("slice"), "doc_a", "doc_b", "jaccard"
    )
    return ngram.unionByName(prefix)


def d_jaccard_prefix_filter_impl(spark, sf_dir):
    """EXACT Jaccard near-dup self-join at a real threshold (0.5) via
    PREFIX FILTERING (AllPairs/PPJoin candidate bound —
    ``operators.dedup.jaccard_pairs_prefix``): shingles order globally
    rarest-first, each doc indexes only its first |d| − ⌈t·|d|⌉ + 1
    tokens, candidates must collide inside both prefixes and pass the
    t·|x| ≤ |y| ≤ |x|/t length filter before the bounded
    array_intersect verify. The 100 TB story vs the existing
    ``d_ngram_jaccard_pairs`` (full inverted index, optional
    ``max_shingle_df`` cap): hot shingles sort to every doc's SUFFIX
    and never enter the candidate join — pruning by ordering keeps
    the result EXACT, where the df-cap variant can miss pairs whose
    overlap is exclusively hot shingles. Runs on the planted-twin
    corpus (the shared fuzzy-dedup fixture — the synthetic corpus has
    no natural near-dups at t=0.5); the oracle replays the twin
    construction and the full quadratic-free inverted index in
    DuckDB, so every (pair, jaccard) value-hashes cross-engine
    (integer set sizes → the double divides bit-identically).
    Equality with the unfiltered exact form is pinned in
    ``tests/test_dedup.py``."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.dedup import (
        _planted_twin_corpus,
    )

    corpus = _planted_twin_corpus(spark, sf_dir)
    return jaccard_pairs_prefix(corpus, n=3, threshold=0.5)
