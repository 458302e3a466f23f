"""Catalog: lexical retrieval over ``documents`` — the BM25 rung of
the retrieval surface (training-data extension; the ANN family in
``plans.similarity`` is its dense counterpart). Rotated into the
first-50 driver recording window in round 5 (slots freed by the
d_simhash_near_dup, c_sample_mix and m_binary_frames +
m_feature_extract slice-merges — see ``plans/__init__`` ordering and
``tests/test_entry.py``); the RRF hybrid probe
(``r_hybrid_rrf``) composes this with the dense leg in
``plans.probes``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.text import (
    TOKS,
    TOKS_DUCK,
)

_BM25_QUERIES = [
    (1, ["spark", "join", "merge"]),
    (2, ["window", "stream", "batch"]),
    (3, ["vector", "hash", "customer"]),
]
_BM25_K = 10
_BM25_Q_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)


@register(
    "r_bm25_search",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS_DUCK} AS t FROM documents),
         q(qid, term) AS (VALUES {_BM25_Q_SQL}),
         terms AS (SELECT doc_id AS id, unnest(t) AS term FROM toks),
         tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         dl AS (SELECT doc_id AS id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(SUM(len(t)) AS BIGINT) AS sum_dl FROM toks),
         contrib AS (
           SELECT q.qid, tf.id,
                  CAST(FLOOR(
                    ln(1 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                            + CAST(1 AS DOUBLE)/2)
                           / (CAST(df AS DOUBLE) + CAST(1 AS DOUBLE)/2))
                    * (CAST(tf AS DOUBLE) * (CAST(12 AS DOUBLE)/10 + 1))
                    / (CAST(tf AS DOUBLE)
                       + CAST(12 AS DOUBLE)/10
                         * (CAST(1 AS DOUBLE)/4
                            + CAST(3 AS DOUBLE)/4 * CAST(dl AS DOUBLE)
                              / (CAST(sum_dl AS DOUBLE)
                                 / CAST(n_docs AS DOUBLE))))
                    * 10000 + CAST(1 AS DOUBLE)/2) AS BIGINT) AS w_q4
           FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                JOIN dl USING (id) CROSS JOIN stats),
         scored AS (SELECT qid, id, CAST(SUM(w_q4) AS BIGINT) AS score_q4
                    FROM contrib GROUP BY 1, 2),
         ranked AS (SELECT qid, id, score_q4,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY score_q4 DESC, id)
                             AS rnk
                    FROM scored)
    SELECT qid AS query_id, id AS doc_id, score_q4,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_BM25_K}
    """,
)
def r_bm25_search(spark, sf_dir):
    """Okapi BM25 retrieval (``operators.retrieval.bm25_search``): the
    top 10 documents for each of three keyword queries — the lexical
    rung of the retrieval surface (the ANN family is its dense
    counterpart), used for topic slicing and hard-negative mining in
    a training-data pipeline. The (doc, term, tf) inverted index is
    one corpus shuffle reused by the df rollup and the query probe;
    dim-sized query terms broadcast INTO the index (the corpus never
    moves); per-term BM25 weights are fixed-point-quantized before the
    per-(query, doc) sum so scores are exact integers cross-engine;
    top-k is a per-query window."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_search,
    )

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        literal_table,
    )

    (docs,) = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.expr(TOKS).alias("t"))
    # literal_table = VALUES LocalRelation: createDataFrame of 3 rows
    # parallelized into a 32-slice Python-pickled RDD scan — ~0.4-1.8 s
    # of task+worker overhead per run for a constant query table
    queries = literal_table(
        spark, _BM25_QUERIES, "query_id bigint, q array<string>"
    )
    return bm25_search(toked, queries, k=_BM25_K)


# NOTE: registration position matters (see plans.__init__): this module
# must stay imported between plans.multimodal and plans.curation so the
# first-50 window keeps its round-5 membership.
