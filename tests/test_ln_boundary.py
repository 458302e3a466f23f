"""ln-boundary sweep (VERDICT r6 next #7): the drift/LM/BM25 oracles
assume JVM ``Math.log`` and DuckDB ``ln`` agree through the
``floor(x·scale + 0.5)`` quantization. IEEE-754 does not require
``ln`` to be correctly rounded, so the engines may disagree by ~1 ulp
of the log result — a hash flake is possible ONLY if some term's
pre-quantization value lands within that ulp of a floor boundary.
This sweep evaluates every shipped term expression (via the
``return_terms`` / ``return_bins`` diagnostic seams — the IDENTICAL
expression objects the operators quantize, nothing re-derived) over
the FULL sf0.01 domain and measures each term's distance to its
nearest boundary, asserting it exceeds a conservative propagated-
error bound by a wide margin — turning six rounds of "no flake
observed" into a checked property of the data domain.

Bound: for ``x = raw·scale + 0.5``, a 1-ulp ``ln`` disagreement
propagates to ``Δx ≈ ulp(|x|) ≈ |x|·2⁻⁵²``; we require
``dist(x, nearest integer) > 64·(|x| + 1)·2⁻⁵²`` — 64× the worst
1-ulp disagreement, and the +1 floors the bound away from zero for
tiny terms. Sweeps run at sf0.01 (the driver's correctness SF) when
present, else the suite's default SF."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

SWEEP_DIR = (
    "/root/testdata/sf0.01"
    if os.path.isdir("/root/testdata/sf0.01")
    else SF_DIR
)
EPS = 2.0 ** -52
MARGIN = 64.0


def _assert_far_from_boundary(term_df, raw_col: str, scale: float, what: str):
    x = F.col(raw_col) * F.lit(float(scale)) + F.lit(0.5)
    frac = x - F.floor(x)
    dist = F.least(frac, F.lit(1.0) - frac)
    bound = F.lit(MARGIN) * (F.abs(x) + F.lit(1.0)) * F.lit(EPS)
    stats = (
        term_df.select(
            dist.alias("d"),
            bound.alias("b"),
            (dist <= bound).cast("int").alias("viol"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("viol").alias("violations"),
            F.min(F.col("d") / F.col("b")).alias("min_ratio"),
        )
        .first()
    )
    assert stats["n"] > 0, f"{what}: sweep saw no terms"
    assert stats["violations"] == 0, (
        f"{what}: {stats['violations']} of {stats['n']} terms sit within "
        f"{MARGIN}x the 1-ulp ln-disagreement band of a floor boundary "
        f"(min dist/bound {stats['min_ratio']:.3g}) — quantize or move "
        "the boundary"
    )
    # report the measured margin in the assertion message of a pass-
    # shaped check so a future shrink is visible in -v output
    assert stats["min_ratio"] > 1.0, (what, stats["min_ratio"])


def test_psi_terms_far_from_fixed_point_boundary(spark):
    """a_drift_report's per-bin PSI terms (scale 1e6), over the exact
    ref/cur split the probe builds at sf0.01."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.profile import (
        drift_report,
        psi_raw_term,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (orders,) = load(spark, SWEEP_DIR, "orders")
    ref = orders.filter("o_orderkey % 2 = 0")
    cur = orders.filter("o_orderkey % 2 = 1").select(
        (
            F.col("o_totalprice")
            * F.when(F.col("o_custkey") % 3 == 0, F.lit(2.5)).otherwise(
                F.lit(1.0)
            )
        ).alias("o_totalprice"),
        F.when(F.col("o_custkey") % 3 == 0, F.lit("1-URGENT"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    bins = drift_report(
        ref,
        cur,
        numeric_cols=["o_totalprice"],
        cat_cols=["o_orderpriority"],
        n_buckets=10,
        return_bins=True,
    )
    terms = bins.select(psi_raw_term().alias("raw"))
    _assert_far_from_boundary(terms, "raw", 1_000_000.0, "psi")


def test_unigram_lm_terms_far_from_fixed_point_boundary(spark):
    """t_unigram_lm_score's per-(doc, term) products (4-dp fixed
    point) over the full sf0.01 tokenized corpus."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        unigram_lm_score,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.text import TOKS

    (docs,) = load(spark, SWEEP_DIR, "documents")
    toked = docs.select("doc_id", F.expr(TOKS).alias("t"))
    terms = unigram_lm_score(toked, "t", "doc_id", return_terms=True)
    _assert_far_from_boundary(terms, "raw", 10_000.0, "unigram_lm")


def test_bigram_lm_terms_far_from_fixed_point_boundary(spark):
    """t_bigram_lm_score's per-bigram products (4-dp fixed point)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        bigram_lm_score,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.text import TOKS

    (docs,) = load(spark, SWEEP_DIR, "documents")
    toked = docs.select("doc_id", F.expr(TOKS).alias("t"))
    terms = bigram_lm_score(toked, "t", "doc_id", return_terms=True)
    _assert_far_from_boundary(terms, "raw", 10_000.0, "bigram_lm")


def test_bm25_terms_far_from_fixed_point_boundary(spark):
    """r_bm25_search's per-(query, doc, term) weights (4-dp fixed
    point), with the probe's exact query set."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_search,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.retrieval import (
        _BM25_QUERIES,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.text import TOKS

    (docs,) = load(spark, SWEEP_DIR, "documents")
    toked = docs.select("doc_id", F.expr(TOKS).alias("t"))
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id bigint, q array<string>"
    )
    terms = bm25_search(toked, queries, k=10, return_terms=True)
    _assert_far_from_boundary(terms, "raw", 10_000.0, "bm25")
