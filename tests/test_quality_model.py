"""Tests: classifier-based quality filtering — separable synthetic
corpora, deterministic refits, and the corpus-scoring contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.quality_model import (
    FEATURE_NAMES,
    quality_features,
    score_quality,
    train_quality_classifier,
)

NATURAL = [
    "the cat sat on the mat and the dog slept by the door",
    "we walked to the market and bought bread and a little cheese",
    "it was a bright morning and the birds were singing in the trees",
    "she opened the letter and read it slowly by the window",
    "they drove along the coast and stopped for lunch at noon",
    "he is reading a book about the history of the old town",
]
GIBBERISH = [
    "xqzt bvkp wrmml zzkrt pqv xxj",
    "kkkk kkkk kkkk kkkk kkkk kkkk",
    "zzzz qqqq xxxx vvvv bbbb nnnn",
    "qwrtpsdf ghjklzxc vbnmqwrt 9183 7462",
    "xj qv zt pk wm rl xj qv zt pk",
    "mmmmmmmm wwwwwwww 00000000 ////////",
]


def _labeled(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(NATURAL)] + [
        (100 + i, t, 0.0) for i, t in enumerate(GIBBERISH)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, label double")
    return quality_features(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )


def test_classifier_separates_natural_from_gibberish(spark):
    feats = _labeled(spark)
    model = train_quality_classifier(feats)
    scores = {r.doc_id: r.p_keep for r in score_quality(feats, model).collect()}
    # every natural doc outranks every gibberish doc
    assert min(scores[i] for i in range(6)) > max(
        scores[100 + i] for i in range(6)
    )
    # and the classes sit on the right sides of 0.5
    assert all(scores[i] > 0.5 for i in range(6))
    assert all(scores[100 + i] < 0.5 for i in range(6))


def test_classifier_refit_is_deterministic(spark):
    feats = _labeled(spark)
    a = train_quality_classifier(feats).coefficients.toArray().tolist()
    b = train_quality_classifier(feats).coefficients.toArray().tolist()
    assert a == b
    assert len(a) == len(FEATURE_NAMES)


def test_quality_features_scan_stage_no_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id bigint, text string"
    )
    plan = (
        quality_features(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # feature computation is one scan


def test_gnb_separates_and_is_deterministic(spark):
    """The closed-form Gaussian-NB rung (round 12 — the SQL-replayable
    quality classifier): separability on the same fixture as the LR
    rung, and bit-determinism across refits (the stats are exact
    integer sums, so there is nothing iterative to drift)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.quality_model import (
        gnb_quality_stats,
        score_gnb_quality,
    )

    feats = _labeled(spark)
    stats = gnb_quality_stats(feats)
    scores = {
        r.doc_id: r.p_keep
        for r in score_gnb_quality(feats, stats).collect()
    }
    assert min(scores[i] for i in range(6)) > max(
        scores[100 + i] for i in range(6)
    )
    again = {
        r.doc_id: r.p_keep
        for r in score_gnb_quality(feats, gnb_quality_stats(feats)).collect()
    }
    assert scores == again  # bit-identical, not approximately equal
