"""Classifier-based quality filtering (training-data extension).

The third rung of the curation-quality ladder, after the heuristic
gate (``functions.text.quality_score``) and the corpus-LM perplexity
filters (``aggregates.unigram_lm_score`` / ``bigram_lm_score``): train
a lightweight linear classifier to imitate a trusted label — "looks
like the curated set" — and keep documents by predicted probability.
This is the modern fastText-style recipe (GPT-3's WebText classifier,
DCLM, FineWeb-Edu): cheap features, a linear model, corpus-wide
scoring as one scan.

Spark-first split:

- **features** are pure column expressions over the shared text SQL
  (scan-stage, no UDF, identical in any engine)
- **training** is MLlib ``LogisticRegression`` on the (small,
  hash-sampleable) labeled frame — L-BFGS, deterministic for a fixed
  input and seed
- **scoring** is one ``model.transform`` scan over the corpus —
  O(corpus) with no shuffle; the model is a coefficient vector, a
  broadcast-sized closure
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.text import (
    dup_token_frac_sql,
    stopword_ratio_sql,
    token_count_sql,
)

# Generic document statistics — deliberately NOT the language-marker
# scores themselves, so the classifier has to LEARN the correlation
# from distributional features (the realistic setting: the trusted
# label is expensive, the features are cheap).
FEATURE_NAMES = (
    "log_len",
    "n_tokens",
    "stopword_ratio",
    "dup_token_frac",
    "alpha_density",
    "mean_token_len",
)


def _feature_cols(text_col: str) -> list[Column]:
    n = f"length({text_col})"
    toks = token_count_sql(text_col)
    alpha = (
        f"length(regexp_replace(lower({text_col}), '[^a-z0-9 ]+', ''))"
    )
    return [
        F.expr(f"ln(1 + {n})").alias("log_len"),
        F.expr(f"CAST({toks} AS DOUBLE)").alias("n_tokens"),
        F.expr(stopword_ratio_sql(text_col)).alias("stopword_ratio"),
        F.expr(dup_token_frac_sql(text_col)).alias("dup_token_frac"),
        F.expr(
            f"CASE WHEN {n} = 0 THEN 0.0 "
            f"ELSE CAST({alpha} AS DOUBLE) / {n} END"
        ).alias("alpha_density"),
        F.expr(
            f"CASE WHEN {toks} = 0 THEN 0.0 "
            f"ELSE CAST({n} AS DOUBLE) / {toks} END"
        ).alias("mean_token_len"),
    ]


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, <feature columns>, features vector): scan-stage document
    statistics assembled into the MLlib vector column. Pure column
    expressions — computing features for 100 TB is one scan."""
    from pyspark.ml.functions import array_to_vector

    feats = docs.select(F.col(id_col), *_feature_cols(text_col))
    arr = F.array(*[F.col(c) for c in FEATURE_NAMES])
    return feats.withColumn("features", array_to_vector(arr))


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the linear quality model on a labeled feature frame (from
    :func:`quality_features` + a label column). At corpus scale the
    labeled set is a hash-sample joined to trusted labels — training
    input is sample-sized, never the corpus. L-BFGS is deterministic
    for a fixed input. Returns the fitted MLlib model (a coefficient
    vector — broadcast-sized)."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(labeled)
    # Drop the training summary. It pins the training-prediction
    # DataFrame AND the SparkSession inside the model object; scoring
    # serializes the model into the transform UDF's task closure, so a
    # summary-carrying model ships driver state to every executor —
    # and fails outright once the session holds any non-serializable
    # member (observed: java.io.NotSerializableException on the
    # session's ObservationManager when ``df.observe`` has been used
    # anywhere in the process). Stripped, the model is what the
    # contract says: a coefficient vector. ``setSummary`` is
    # ``private[ml]`` — public in bytecode, reachable via py4j; if a
    # future Spark renames it, scoring still works (the summary is
    # then retained, reintroducing only the closure-weight concern).
    try:
        empty = labeled.sparkSession._jvm.scala.Option.empty()
        model._java_obj.setSummary(empty)
    except Exception:
        pass
    return model


def score_quality(
    feats: DataFrame, model, id_col: str = "doc_id"
) -> DataFrame:
    """(id, p_keep): the positive-class probability for every
    document — one ``model.transform`` scan, no shuffle. Filter or
    stratify on ``p_keep`` downstream (e.g. keep > τ, or feed it to
    :func:`..sampling.budget_select` as the priority)."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(feats)
    return out.select(
        F.col(id_col),
        vector_to_array("probability").getItem(1).alias("p_keep"),
    )
