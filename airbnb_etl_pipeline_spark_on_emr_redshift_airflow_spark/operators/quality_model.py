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


GNB_SCALE = 1_000_000  # 6-dp fixed-point feature quantization


def gnb_quality_stats(
    labeled: DataFrame, label_col: str = "label"
) -> DataFrame:
    """ONE-ROW per-class Gaussian stats for the closed-form
    Naive-Bayes quality rung (round 12): per class c ∈ {0,1} the
    count ``n{c}`` and, per feature f, the exact integer sums
    ``s{c}_{f}`` = Σ floor(x·10^6 + ½) and ``s2{c}_{f}`` =
    Σ floor(x²·10^6 + ½) as DECIMAL(38,0). Quantize-then-sum is the
    ``dec_sum`` discipline: the sums are order-independent integers,
    so means/variances derived from them are DETERMINISTIC doubles —
    the property that makes the GNB rung SQL-replayable where the
    L-BFGS logistic fit (:func:`train_quality_classifier`) is not.
    One aggregation pass; the row is broadcast-sized."""
    aggs = [
        F.count(F.when(F.col(label_col) == 0, F.lit(1)))
        .cast("bigint").alias("n0"),
        F.count(F.when(F.col(label_col) == 1, F.lit(1)))
        .cast("bigint").alias("n1"),
    ]
    for f in FEATURE_NAMES:
        q = F.floor(F.col(f) * GNB_SCALE + F.lit(0.5)).cast("bigint")
        q2 = F.floor(
            F.col(f) * F.col(f) * GNB_SCALE + F.lit(0.5)
        ).cast("bigint")
        for c in (0, 1):
            cond = F.col(label_col) == c
            aggs.append(
                F.sum(F.when(cond, q).cast("decimal(38,0)"))
                .alias(f"s{c}_{f}")
            )
            aggs.append(
                F.sum(F.when(cond, q2).cast("decimal(38,0)"))
                .alias(f"s2{c}_{f}")
            )
    return labeled.agg(*aggs)


def gnb_logit_sql() -> str:
    """The GNB log-odds as ONE portable SQL expression over the
    quantized feature columns ``q_<f>`` plus the stats row's columns
    — shared VERBATIM by the Spark scorer (``F.expr``) and the DuckDB
    oracle, so both engines evaluate the identical IEEE expression
    tree: per feature, logit += ½ln(v0) − ½ln(v1) + (x−m0)²/(2v0) −
    (x−m1)²/(2v1) (the 2π terms cancel in the difference), plus the
    prior log-odds ln(n1/n0). Variances floor at 1e-9 (a constant
    feature would otherwise divide by zero)."""
    terms = []
    for f in FEATURE_NAMES:
        x = f"(CAST(q_{f} AS DOUBLE) / CAST({GNB_SCALE} AS DOUBLE))"
        stats = {}
        for c in (0, 1):
            n = f"CAST(n{c} AS DOUBLE)"
            m = (
                f"(CAST(s{c}_{f} AS DOUBLE) "
                f"/ CAST({GNB_SCALE} AS DOUBLE) / {n})"
            )
            e2 = (
                f"(CAST(s2{c}_{f} AS DOUBLE) "
                f"/ CAST({GNB_SCALE} AS DOUBLE) / {n})"
            )
            v = (
                f"(greatest({e2} - {m} * {m}, CAST(0 AS DOUBLE)) "
                f"+ 1e-9)"
            )
            stats[c] = (m, v)
        m0, v0 = stats[0]
        m1, v1 = stats[1]
        terms.append(
            f"(CAST(0.5 AS DOUBLE) * ln({v0}) "
            f"- CAST(0.5 AS DOUBLE) * ln({v1}) "
            f"+ ({x} - {m0}) * ({x} - {m0}) / (CAST(2 AS DOUBLE) * {v0}) "
            f"- ({x} - {m1}) * ({x} - {m1}) / (CAST(2 AS DOUBLE) * {v1}))"
        )
    terms.append("ln(CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE))")
    return "(" + " + ".join(terms) + ")"


def score_gnb_quality(
    feats: DataFrame, stats: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, p_keep) from the GNB stats row: quantize the features
    (the same 6-dp fixed point the stats were built from, so scorer
    and trainer see the identical x), broadcast the 1-row stats
    frame, and evaluate :func:`gnb_logit_sql` → sigmoid. One scan,
    no shuffle; cross-engine bit-determinism modulo the platform's
    ln/exp (last-ulp class, the established t_bigram_lm_score
    discipline)."""
    qcols = [
        F.floor(F.col(f) * GNB_SCALE + F.lit(0.5))
        .cast("bigint").alias(f"q_{f}")
        for f in FEATURE_NAMES
    ]
    j = feats.select(F.col(id_col), *qcols).crossJoin(F.broadcast(stats))
    p = (
        f"CAST(1 AS DOUBLE) / "
        f"(CAST(1 AS DOUBLE) + exp(-{gnb_logit_sql()}))"
    )
    return j.select(F.col(id_col), F.expr(p).alias("p_keep"))


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
