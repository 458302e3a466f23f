"""Catalog: multimodal binary-column operators over ``documents``
(training-data extension — the testdata has no real media, so the
payload is deterministic UTF-8 bytes; the plumbing is the deliverable,
see ``operators.multimodal``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    sample_frames,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)


@register("m_multimodal_pipeline")
def m_multimodal_pipeline(spark, sf_dir):
    """The multimodal binary plumbing in one driver-window slot,
    slice-tagged (absorbs the former ``m_binary_frames`` and
    ``m_feature_extract`` rows — both re-registered verbatim, with
    their oracles, past the driver window).

    'frames' slice — binary payload attach + typed metadata struct +
    stride frame sampling (capped at 8 frames/doc): the video
    frame-sample plumbing shape, pure column ops. 'features' slice —
    mapInPandas decode + featurize (deterministic fake codec —
    byte-histogram features; real decoders inject at the
    ``decode_payload`` seam), the 16-bin vector projected to scalar
    columns (the driver's canonicalizer hashes scalars only).

    Rows-only here (the mapInPandas featurizer is not
    SQL-expressible); the frames slice keeps its DuckDB oracle on the
    re-registered ``m_binary_frames``, and batch/schema semantics are
    unit-tested in ``tests/test_multimodal.py``.

    SELF-CERTIFYING (round 6): every row carries an ``ok`` boolean
    checkable from the recorded data — frames rows assert the stride
    arithmetic (``frame_len = min(64, n_bytes − 64·frame_no)``), the
    exact per-doc frame count (``min(8, ⌊n_bytes/64⌋+1)``) and the
    contiguous 0-based frame numbering; features rows assert
    EXACTLY-ONCE per doc plus the decode round-trip
    (``width = n_bytes mod 640``, ``height = n_bytes mod 480`` — the
    fake codec's documented arithmetic, so a dropped or duplicated
    Arrow batch flips ``ok``). Pinned by ``tests/test_multimodal.py``.
    """
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(docs).select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        "payload",
    )
    fw = Window.partitionBy("doc_id")
    frames = (
        sample_frames(
            with_bin, every_n_bytes=64, max_frames=8, carry=("n_bytes", "mime")
        )
        .select(
            "doc_id",
            "n_bytes",
            "mime",
            "frame_no",
            F.length("frame_bytes").cast("bigint").alias("frame_len"),
        )
        .withColumn(
            "ok",
            (
                F.col("frame_len")
                == F.least(F.lit(64), F.col("n_bytes") - 64 * F.col("frame_no"))
            )
            & (
                F.count(F.lit(1)).over(fw)
                == F.least(
                    F.lit(8), F.floor(F.col("n_bytes") / 64) + F.lit(1)
                )
            )
            & (F.min("frame_no").over(fw) == F.lit(0))
            & (
                F.max("frame_no").over(fw)
                == F.count(F.lit(1)).over(fw) - F.lit(1)
            ),
        )
        .select(
            F.lit("frames").alias("slice"),
            "doc_id",
            "n_bytes",
            "mime",
            "frame_no",
            "frame_len",
            F.lit(None).cast("string").alias("magic"),
            F.lit(None).cast("bigint").alias("width"),
            F.lit(None).cast("bigint").alias("height"),
            *[F.lit(None).cast("bigint").alias(f"f{i:02d}") for i in range(16)],
            "ok",
        )
    )
    feats = extract_features(attach_binary_payload(docs))
    xw = Window.partitionBy("doc_id")
    features = feats.withColumn(
        "ok",
        (F.count(F.lit(1)).over(xw) == F.lit(1))
        & (F.col("width") == F.col("n_bytes") % 640)
        & (F.col("height") == F.col("n_bytes") % 480)
        & (F.col("n_bytes") > 0),
    ).select(
        F.lit("features").alias("slice"),
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("frame_no"),
        F.lit(None).cast("bigint").alias("frame_len"),
        "magic",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        *[
            F.col("features")[i].cast("bigint").alias(f"f{i:02d}")
            for i in range(16)
        ],
        "ok",
    )
    return frames.unionByName(features)
