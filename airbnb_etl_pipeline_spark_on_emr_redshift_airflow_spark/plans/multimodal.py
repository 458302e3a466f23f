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
    unit-tested in ``tests/test_multimodal.py``."""
    (docs,) = load(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(docs).select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        "payload",
    )
    frames = sample_frames(
        with_bin, every_n_bytes=64, max_frames=8, carry=("n_bytes", "mime")
    ).select(
        F.lit("frames").alias("slice"),
        "doc_id",
        "n_bytes",
        "mime",
        "frame_no",
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
        F.lit(None).cast("string").alias("magic"),
        *[F.lit(None).cast("bigint").alias(f"f{i:02d}") for i in range(16)],
    )
    feats = extract_features(attach_binary_payload(docs))
    features = feats.select(
        F.lit("features").alias("slice"),
        "doc_id",
        "n_bytes",
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("frame_no"),
        F.lit(None).cast("bigint").alias("frame_len"),
        "magic",
        *[
            F.col("features")[i].cast("bigint").alias(f"f{i:02d}")
            for i in range(16)
        ],
    )
    return frames.unionByName(features)
