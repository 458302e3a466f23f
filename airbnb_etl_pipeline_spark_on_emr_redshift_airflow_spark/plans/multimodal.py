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


@register(
    "m_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'fake/utf8' AS mime
    FROM documents
    """,
)
def m_binary_metadata(spark, sf_dir):
    """Binary payload attach + typed metadata struct: byte lengths and
    mime tags survive the binary round-trip (oracle recomputes via
    DuckDB's encode/octet_length)."""
    (docs,) = load(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(docs)
    return with_bin.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
    )


@register("m_feature_extract")
def m_feature_extract(spark, sf_dir):
    """mapInPandas decode + featurize (deterministic fake codec —
    byte-histogram features; real decoders inject at the
    ``decode_payload`` seam). Rows-only check; batch/schema semantics
    unit-tested. The 16-bin feature vector is projected to per-bin
    scalar columns here — the driver's canonicalizer can't hash array
    cells (the array-returning operator itself is unchanged)."""
    (docs,) = load(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs))
    bins = [F.col("features")[i].alias(f"f{i:02d}") for i in range(16)]
    return feats.select("doc_id", "n_bytes", "magic", "width", "height", *bins)


@register(
    "m_frame_sample",
    oracle="""
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ), idx AS (
      SELECT doc_id, n, unnest(range(0, least(n // 64, 7) + 1)) AS frame_no
      FROM src
    )
    SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
           GREATEST(LEAST(64, n - frame_no * 64), 0) AS frame_len
    FROM idx
    """,
)
def m_frame_sample(spark, sf_dir):
    """Frame sampling over a binary payload: stride slices as pure
    column ops (one row per frame, capped at 8) — the video
    frame-sample plumbing shape."""
    (docs,) = load(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs), every_n_bytes=64, max_frames=8)
    return frames.select(
        "doc_id",
        "frame_no",
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
    )
