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


# --- rotated into the driver window (round 9): m_binary_frames ---
# The oracle-checked frames slice returns to the window so the
# multimodal family keeps an oracle-checked representative; the
# rows-only m_multimodal_pipeline (mapInPandas featurizer) moved past
# the window, re-registered verbatim in plans.probes.
@register(
    "m_binary_frames",
    oracle="""
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ), idx AS (
      SELECT doc_id, n, unnest(range(0, least(n // 64, 7) + 1)) AS frame_no
      FROM src
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           'fake/utf8' AS mime,
           CAST(frame_no AS INT) AS frame_no,
           GREATEST(LEAST(64, n - frame_no * 64), 0) AS frame_len
    FROM idx
    """,
)
def m_binary_frames(spark, sf_dir):
    """Binary payload attach + typed metadata struct + frame sampling
    in one query: the payload round-trips through ``binary`` (byte
    lengths and mime tags survive — oracle recomputes via DuckDB's
    encode/octet_length), then stride-sliced into one row per sampled
    frame (capped at 8) with the doc metadata carried along — the
    video frame-sample plumbing shape, all pure column ops. Merged
    into ``m_multimodal_pipeline``'s 'frames' slice for the driver
    window; re-registered here unchanged (keeping the oracle)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    (docs,) = load(spark, sf_dir, "documents")
    with_bin = attach_binary_payload(docs).select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        "payload",
    )
    frames = sample_frames(
        with_bin, every_n_bytes=64, max_frames=8, carry=("n_bytes", "mime")
    )
    return frames.select(
        "doc_id",
        "n_bytes",
        "mime",
        "frame_no",
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
    )
