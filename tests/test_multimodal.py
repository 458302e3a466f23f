"""Tests: multimodal binary plumbing — payload schema, mapInPandas
feature extraction (deterministic fake codec), frame sampling, codec
stub behavior."""

from __future__ import annotations

import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    real_decoder,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)], "doc_id long, text string"
    )


def test_attach_binary_payload_schema(spark, docs):
    out = attach_binary_payload(docs)
    dtypes = dict(out.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string,n_bytes:bigint")
    row = out.filter("doc_id = 1").collect()[0]
    assert bytes(row.payload) == b"hello world"
    assert row.meta.n_bytes == 11


def test_extract_features_batches(spark, docs):
    out = extract_features(attach_binary_payload(docs)).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_bytes == 11
    assert by_id[1].magic == b"hello"[:4].hex()
    assert len(by_id[1].features) == 16
    assert abs(sum(by_id[1].features) - 1.0) < 1e-9  # histogram normalized
    assert by_id[2].width == 200 % 640 and by_id[2].height == 200 % 480


def test_sample_frames_stride(spark, docs):
    frames = sample_frames(
        attach_binary_payload(docs), every_n_bytes=64, max_frames=8
    ).collect()
    f1 = [r for r in frames if r.doc_id == 1]
    f2 = sorted((r for r in frames if r.doc_id == 2), key=lambda r: r.frame_no)
    assert len(f1) == 1  # 11 bytes → single frame
    assert len(f2) == 4  # 200 bytes → frames at 0,64,128,192
    assert len(bytes(f2[0].frame_bytes)) == 64
    assert len(bytes(f2[3].frame_bytes)) == 200 - 192


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        real_decoder(b"...")
