"""End-to-end test of the corpus-curation pipeline example: quality
gate → decontamination → dedup ladder → mixture → packing → epoch
order, with reproducibility of the whole DAG."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.corpus import (
    build_pipeline,
)
from tests.conftest import SF_DIR

MAX_LEN = 64  # < max doc tokens (99), so chunking genuinely splits docs


def test_corpus_pipeline_end_to_end(spark, tmp_dir):
    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/run1", max_len=MAX_LEN)
    run = pipe.run(spark, "epoch-0")
    assert run.executed == [
        "ingest",
        "heldout",
        "quality",
        "decontaminated",
        "deduped",
        "mixed",
        "redacted",
        "chunked",
        "packed",
        "epoch",
    ]
    packed = run.results["packed"]

    # Decontamination: no held-out doc survives into the corpus
    # (packed rows are chunks — compare on the parent doc id).
    held_ids = {r.doc_id for r in run.results["heldout"].collect()}
    assert held_ids  # the sample actually selected something
    out_ids = {r.doc_id for r in packed.select("doc_id").collect()}
    parent_ids = {r.parent_doc_id for r in packed.select("parent_doc_id").collect()}
    assert not (held_ids & parent_ids)

    # Chunk lengths: bounded by the window, never degenerate (the
    # start rule guarantees trailing chunks carry > overlap tokens).
    assert packed.filter(~F.col("tok_len").between(5, MAX_LEN)).count() == 0

    # Mixture: curated docs are all English and kept at rate 1.0 —
    # every deduped English doc reaches the output.
    tags = {r.source for r in packed.select("source").distinct().collect()}
    assert tags == {"curated", "other"}
    assert packed.filter(
        (F.col("source") == "curated") & (F.col("lang") != "en")
    ).count() == 0
    n_en_dedup = run.results["deduped"].filter(F.col("lang") == "en").count()
    n_curated_parents = (
        packed.filter(F.col("source") == "curated")
        .select("parent_doc_id").distinct().count()
    )
    assert n_curated_parents == n_en_dedup

    # Chunking: docs longer than MAX_LEN were split (some parent has
    # >1 chunk), every chunk fits the window, and no chunk text
    # exceeds MAX_LEN whitespace tokens.
    per_parent = packed.groupBy("parent_doc_id").count()
    assert per_parent.filter(F.col("count") > 1).count() > 0
    assert packed.filter(F.col("tok_len") > MAX_LEN).count() == 0

    # Packing invariant: no pack exceeds the context window.
    overfull = (
        packed.groupBy("pack_id")
        .agg(F.sum(F.least(F.col("tok_len"), F.lit(MAX_LEN))).alias("tot"))
        .filter(F.col("tot") > MAX_LEN)
    )
    assert overfull.count() == 0
    # pack_offset is where the previous doc ended within the pack.
    bad_offsets = packed.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= MAX_LEN)
    )
    assert bad_offsets.count() == 0

    # Epoch order is a permutation of the packs, deterministically
    # reproducible (same seed → identical order).
    epoch_rows = run.results["epoch"].select("doc_id").collect()
    assert sorted(r.doc_id for r in epoch_rows) == sorted(out_ids)

    # Whole-DAG determinism: a fresh run into a fresh workdir yields
    # the identical corpus (hash sampling, no RNG state anywhere).
    run2 = build_pipeline(SF_DIR, f"{tmp_dir}/run2", max_len=MAX_LEN).run(
        spark, "epoch-0"
    )
    rows1 = sorted(
        map(tuple, packed.select("doc_id", "source", "pack_id", "pack_offset").collect())
    )
    rows2 = sorted(
        map(
            tuple,
            run2.results["packed"]
            .select("doc_id", "source", "pack_id", "pack_offset")
            .collect(),
        )
    )
    assert rows1 == rows2
