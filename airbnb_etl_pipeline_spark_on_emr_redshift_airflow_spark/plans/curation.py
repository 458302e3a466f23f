"""Catalog: training-data curation — benchmark decontamination,
deterministic sampling/mixing, sequence packing (the corpus-prep layer
between "deduped documents" and "training batches"; first-class per
the build contract, previously pytest-only).

All three are rows-only driver entries: the operators hinge on Spark's
``xxhash64`` (sampling/mix/packing group placement) or a greedy
``applyInPandas`` scan (packing), neither DuckDB-expressible. Each
query therefore PLANTS its invariant so the returned rows carry the
semantics: decontamination returns the contaminated ids labeled by how
they were planted; sampling returns the exact hash-predicate keep-set
(layout-independent by construction); packing returns per-doc
(pack_id, pack_offset) whose bound/coverage/determinism are asserted
in ``tests/test_sampling.py`` and re-derivable from the rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions import text as T
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
    contaminated_ids,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
    weighted_mix,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
    register,
)

# First 13 normalized words of a doc — the fragment embedded into a
# synthetic eval question to plant 13-gram overlap (same normalization
# as operators.dedup.word_shingles, so the shingle survives verbatim).
_FRAG13 = (
    "array_join(slice(split(trim(regexp_replace(lower(text), "
    "'[^a-z]+', ' ')), ' '), 1, 13), ' ')"
)


@register("d_decontaminate")
def d_decontaminate(spark, sf_dir):
    """Benchmark decontamination (``operators.dedup.contaminated_ids``
    / ``decontaminate``): the held-out eval set is built FROM the
    corpus so contamination is planted and checkable — every doc_id %
    97 == 0 appears verbatim as an eval doc (exact-fingerprint probe
    must flag it) and every doc_id % 89 == 0 contributes its first 13
    normalized words embedded inside an otherwise-novel eval question
    (the 13-gram inverted-index probe must flag it; docs shorter than
    13 words have no complete shingle and are legitimately missed).
    Returns the contaminated train ids labeled by planting mechanism.
    Scale shape: held-out side is dim-sized and broadcast; shingle
    probe via inverted index — never O(train × heldout). Rows-only
    (fingerprint md5 is oracle-able but the planted-fragment shingle
    join is the point here); planted-coverage asserted in
    ``tests/test_dedup.py``."""
    (docs,) = load(spark, sf_dir, "documents")
    train = docs.select("doc_id", "text")
    # heldout keeps a doc_id column (word_shingles expects one); eval
    # ids are disjoint from train ids via negation — they never leak
    # into the returned contaminated set.
    verbatim = train.filter("doc_id % 97 = 0").select(
        (-F.col("doc_id") - 1).alias("doc_id"), "text"
    )
    fragments = train.filter("doc_id % 89 = 0").select(
        (-F.col("doc_id") - 1_000_001).alias("doc_id"),
        F.expr(
            f"concat('benchmark question: ', {_FRAG13}, ' answer unknown')"
        ).alias("text"),
    )
    heldout = verbatim.unionByName(fragments)
    bad = contaminated_ids(train, heldout, n=13, min_shared_shingles=1)
    return bad.withColumn(
        "planted",
        F.when(F.col("doc_id") % 97 == 0, "verbatim")
        .when(F.col("doc_id") % 89 == 0, "fragment13")
        .otherwise("collateral"),
    )


@register("c_pack_sequences")
def c_pack_sequences(spark, sf_dir):
    """The sampling→packing curation chain in one slot, slice-tagged
    (absorbs the former ``c_sample_mix`` row — re-registered verbatim
    past the driver window, like every merged original).

    'pack' slice — sequence packing
    (``operators.sampling.pack_sequences``): every document sized by
    whitespace token count, first-fit packed into 256-token context
    windows across 16 hash groups. The rows prove the contract: each
    doc appears exactly once, per-pack token totals ≤ 256, offsets are
    a proper prefix layout, pack_id = group << 32 | local
    (collision-free), and the whole assignment is deterministic (hash
    grouping + hash-ordered greedy scan — no RNG, no layout
    dependence).

    'stratified' / 'mixture' slices — deterministic sampling + mixture
    weighting, both keyed by ``xxhash64(seed, doc_id)`` so the
    keep-set is a pure function of (key, seed) — identical across
    runs, partition counts, and cluster layouts (unlike RNG-based
    ``df.sample``): per-source rates over the documents table's own
    source strata (keep all of src0, 40% of src1, drop src2) and a
    ``weighted_mix`` of two disjoint corpus halves at 25%/75%, tagged
    by source name in ``bucket``.

    Rows-only (greedy ``applyInPandas`` scan and Spark-compatible
    xxhash64 are not DuckDB-expressible); pack
    bound/coverage/determinism and sampling rate-band/layout-
    independence unit-tested in ``tests/test_sampling.py`` and
    ``tests/test_example_corpus.py``."""
    (docs,) = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", T.token_count("text").cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences(
        sized, "n_tokens", max_len=256, key_cols=["doc_id"], n_groups=16, seed=0
    ).select(
        F.lit("pack").alias("slice"),
        "doc_id", "n_tokens", "pack_id", "pack_offset",
        F.lit(None).cast("string").alias("bucket"),
    )
    strat = stratified_sample(
        docs, "source", {"src0": 1.0, "src1": 0.4, "src2": 0.0},
        ["doc_id"], seed=5,
    ).select(
        F.lit("stratified").alias("slice"),
        "doc_id",
        F.lit(None).cast("bigint").alias("n_tokens"),
        F.lit(None).cast("bigint").alias("pack_id"),
        F.lit(None).cast("bigint").alias("pack_offset"),
        F.col("source").alias("bucket"),
    )
    mixed = weighted_mix(
        {
            "head": (docs.filter("doc_id % 2 = 0").drop("source"), 0.25),
            "tail": (docs.filter("doc_id % 2 = 1").drop("source"), 0.75),
        },
        ["doc_id"],
        seed=7,
    ).select(
        F.lit("mixture").alias("slice"),
        "doc_id",
        F.lit(None).cast("bigint").alias("n_tokens"),
        F.lit(None).cast("bigint").alias("pack_id"),
        F.lit(None).cast("bigint").alias("pack_offset"),
        F.col("source").alias("bucket"),
    )
    return packed.unionByName(strat).unionByName(mixed)
