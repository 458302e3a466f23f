"""Tests: the one-call OPTIMIZE lifecycle (sources.optimize) —
write → optimize → pruned reads bit-identical to the full scan,
re-optimize flips versions without disturbing in-flight readers,
and a crash mid-optimize leaves readers on the old version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
    optimize_table,
    read_optimized,
    read_optimized_data,
)


def _corpus(spark, n=20000, shift=0):
    return spark.range(n).select(
        (F.col("id") + shift).alias("event_id"),
        (F.col("id") % 500).cast("double").alias("v"),
        ((F.col("id") * 7) % 1000).cast("double").alias("u"),
    )


DIMS = [("v", 0.0, 500.0), ("u", 0.0, 1000.0)]


def test_optimize_then_pruned_reads_equal_full_scan(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("opt")) + "/table"
    df = _corpus(spark)
    n = optimize_table(
        df, root, DIMS, bloom_cols=["event_id"],
        target_rows_per_file=2000,
    )
    assert n == 1
    full = read_optimized_data(spark, root)
    assert full.count() == 20000

    # zone-pruned range read
    sz: dict = {}
    got = read_optimized(
        spark, root, range_predicates=[("v", 100.0, 150.0)], stats=sz
    )
    want = full.filter("v >= 100.0 AND v <= 150.0")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert 0 < sz["files_read"] < sz["files_total"], sz

    # bloom-pruned IN-list read
    sb: dict = {}
    got_b = read_optimized(
        spark, root, in_predicates=[("event_id", [7, 4242])], stats=sb
    )
    assert sorted(r["event_id"] for r in got_b.collect()) == [7, 4242]
    assert sb["files_read"] < sb["files_total"], sb

    # composed zone ∧ bloom: multiplicative, still exact
    sc: dict = {}
    got_c = read_optimized(
        spark, root,
        range_predicates=[("v", 100.0, 150.0)],
        in_predicates=[("event_id", [100, 12345])],
        stats=sc,
    )
    want_c = full.filter("v >= 100.0 AND v <= 150.0").filter(
        F.col("event_id").isin(100, 12345)
    )
    assert sorted(map(tuple, got_c.collect())) == sorted(
        map(tuple, want_c.collect())
    )
    assert sc["files_read"] <= min(sz["files_read"], sb["files_read"])


def test_reoptimize_versions_and_read_stability(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("opt2")) + "/table"
    optimize_table(
        _corpus(spark, 5000), root, DIMS, bloom_cols=["event_id"],
        target_rows_per_file=1000,
    )
    before = sorted(
        map(tuple, read_optimized(
            spark, root, range_predicates=[("v", 10.0, 60.0)]
        ).collect())
    )
    # re-optimize the same content at a different file-size target:
    # new version, pruned reads bit-identical before/after
    n2 = optimize_table(
        _corpus(spark, 5000), root, DIMS, bloom_cols=["event_id"],
        target_rows_per_file=500,
    )
    assert n2 == 2
    after = sorted(
        map(tuple, read_optimized(
            spark, root, range_predicates=[("v", 10.0, 60.0)]
        ).collect())
    )
    assert after == before


def test_crash_mid_optimize_leaves_readers_on_old_version(
    spark, tmp_path_factory, monkeypatch
):
    """A failure AFTER the data rewrite but BEFORE the pointer flip
    must leave the table serving the previous version (complete with
    its manifests), and the next optimize must recover cleanly."""
    import airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize as opt

    root = str(tmp_path_factory.mktemp("opt3")) + "/table"
    optimize_table(
        _corpus(spark, 3000), root, DIMS, bloom_cols=["event_id"],
        target_rows_per_file=1000,
    )
    served = sorted(
        map(tuple, read_optimized(
            spark, root, range_predicates=[("v", 0.0, 50.0)]
        ).collect())
    )

    # crash injection: the commit-marker write (the step before the
    # pointer flip) raises — data + manifests for v=2 already exist
    real_write = opt.fsutil.write_text_atomic

    def boom(spark_, path, text):
        if path.endswith("_SUCCESS"):
            raise RuntimeError("injected crash before commit")
        return real_write(spark_, path, text)

    monkeypatch.setattr(opt.fsutil, "write_text_atomic", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        optimize_table(
            _corpus(spark, 9999), root, DIMS, bloom_cols=["event_id"],
            target_rows_per_file=1000,
        )
    monkeypatch.setattr(opt.fsutil, "write_text_atomic", real_write)

    # readers: still version 1, same rows, manifests consistent
    assert read_optimized_data(spark, root).count() == 3000
    again = sorted(
        map(tuple, read_optimized(
            spark, root, range_predicates=[("v", 0.0, 50.0)]
        ).collect())
    )
    assert again == served

    # recovery: the crashed attempt burned its claimed number, the
    # next optimize allocates past it and serves cleanly (the orphan
    # partial dir stays invisible to version discovery)
    n = optimize_table(
        _corpus(spark, 4000), root, DIMS, bloom_cols=["event_id"],
        target_rows_per_file=1000,
    )
    assert n == 3
    assert read_optimized_data(spark, root).count() == 4000


def test_rollback_pointer(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        rollback_version,
    )

    root = str(tmp_path_factory.mktemp("opt4")) + "/table"
    optimize_table(_corpus(spark, 1000), root, DIMS,
                   target_rows_per_file=500)
    optimize_table(_corpus(spark, 2000), root, DIMS,
                   target_rows_per_file=500)
    assert read_optimized_data(spark, root).count() == 2000
    rollback_version(root, 1, spark)
    assert read_optimized_data(spark, root).count() == 1000


def test_read_without_bloom_manifest_raises(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("opt5")) + "/table"
    optimize_table(_corpus(spark, 1000), root, DIMS,
                   target_rows_per_file=500)
    with pytest.raises(ValueError, match="without"):
        read_optimized(spark, root, in_predicates=[("event_id", [5])])


def test_time_travel_version_pin(spark, tmp_path_factory):
    """Pinned-version reads are stable across later optimizes (time
    travel), pruned reads travel with the pinned version's own
    manifests, and a pruned/never-written version raises loudly."""
    root = str(tmp_path_factory.mktemp("opt6")) + "/table"
    optimize_table(_corpus(spark, 1000), root, DIMS,
                   bloom_cols=["event_id"], target_rows_per_file=500)
    optimize_table(_corpus(spark, 3000), root, DIMS,
                   bloom_cols=["event_id"], target_rows_per_file=500)
    assert read_optimized_data(spark, root).count() == 3000
    assert read_optimized_data(spark, root, version=1).count() == 1000
    pinned = read_optimized(
        spark, root, in_predicates=[("event_id", [2500])], version=1
    )
    assert pinned.count() == 0  # 2500 not in v=1
    assert read_optimized(
        spark, root, in_predicates=[("event_id", [2500])]
    ).count() == 1
    with pytest.raises(ValueError, match="no committed"):
        read_optimized_data(spark, root, version=99)


def test_randomized_combined_pruning_always_exact(spark, tmp_path_factory):
    """Seeded sweep over the composed reader: random predicate boxes
    x random IN-lists (present, absent, and mixed keys; degenerate
    and out-of-domain ranges) — every combined pruned read must equal
    the full scan + both filters (soundness cannot depend on the
    probe being 'reasonable')."""
    import random

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        build_bloom_manifest,
        build_zone_manifest,
        combined_pruned_read,
    )

    path = str(tmp_path_factory.mktemp("rcb")) + "/data"
    df = spark.range(8000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 640).cast("double").alias("v"),
    )
    df.repartitionByRange(8, "v").sortWithinPartitions("v").write.mode(
        "overwrite"
    ).parquet(path)
    full = spark.read.parquet(path)
    zmf = build_zone_manifest(full, ["v"]).localCheckpoint()
    bmf = build_bloom_manifest(full, ["event_id"]).localCheckpoint()
    rng = random.Random(19)
    for i in range(8):
        lo = rng.uniform(-100, 700)
        hi = lo + rng.uniform(-20, 400)
        keys = [rng.randrange(-1000, 10000) for _ in range(rng.randrange(1, 6))]
        got = combined_pruned_read(
            spark, path, zone_manifest=zmf, bloom_manifest=bmf,
            range_predicates=[("v", lo, hi)],
            in_predicates=[("event_id", keys)],
        )
        want = full.filter((F.col("v") >= lo) & (F.col("v") <= hi)).filter(
            F.col("event_id").isin(*keys)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), (i, lo, hi, keys)


def test_describe_table(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
        describe_table,
    )

    root = str(tmp_path_factory.mktemp("opt7")) + "/table"
    optimize_table(_corpus(spark, 1200), root, DIMS,
                   bloom_cols=["event_id"], target_rows_per_file=400)
    d = describe_table(spark, root)
    assert d["latest"] == 1
    v1 = d["versions"][1]
    assert v1["rows"] == 1200 and v1["files"] == 3
    assert v1["zone_cols"] == ["u", "v"]
    assert v1["bloom_cols"] == ["event_id"]
    assert v1["bloom_geometry"]["n_bits"] >= 4096


def test_concurrent_claims_never_share_a_version(spark, tmp_path_factory):
    """Optimistic allocation: a pre-existing claim (another writer
    in flight) forces the next optimize past that number — two
    writers can never interleave inside one version directory — and
    a slow writer committing an older number must not yank the
    pointer backwards (forward-only flip)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        fsutil,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        read_version_pointer,
    )

    root = str(tmp_path_factory.mktemp("opt8")) + "/table"
    optimize_table(_corpus(spark, 500), root, DIMS,
                   target_rows_per_file=250)
    # simulate a concurrent writer holding v=2
    assert fsutil.create_exclusive(spark, f"{root}/__claim_v=2")
    n = optimize_table(_corpus(spark, 600), root, DIMS,
                       target_rows_per_file=300)
    assert n == 3
    assert read_version_pointer(root, spark) == 3

    # the slow writer finishes v=2 later: committed and pinnable, but
    # the pointer stays at 3
    import os

    os.makedirs(f"{root}/v=2", exist_ok=True)
    fsutil.write_text_atomic(spark, f"{root}/v=2/_SUCCESS", "")
    assert read_version_pointer(root, spark) == 3


def test_burned_claims_swept_on_prune(spark, tmp_path_factory):
    """Round-10 ADVICE fix: claims burned by crashed writers (number
    skipped, no committed v-dir) are swept once they fall below the
    oldest retained version — the table root's listing stays bounded
    across optimize cycles."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
        optimize_table,
    )

    base = str(tmp_path_factory.mktemp("claimsweep"))
    root = f"{base}/tbl"
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    assert optimize_table(df, root, [("v", 0.0, 10.0)], keep=2) == 1
    # a crashed writer burned v=2: claim exists, no committed dir
    assert fsutil.create_exclusive(spark, f"{root}/__claim_v=2")
    assert optimize_table(df, root, [("v", 0.0, 10.0)], keep=2) == 3
    # keep=2 at v=4 prunes v=1 and v=3; the burned v=2 claim is below
    # the oldest retained version -> swept
    assert optimize_table(df, root, [("v", 0.0, 10.0)], keep=2) == 4
    names = fsutil.list_files(spark, root, "__claim_v=*")
    burned = [n for n in names if n == "__claim_v=2"]
    assert not burned, f"burned claim not swept: {names}"
