"""Tests: zone-map manifest + manifest-pruned reads (sources.skipping)
— semantic equality with a full scan, real file skipping on a
Z-ordered layout, incremental maintenance, and the fail-closed
staleness guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.layout import (
    zorder_layout,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
    build_zone_manifest,
    list_data_files,
    pruned_read,
    update_zone_manifest,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def zgrid(spark, tmp_path_factory):
    """A 64×64 (x, y) grid written Z-ordered into 16 files, plus its
    manifest."""
    tmp_dir = str(tmp_path_factory.mktemp("zones"))
    path = f"{tmp_dir}/zones_grid"
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).cast("double").alias("x"),
            (F.col("id") / 64).cast("long").cast("double").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    out = zorder_layout(grid, [("x", 0, 64), ("y", 0, 64)], bits=6,
                        num_partitions=16)
    out.write.mode("overwrite").parquet(path)
    mf = build_zone_manifest(
        spark.read.parquet(path), ["x", "y"]
    ).localCheckpoint()
    return path, mf


def test_pruned_read_equals_full_scan_filter(spark, zgrid):
    path, mf = zgrid
    preds = [("x", 10.0, 20.0), ("y", 30.0, 40.0)]
    stats: dict = {}
    got = pruned_read(spark, path, mf, preds, stats=stats)
    want = (
        spark.read.parquet(path)
        .filter("x >= 10.0 AND x <= 20.0 AND y >= 30.0 AND y <= 40.0")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # Z-ordered layout: a small box in BOTH dims must skip most files
    assert stats["files_total"] == 16
    assert 0 < stats["files_read"] < stats["files_total"] / 2, stats


def test_pruned_read_open_intervals_and_empty(spark, zgrid):
    path, mf = zgrid
    # one-sided interval
    got = pruned_read(spark, path, mf, [("x", 60.0, None)])
    want = spark.read.parquet(path).filter("x >= 60.0")
    assert got.count() == want.count() > 0
    # disjoint predicate: zero files kept, empty result, schema intact
    stats: dict = {}
    empty = pruned_read(spark, path, mf, [("x", 1000.0, None)], stats=stats)
    assert stats["files_read"] == 0
    assert empty.count() == 0
    assert empty.columns == spark.read.parquet(path).columns


def test_all_null_zone_skipped_soundly(spark, tmp_dir):
    """A file whose indexed column is entirely NULL has NULL min/max —
    it must be SKIPPED (range predicates are NULL-rejecting) and the
    result must still equal the full-scan filter."""
    path = f"{tmp_dir}/zones_nulls"
    a = spark.range(100).select(
        F.col("id").cast("double").alias("v"), F.col("id").alias("k")
    )
    b = spark.range(100, 200).select(
        F.lit(None).cast("double").alias("v"), F.col("id").alias("k")
    )
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    mf = build_zone_manifest(spark.read.parquet(path), ["v"])
    stats: dict = {}
    got = pruned_read(spark, path, mf, [("v", 10.0, 20.0)], stats=stats)
    want = spark.read.parquet(path).filter("v >= 10.0 AND v <= 20.0")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert stats["files_read"] < stats["files_total"]
    # presence predicate (lo=hi=None): all-null zone also skipped
    stats2: dict = {}
    present = pruned_read(spark, path, mf, [("v", None, None)],
                          stats=stats2)
    assert present.count() == 100
    assert stats2["files_read"] < stats2["files_total"]


def test_update_zone_manifest_incremental_equals_rebuild(spark, tmp_dir):
    path = f"{tmp_dir}/zones_inc"
    spark.range(100).select(
        F.col("id").cast("double").alias("v")
    ).coalesce(2).write.mode("overwrite").parquet(path)
    mf0 = build_zone_manifest(spark.read.parquet(path), ["v"])
    # append a batch -> incremental update reads only the new files
    spark.range(500, 600).select(
        F.col("id").cast("double").alias("v")
    ).coalesce(1).write.mode("append").parquet(path)
    mf1 = update_zone_manifest(spark, path, mf0, ["v"])
    rebuilt = build_zone_manifest(spark.read.parquet(path), ["v"])
    assert sorted(map(tuple, mf1.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # and the updated manifest serves pruned reads over the new data
    got = pruned_read(spark, path, mf1, [("v", 550.0, 560.0)])
    assert got.count() == 11


def test_stale_manifest_fails_closed(spark, tmp_dir):
    path = f"{tmp_dir}/zones_stale"
    spark.range(100).select(
        F.col("id").cast("double").alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    mf = build_zone_manifest(
        spark.read.parquet(path), ["v"]
    ).localCheckpoint()
    spark.range(100, 200).select(
        F.col("id").cast("double").alias("v")
    ).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale"):
        pruned_read(spark, path, mf, [("v", 0.0, 10.0)])
    # verify=False documents the escape hatch (results then reflect
    # only the indexed files)
    got = pruned_read(spark, path, mf, [("v", 0.0, 500.0)], verify=False)
    assert got.count() == 100


def test_manifest_build_one_row_per_file(spark, zgrid):
    path, mf = zgrid
    files = list_data_files(spark, path)
    assert sorted(r["file"] for r in mf.select("file").collect()) == files
    assert mf.count() == 16
    total = mf.agg(F.sum("n_rows")).head()[0]
    assert total == 64 * 64


def test_zone_pruning_on_real_events(spark, tmp_dir):
    """End-to-end on the testdata events table: Z-order by (value,
    user_id), prune on a conjunction of both dims, equal the plain
    filtered scan."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
        load,
    )

    (ev,) = load(spark, SF_DIR, "events")
    max_uid = ev.agg(F.max("user_id")).head()[0]
    path = f"{tmp_dir}/zones_events"
    zorder_layout(
        ev,
        [("value", 0, 500), ("user_id", 0, float(max_uid) + 1)],
        bits=8,
        num_partitions=8,
    ).write.mode("overwrite").parquet(path)
    mf = build_zone_manifest(spark.read.parquet(path), ["value", "user_id"])
    preds = [("value", 100.0, 200.0), ("user_id", 1, max_uid // 4)]
    stats: dict = {}
    got = pruned_read(spark, path, mf, preds, stats=stats)
    want = spark.read.parquet(path).filter(
        f"value >= 100.0 AND value <= 200.0 AND user_id >= 1 "
        f"AND user_id <= {max_uid // 4}"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert stats["files_read"] < stats["files_total"], stats


def test_bloom_no_false_negatives_and_prunes(spark, tmp_path_factory):
    """Every present key must be found (no false negatives — the
    correctness half of the contract); an absent key prunes to zero
    files; string keys work; stale manifests fail closed."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
    )

    path = str(tmp_path_factory.mktemp("bloom")) + "/data"
    spark.range(10000).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("u"), (F.col("id") % 97).cast("string")).alias("tag"),
    ).repartition(16).write.mode("overwrite").parquet(path)
    mf = build_bloom_manifest(
        spark.read.parquet(path), ["event_id", "tag"]
    ).localCheckpoint()

    # 200-key presence sweep: zero false negatives
    keys = [(i * 53) % 10000 for i in range(200)]
    got = bloom_pruned_read(spark, path, mf, "event_id", keys)
    assert got.count() == len(set(keys))
    # result equals the plain filtered scan
    want = spark.read.parquet(path).filter(
        F.col("event_id").isin(*keys)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # absent key: zero files planned, empty result, schema intact
    stats: dict = {}
    empty = bloom_pruned_read(
        spark, path, mf, "event_id", [123456789], stats=stats
    )
    assert stats["files_read"] == 0 and empty.count() == 0
    assert empty.columns == ["event_id", "tag"]

    # string column lookups
    s = bloom_pruned_read(spark, path, mf, "tag", ["u7", "u42"])
    assert s.count() == spark.read.parquet(path).filter(
        "tag IN ('u7','u42')"
    ).count()

    # small IN-list actually prunes (fp rate < 1 at this fill)
    st2: dict = {}
    bloom_pruned_read(spark, path, mf, "event_id", [42], stats=st2)
    assert 0 < st2["files_read"] < st2["files_total"], st2

    # stale manifest fails closed
    spark.range(10000, 10100).select(
        F.col("id").alias("event_id"), F.lit("new").alias("tag")
    ).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale"):
        bloom_pruned_read(spark, path, mf, "event_id", [42])

    # float keys rejected loudly (string-form hash domain)
    with pytest.raises(TypeError, match="int or str"):
        bloom_pruned_read(
            spark, path, mf, "event_id", [1.5], verify=False
        )


def test_compaction_then_manifest_reconcile(spark, tmp_path_factory):
    """The small-files → compaction lifecycle: after compact_output
    rewrites the directory (every old file gone, new files appear),
    update_zone_manifest reconciles to exactly the fresh listing —
    dropped rows for vanished files, stats computed for the new ones
    — and pruned reads keep serving the same answers."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        compact_output,
    )

    path = str(tmp_path_factory.mktemp("compact")) + "/data"
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    df.repartition(32).write.mode("overwrite").parquet(path)
    mf0 = build_zone_manifest(
        spark.read.parquet(path), ["v"]
    ).localCheckpoint()
    assert mf0.count() == 32
    want = sorted(
        map(tuple, pruned_read(spark, path, mf0, [("v", 100.0, 200.0)]).collect())
    )

    # materialize before rewriting the path being read (an in-place
    # compaction must stage its input; production would atomic-publish)
    staged = spark.read.parquet(path).localCheckpoint()
    compact_output(staged, path, target_rows_per_file=500)
    # old manifest is now stale for the rewritten dir — fails closed
    with pytest.raises(ValueError, match="stale"):
        pruned_read(spark, path, mf0, [("v", 100.0, 200.0)])
    mf1 = update_zone_manifest(spark, path, mf0, ["v"]).localCheckpoint()
    assert mf1.count() == 2  # 1000 rows / 500-per-file target
    got = sorted(
        map(tuple, pruned_read(spark, path, mf1, [("v", 100.0, 200.0)]).collect())
    )
    assert got == want
    rebuilt = build_zone_manifest(spark.read.parquet(path), ["v"])
    assert sorted(map(tuple, mf1.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_stream_sink_maintains_manifest(spark, tmp_path_factory):
    """Streaming ingest keeps the zone manifest reconciled per batch:
    after the stream drains, the manifest equals a from-scratch
    rebuild over the landed files, pruned reads pass the fail-closed
    staleness check and match the full-scan filter, and a REPLAY
    (fresh checkpoint over the same source) converges to the same
    state — batch partitions rewrite idempotently."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        stream_sink_with_manifest,
    )

    base = str(tmp_path_factory.mktemp("stream_zones"))
    src = f"{base}/src"
    data = f"{base}/data"
    mf_path = f"{base}/manifest"
    for i in range(3):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").cast("double").alias("v")
        ).coalesce(1).write.mode("append").parquet(src)

    q = stream_sink_with_manifest(
        spark, src, "v double", data, mf_path, ["v"],
        f"{base}/ckpt",
    )
    q.awaitTermination(120)
    mf = spark.read.parquet(mf_path)
    rebuilt = build_zone_manifest(spark.read.parquet(data), ["v"])
    assert sorted(map(tuple, mf.select(rebuilt.columns).collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    got = pruned_read(spark, data, mf, [("v", 150.0, 250.0)])
    want = spark.read.parquet(data).filter("v >= 150.0 AND v <= 250.0")
    assert sorted(r["v"] for r in got.select("v").collect()) == sorted(
        r["v"] for r in want.select("v").collect()
    )
    assert got.count() == 101

    # replay with a fresh checkpoint: batch partitions rewrite, the
    # manifest reconciles (old file rows dropped, new added) — same
    # served state
    q2 = stream_sink_with_manifest(
        spark, src, "v double", data, mf_path, ["v"],
        f"{base}/ckpt2",
    )
    q2.awaitTermination(120)
    mf2 = spark.read.parquet(mf_path)
    again = pruned_read(spark, data, mf2, [("v", 150.0, 250.0)])
    assert again.count() == 101
    rebuilt2 = build_zone_manifest(spark.read.parquet(data), ["v"])
    assert sorted(
        map(tuple, mf2.select(rebuilt2.columns).collect())
    ) == sorted(map(tuple, rebuilt2.collect()))


def test_zone_pruning_on_string_column(spark, tmp_path_factory):
    """Zone min/max order is the column's natural order for strings
    too: on a layout sorted by a low-cardinality string column, an
    equality interval (v, v) prunes to the files holding that value."""
    path = str(tmp_path_factory.mktemp("zstr")) + "/data"
    df = spark.range(4000).select(
        F.element_at(
            F.array(*[F.lit(x) for x in ["click", "purchase", "signup", "view"]]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("etype"),
        F.col("id").alias("k"),
    )
    df.repartitionByRange(8, "etype", "k").sortWithinPartitions(
        "etype", "k"
    ).write.mode("overwrite").parquet(path)
    mf = build_zone_manifest(spark.read.parquet(path), ["etype"])
    stats: dict = {}
    got = pruned_read(spark, path, mf, [("etype", "purchase", "purchase")],
                      stats=stats)
    want = spark.read.parquet(path).filter("etype = 'purchase'")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 1000
    assert stats["files_read"] < stats["files_total"], stats


def test_update_bloom_manifest_incremental_equals_rebuild(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
        update_bloom_manifest,
    )

    path = str(tmp_path_factory.mktemp("bloom_inc")) + "/data"
    spark.range(1000).select(
        F.col("id").alias("event_id")
    ).coalesce(2).write.mode("overwrite").parquet(path)
    mf0 = build_bloom_manifest(
        spark.read.parquet(path), ["event_id"]
    ).localCheckpoint()
    spark.range(5000, 5100).select(
        F.col("id").alias("event_id")
    ).coalesce(1).write.mode("append").parquet(path)
    mf1 = update_bloom_manifest(spark, path, mf0, ["event_id"])
    rebuilt = build_bloom_manifest(spark.read.parquet(path), ["event_id"])
    assert sorted(map(tuple, mf1.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # serves lookups over the new batch; still zero false negatives
    got = bloom_pruned_read(spark, path, mf1, "event_id", [5042, 7])
    assert got.count() == 2

    # mixed hash geometry is rejected loudly
    with pytest.raises(ValueError, match="hash geometry"):
        update_bloom_manifest(spark, path, mf1, ["event_id"], n_bits=2048)


def test_zone_pruning_randomized_boxes_always_exact(spark, zgrid):
    """Seeded sweep: 12 random predicate boxes (including degenerate,
    inverted-to-empty and out-of-domain ones) — pruned_read must equal
    the full-scan filter on every one (soundness cannot depend on the
    box being 'reasonable')."""
    import random

    path, mf = zgrid
    rng = random.Random(8)
    full = spark.read.parquet(path)
    for i in range(12):
        xlo = rng.uniform(-10, 70)
        xhi = xlo + rng.uniform(-5, 30)
        ylo = rng.uniform(-10, 70)
        yhi = ylo + rng.uniform(-5, 30)
        got = pruned_read(
            spark, path, mf, [("x", xlo, xhi), ("y", ylo, yhi)]
        )
        want = full.filter(
            (F.col("x") >= xlo) & (F.col("x") <= xhi)
            & (F.col("y") >= ylo) & (F.col("y") <= yhi)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), (i, xlo, xhi, ylo, yhi)


def test_pruned_read_keeps_partition_columns(spark, tmp_path_factory):
    """On a hive-partitioned root (the ``batch_id=`` layout
    stream_sink_with_manifest writes), a pruned read must return the
    SAME schema as the full scan — partition columns survive via
    basePath — and the zero-files branch must agree too."""
    path = str(tmp_path_factory.mktemp("zpart")) + "/data"
    for b in range(3):
        spark.range(b * 100, (b + 1) * 100).select(
            F.col("id").cast("double").alias("v")
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/batch_id={b}"
        )
    full = spark.read.parquet(path)
    assert "batch_id" in full.columns
    mf = build_zone_manifest(full, ["v"]).localCheckpoint()
    got = pruned_read(spark, path, mf, [("v", 120.0, 180.0)])
    assert got.columns == full.columns  # batch_id present, same order
    want = full.filter("v >= 120.0 AND v <= 180.0")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert {r["batch_id"] for r in got.collect()} == {1}
    # zero-files branch: identical schema
    empty = pruned_read(spark, path, mf, [("v", 1e6, None)])
    assert empty.columns == full.columns and empty.count() == 0


def test_combined_zone_bloom_read_multiplicative(spark, tmp_path_factory):
    """The composed reader stacks BOTH indexes: files_read under
    zone∧bloom ≤ min(zone-only, bloom-only), with value equality to
    the full scan + both filters (the date-range + IN-list shape)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
        combined_pruned_read,
    )

    path = str(tmp_path_factory.mktemp("combo")) + "/data"
    # range-clustered v (zone-friendly), unclustered id (bloom-friendly)
    df = spark.range(20000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    df.repartitionByRange(16, "v").sortWithinPartitions("v").write.mode(
        "overwrite"
    ).parquet(path)
    full = spark.read.parquet(path)
    zmf = build_zone_manifest(full, ["v"]).localCheckpoint()
    bmf = build_bloom_manifest(full, ["event_id"]).localCheckpoint()

    keys = [7, 4242, 13013, 19999]
    preds = [("v", 100.0, 300.0)]
    sz: dict = {}
    pruned_read(spark, path, zmf, preds, stats=sz)
    sb: dict = {}
    bloom_pruned_read(spark, path, bmf, "event_id", keys, stats=sb)
    sc: dict = {}
    got = combined_pruned_read(
        spark, path, zone_manifest=zmf, bloom_manifest=bmf,
        range_predicates=preds, in_predicates=[("event_id", keys)],
        stats=sc,
    )
    want = full.filter("v >= 100.0 AND v <= 300.0").filter(
        F.col("event_id").isin(*keys)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert sc["files_read"] <= min(sz["files_read"], sb["files_read"])
    assert sc["files_zone_kept"] == sz["files_read"]
    assert sc["files_bloom_kept"] == sb["files_read"]
    # and the intersection genuinely prunes below total
    assert sc["files_read"] < sc["files_total"]


def test_bloom_type_guards(spark, tmp_path_factory):
    """Hash-domain contract enforced on BOTH sides: building over a
    non-integral/non-string column raises; probing an indexed column
    with the wrong literal kind raises (silent false negatives are
    the alternative)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
    )

    path = str(tmp_path_factory.mktemp("btype")) + "/data"
    spark.range(100).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("d"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
    ).coalesce(1).write.mode("overwrite").parquet(path)
    full = spark.read.parquet(path)
    with pytest.raises(TypeError, match="bloom-indexable"):
        build_bloom_manifest(full, ["d"])
    mf = build_bloom_manifest(full, ["k", "s"]).localCheckpoint()
    # wrong literal kind against each column type
    with pytest.raises(TypeError, match="hash domain|CAST AS STRING"):
        bloom_pruned_read(spark, path, mf, "k", ["7"])
    with pytest.raises(TypeError, match="hash domain|CAST AS STRING"):
        bloom_pruned_read(spark, path, mf, "s", [7])
    # right kinds still work
    assert bloom_pruned_read(spark, path, mf, "k", [7]).count() == 1
    assert bloom_pruned_read(spark, path, mf, "s", ["s7"]).count() == 1


def test_bloom_string_keys_with_quotes_and_backslashes(spark, tmp_path_factory):
    """Adversarial string keys (quotes, backslashes) must neither
    break the probe expression nor alter it — escaped literal, exact
    lookups."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
    )

    path = str(tmp_path_factory.mktemp("besc")) + "/data"
    weird = ["o'brien", 'say "hi"', "back\\slash", "plain"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weird)], "k bigint, tag string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    mf = build_bloom_manifest(
        spark.read.parquet(path), ["tag"]
    ).localCheckpoint()
    for w in weird:
        got = bloom_pruned_read(spark, path, mf, "tag", [w])
        assert [r["tag"] for r in got.collect()] == [w], w


def test_stream_sink_maintains_bloom_manifest(spark, tmp_path_factory):
    """Streaming ingest keeps the BLOOM manifest reconciled per batch
    with the zone discipline: after the drain, bloom manifest ==
    from-scratch rebuild, point lookups pass fail-closed staleness
    and match the full scan, composed zone∧bloom reads work over the
    partitioned layout, and a REPLAY converges."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
        combined_pruned_read,
        stream_sink_with_manifest,
    )

    base = str(tmp_path_factory.mktemp("stream_bloom"))
    src = f"{base}/src"
    data = f"{base}/data"
    mf_path = f"{base}/manifest"
    bmf_path = f"{base}/bloom"
    for i in range(3):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("event_id"),
            F.col("id").cast("double").alias("v"),
        ).coalesce(1).write.mode("append").parquet(src)

    q = stream_sink_with_manifest(
        spark, src, "event_id bigint, v double", data, mf_path, ["v"],
        f"{base}/ckpt",
        bloom_manifest_path=bmf_path, bloom_cols=["event_id"],
    )
    q.awaitTermination(120)
    bmf = spark.read.parquet(bmf_path)
    rebuilt = build_bloom_manifest(spark.read.parquet(data), ["event_id"])
    assert sorted(
        map(tuple, bmf.select(rebuilt.columns).collect())
    ) == sorted(map(tuple, rebuilt.collect()))
    got = bloom_pruned_read(spark, data, bmf, "event_id", [42, 242])
    assert sorted(r["event_id"] for r in got.collect()) == [42, 242]
    # composed read over the streamed (partitioned) layout
    zmf = spark.read.parquet(mf_path)
    combo = combined_pruned_read(
        spark, data, zone_manifest=zmf, bloom_manifest=bmf,
        range_predicates=[("v", 200.0, 299.0)],
        in_predicates=[("event_id", [242, 7])],
    )
    assert [r["event_id"] for r in combo.collect()] == [242]
    assert "batch_id" in combo.columns

    # replay with a fresh checkpoint converges to the same state
    q2 = stream_sink_with_manifest(
        spark, src, "event_id bigint, v double", data, mf_path, ["v"],
        f"{base}/ckpt2",
        bloom_manifest_path=bmf_path, bloom_cols=["event_id"],
    )
    q2.awaitTermination(120)
    bmf2 = spark.read.parquet(bmf_path)
    rebuilt2 = build_bloom_manifest(spark.read.parquet(data), ["event_id"])
    assert sorted(
        map(tuple, bmf2.select(rebuilt2.columns).collect())
    ) == sorted(map(tuple, rebuilt2.collect()))
    assert bloom_pruned_read(
        spark, data, bmf2, "event_id", [42, 242]
    ).count() == 2


def test_zero_row_files_stay_indexed_and_pruned(spark, tmp_path_factory):
    """A filtered-to-empty batch writes a ZERO-ROW parquet file; a
    groupBy(input_file_name) can never see it, so the manifests must
    synthesize explicit rows (n_rows=0 / all-zero bitsets) or every
    later read fails the fail-closed listing check. The empty file
    must also always be PRUNED (it matches nothing) — both manifests,
    plus incremental updates covering such a file."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
        update_zone_manifest,
    )

    path = str(tmp_path_factory.mktemp("zempty")) + "/data"
    spark.range(100).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("v"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/batch_id=0")
    # an empty slice lands as a zero-row file
    spark.range(0).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("v"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/batch_id=1")

    full = spark.read.parquet(path)
    zmf = build_zone_manifest(full, ["v"]).localCheckpoint()
    assert zmf.count() == 2  # both files covered
    stats: dict = {}
    got = pruned_read(spark, path, zmf, [("v", 10.0, 20.0)], stats=stats)
    assert got.count() == 11
    assert stats["files_read"] == 1  # empty file pruned

    bmf = build_bloom_manifest(full, ["event_id"]).localCheckpoint()
    assert bmf.count() == 2
    sb: dict = {}
    gb = bloom_pruned_read(spark, path, bmf, "event_id", [42], stats=sb)
    assert gb.count() == 1 and sb["files_read"] == 1

    # incremental update over a NEW empty file
    spark.range(0).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("v"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/batch_id=2")
    zmf2 = update_zone_manifest(spark, path, zmf, ["v"])
    assert zmf2.count() == 3
    assert pruned_read(spark, path, zmf2, [("v", 10.0, 20.0)]).count() == 11


def test_all_null_bloom_column_file_stays_indexed(spark, tmp_path_factory):
    """A file whose bloom-indexed column is entirely NULL sets no
    bits, so it too never formed a group row — it must get an
    all-zero bitset (always pruned; equality probes are
    NULL-rejecting, so that is exact)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
    )

    path = str(tmp_path_factory.mktemp("bnull")) + "/data"
    spark.range(50).select(
        F.col("id").alias("k"), F.lit("x").alias("tag")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    spark.range(50).select(
        F.lit(None).cast("bigint").alias("k"), F.lit("y").alias("tag")
    ).coalesce(1).write.mode("append").parquet(path)
    mf = build_bloom_manifest(spark.read.parquet(path), ["k"])
    assert mf.count() == 2
    st: dict = {}
    got = bloom_pruned_read(spark, path, mf, "k", [7], stats=st)
    assert got.count() == 1 and st["files_read"] == 1


def test_pre_col_type_bloom_manifest_migrates(spark, tmp_path_factory):
    """Round-10 ADVICE fix: a bloom manifest persisted before the
    col_type column existed (pre-round-9 cache) migrates in
    update_bloom_manifest — types re-derived from the data schema —
    instead of failing every probe with a missing-column error; the
    probe path itself rejects a legacy manifest with an actionable
    message."""
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        bloom_pruned_read,
        build_bloom_manifest,
        update_bloom_manifest,
    )

    base = str(tmp_path_factory.mktemp("bloommig"))
    spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    ).repartition(4).write.parquet(f"{base}/data")
    mf = build_bloom_manifest(spark.read.parquet(f"{base}/data"), ["k"])
    legacy = mf.drop("col_type")  # what a pre-round-9 build persisted
    legacy.coalesce(1).write.parquet(f"{base}/legacy_mf")
    legacy_mf = spark.read.parquet(f"{base}/legacy_mf")

    with pytest.raises(ValueError, match="predates the col_type"):
        bloom_pruned_read(
            spark, f"{base}/data", legacy_mf, "k", [3]
        ).count()

    migrated = update_bloom_manifest(
        spark, f"{base}/data", legacy_mf, ["k"]
    )
    assert "col_type" in migrated.columns
    got = bloom_pruned_read(spark, f"{base}/data", migrated, "k", [3, 999])
    assert [r["k"] for r in got.collect()] == [3]


def test_many_file_manifest_driver_collects_are_bounded(
    spark, tmp_path_factory, monkeypatch
):
    """100 TB posture (round 11): with a MANY-file layout and a
    selective predicate, the driver must only ever collect (a) the
    KEPT file paths (proportional to files actually read), (b)
    aggregated counts, and (c) bounded example rows — never a
    per-file row for every known file. Instrumented by wrapping
    DataFrame.collect during a combined zone+bloom pruned read over
    a 64-file layout where pruning keeps a handful."""
    # patch the CONCRETE DataFrame class (Spark 4's classic session
    # subclasses the abstract pyspark.sql.DataFrame, whose collect
    # the subclass overrides)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-Spark-4 layout
        from pyspark.sql import DataFrame

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        build_bloom_manifest,
        build_zone_manifest,
        combined_pruned_read,
    )

    root = str(tmp_path_factory.mktemp("many")) + "/data"
    n_files = 64
    df = spark.range(n_files * 50).select(
        F.col("id").alias("k"),
        (F.col("id") % (n_files * 50)).cast("double").alias("v"),
    )
    # one file per id-range bucket -> v ranges are disjoint per file
    df.repartitionByRange(n_files, "k").sortWithinPartitions(
        "k"
    ).write.parquet(root)
    scan = spark.read.parquet(root)
    zmf = build_zone_manifest(scan, ["v"]).localCheckpoint()
    bmf = build_bloom_manifest(scan, ["k"]).localCheckpoint()

    sizes: list[int] = []
    orig = DataFrame.collect

    def tracking(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", tracking)
    stats: dict = {}
    out = combined_pruned_read(
        spark, root,
        zone_manifest=zmf, bloom_manifest=bmf,
        range_predicates=[("v", 0.0, 120.0)],
        in_predicates=[("k", [3, 70, 110])],
        stats=stats,
    )
    got = sorted(r["k"] for r in orig(out))
    monkeypatch.undo()
    assert got == [3, 70, 110]
    assert stats["files_total"] == n_files
    # pruning really happened, and no collect was known-files-sized:
    # every driver materialization is at most kept-paths + slack
    assert stats["files_read"] < n_files / 4
    bound = stats["files_read"] + 4
    assert sizes and max(sizes) <= bound, (sizes, bound)


def test_xxh64_py_pins_spark_xxhash64(spark):
    """ADVICE r11: the driver-side listing signature relies on
    ``xxh64_py`` being bit-exact with ``F.xxhash64`` — if either side
    drifted, every verified read would silently fall back to the
    exact-diff jobs (the zero-job happy path never firing) with no
    signal. Pin the parity on the edge shapes of the algorithm:
    empty, <8B tail, 4-7B tail, 8-31B, >=32B multi-stripe, and a
    realistic file URI."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import xxh64_py

    samples = [
        "",
        "a",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "0123456789abcdef0123456789abcd",   # 30B: <32 tail loop
        "0123456789abcdef0123456789abcdef",  # exactly 32B
        "x" * 33,
        "x" * 64 + "tail",
        "file:///tmp/tbl/part-00001-9f2c.c000.snappy.parquet",
        "naïve-ünïcode-路径/part-0.parquet",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert xxh64_py(s.encode("utf-8")) == got[s], s
