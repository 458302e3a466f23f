"""Tests: the unified Table facade (sources.table) — one handle over
versioned snapshots + zone/bloom pruning + the op-tagged change log,
with the watermark contract (folded batches invisible through the new
version, crash-safe without vacuum) and the filter-under-CDC law
applied internally (read(preds) ≡ read().filter(preds))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
    Table,
    read_table,
)


def _mk(spark, root, n=400, zone=True, bloom=True):
    t = Table.create(
        spark, root, "k",
        zone_cols=["v"] if zone else None,
        bloom_cols=["k"] if bloom else None,
    )
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("tag"),
    )
    t.append(df.filter("k < 200").repartition(4))
    t.append(df.filter("k >= 200").repartition(4))
    return t, df


def _rows(df):
    return sorted(map(tuple, df.select("k", "v", "tag").collect()))


def test_append_read_roundtrip_and_config(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    assert _rows(t.read()) == _rows(df)
    # reconnect by root alone — config round-trips
    t2 = Table(spark, root)
    assert t2.key_col == "k" and t2.zone_cols == ["v"]
    assert _rows(read_table(spark, root)) == _rows(df)
    # conflicting re-create refuses
    with pytest.raises(ValueError, match="different config"):
        Table.create(spark, root, "other_key")


def test_upsert_delete_fold_and_filter_law(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    # delete every k % 11, upsert k % 13 with v pushed OUT of [0, 50]
    t.delete([int(k) for k in range(0, 400, 11)])
    ups = df.filter("k % 13 = 0 AND k % 11 <> 0").select(
        "k", (F.col("v") + 1000.0).alias("v"), "tag"
    )
    t.upsert(ups)

    expect = {}
    for r in df.collect():
        expect[r["k"]] = (r["k"], r["v"], r["tag"])
    for k in range(0, 400, 11):
        expect.pop(k, None)
    for r in ups.collect():
        expect[r["k"]] = (r["k"], r["v"], r["tag"])
    assert _rows(t.read()) == sorted(expect.values())

    # the law: read(preds) == read().filter(preds), including upserted
    # rows whose new v crossed the range bound (they must NOT leak in)
    preds = dict(range_predicates=[("v", 0.0, 50.0)],
                 in_predicates=[("k", [3, 13, 22, 26, 399, 999])])
    got = _rows(t.read(**preds))
    want = _rows(
        t.read().filter("v >= 0 AND v <= 50").filter(
            F.col("k").isin(3, 13, 22, 26, 399, 999)
        )
    )
    assert got == want
    # 13 and 26 were upserted out of range; 22 deleted (11*2)
    ks = [r[0] for r in got]
    assert 3 in ks and 13 not in ks and 22 not in ks and 26 not in ks


def test_uncovered_predicates_are_residual_only(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    # tag is not zone- or bloom-indexed: still filters correctly
    got = _rows(t.read(range_predicates=[("v", 10.0, 20.0)],
                       in_predicates=[("tag", ["s1"])]))
    want = _rows(df.filter("v >= 10 AND v <= 20 AND tag = 's1'"))
    assert got == want


def test_optimize_watermarks_vacuum_and_time_travel(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    t.delete(list(range(0, 400, 7)))
    before = _rows(t.read())

    v1 = t.optimize(target_rows_per_file=200)
    assert v1 == 1
    # identical content through the materialized version
    assert _rows(t.read()) == before
    assert _rows(t.snapshot()) == before
    # folded live batches physically gone, change batches retained
    d = t.describe()
    assert d["live_batches"] == []
    assert d["change_batches"] == [1]
    assert d["watermarks"] == {"live": 2, "changes": 1}

    # new activity on top of the version
    extra = spark.createDataFrame(
        [(1000, 5.0, "s0"), (1001, 999.0, "s1")], "k bigint, v double, tag string"
    )
    t.append(extra)
    t.delete([1, 2])
    now = dict((k, (k, v, g)) for k, v, g in before)
    now[1000] = (1000, 5.0, "s0")
    now[1001] = (1001, 999.0, "s1")
    now.pop(1, None)
    now.pop(2, None)
    assert _rows(t.read()) == sorted(now.values())

    # time travel: v1 still serves the pre-append state
    assert _rows(t.snapshot(version=v1)) == before

    v2 = t.optimize(target_rows_per_file=200)
    assert v2 > v1
    assert _rows(t.read()) == sorted(now.values())
    assert _rows(t.snapshot(version=v1)) == before  # keep=3 retains it


def test_crash_between_commit_and_vacuum_never_double_counts(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    before = _rows(t.read())
    t.optimize(vacuum=False)  # crash before vacuum: batches linger
    assert Table(spark, root).describe()["live_batches"] == [1, 2]
    # watermark makes them invisible — no double counting
    assert _rows(t.read()) == before
    # delayed vacuum is a pure GC
    assert t.vacuum_live() == 2
    assert _rows(t.read()) == before


def test_pinned_replay_below_watermark_is_invisible(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k", zone_cols=["v"])
    df = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    t.append(df, batch_id=1)
    t.optimize()
    n_before = t.read().count()
    # a replayed period rewrites its pinned batch — already
    # materialized in v=1, so the rewrite must not double rows
    t.append(df, batch_id=1)
    assert t.read().count() == n_before
    with pytest.raises(ValueError, match="batch_id must be >= 1"):
        t.append(df, batch_id=0)


def test_changes_feed_nets_interleavings(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=40)
    t.delete([5, 6])                      # batch 1
    t.upsert(df.filter("k = 5").select(   # batch 2: delete -> re-upsert
        "k", F.lit(77.0).alias("v"), "tag"
    ))
    t.delete([7])                         # batch 3
    t.upsert(df.filter("k = 8").select(   # batch 4
        "k", F.lit(88.0).alias("v"), "tag"
    ))
    t.delete([8])                         # batch 5: upsert -> delete

    feed = {r["k"]: r for r in t.changes().collect()}
    assert feed[5]["op"] == "upsert" and feed[5]["v"] == 77.0
    assert feed[5]["batch"] == 2
    assert feed[6]["op"] == "delete"
    assert feed[7]["op"] == "delete"
    assert feed[8]["op"] == "delete" and feed[8]["batch"] == 5

    # cursor semantics: (from, to] — consuming after batch 2 sees only
    # the later ops
    feed2 = {r["k"]: r for r in t.changes(from_batch=2).collect()}
    assert set(feed2) == {7, 8}
    # pinned upper cursor
    feed3 = {r["k"]: r for r in t.changes(to_batch=2).collect()}
    assert feed3[5]["op"] == "upsert" and feed3[6]["op"] == "delete"
    assert 7 not in feed3
    # empty range over a real sidecar: empty frame, right schema
    empty = t.changes(from_batch=5)
    assert empty.count() == 0 and "op" in empty.columns


def test_read_as_of_batch_pin(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        read_with_changes,
    )

    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=30)
    t.delete([3])          # batch 1
    t.delete([4])          # batch 2
    t.upsert(df.filter("k = 3").select(
        "k", F.lit(33.0).alias("v"), "tag"
    ))                     # batch 3: 3 restored
    base = df
    asof1 = read_with_changes(
        base, f"{root}/changes", "k", as_of_batch=1
    )
    asof2 = read_with_changes(
        base, f"{root}/changes", "k", as_of_batch=2
    )
    full = read_with_changes(base, f"{root}/changes", "k")
    assert asof1.count() == 29 and asof1.filter("k = 4").count() == 1
    assert asof2.count() == 28
    assert full.count() == 29
    assert full.filter("k = 3").head()["v"] == 33.0
    # pinned reads are stable across later changes
    t.delete([9])
    assert asof2.count() == 28  # lazily re-planned: still batches <= 2


def test_pruning_actually_skips_files(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k", zone_cols=["v"], bloom_cols=["k"])
    df = spark.range(2000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    # cluster by v so zone boxes are tight, several files
    t.append(df.orderBy("v").coalesce(1), batch_id=1)
    t.append(
        df.select(F.col("k") + 2000, (F.col("v") + 2000.0).alias("v"))
        .withColumnRenamed("(k + 2000)", "k")
        .orderBy("v").coalesce(1),
        batch_id=2,
    )
    stats: dict = {}
    got = t.read(
        range_predicates=[("v", 0.0, 100.0)],
        in_predicates=[("k", [5])],
        stats=stats,
    )
    assert [r["k"] for r in got.collect()] == [5]
    ts = stats["tail"]
    assert ts["files_read"] < ts["files_total"]

    # after optimize, the bulk prunes through the version manifests
    t.optimize(target_rows_per_file=500)
    stats2: dict = {}
    got2 = t.read(
        range_predicates=[("v", 0.0, 100.0)],
        in_predicates=[("k", [5])],
        stats=stats2,
    )
    assert [r["k"] for r in got2.collect()] == [5]
    bs = stats2["bulk"]
    assert bs["files_read"] < bs["files_total"]


def test_stale_live_manifest_fails_closed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    # a writer lands a batch BEHIND the manifest's back
    df.limit(5).write.mode("overwrite").parquet(f"{root}/live/batch=9")
    with pytest.raises(ValueError, match="manifest is missing"):
        t.read(range_predicates=[("v", 0.0, 10.0)]).count()


def test_empty_table_raises(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k")
    with pytest.raises(ValueError, match="no data yet"):
        t.read().count()
    with pytest.raises(ValueError, match="no data yet"):
        t.optimize()


def test_vacuum_changes_guard(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=40)
    t.delete([1])
    with pytest.raises(ValueError, match="NOT materialized"):
        t.vacuum_changes(1)
    t.optimize()
    assert t.vacuum_changes(1) == 1
    # read unaffected (batch 1 was folded into the version)
    assert t.read().filter("k = 1").count() == 0


def test_partition_evolution_mixed_layout_history(
    spark, tmp_path_factory
):
    """Round-10 stretch: evolve() changes the Z-order/bloom columns
    between versions — committed versions keep serving their own
    manifests (time-travel pins prune exactly), the live tail
    switches immediately, and the next optimize writes the new
    layout; reads stay correct across the mixed-layout history."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k", zone_cols=["v"], bloom_cols=["k"])
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        (F.lit(2999) - F.col("id")).cast("double").alias("w"),
    )
    t.append(df.orderBy("v").coalesce(1), batch_id=1)
    v1 = t.optimize(target_rows_per_file=500)

    # evolve: Z-order/zone on w instead of v, bloom unchanged
    t.evolve(zone_cols=["w"])
    assert Table(spark, root).zone_cols == ["w"]

    # pointed version still carries the OLD layout: a v-range read
    # prunes through v1's own zones; a w-range read is residual-only
    stats: dict = {}
    got = t.read(range_predicates=[("v", 0.0, 400.0)], stats=stats)
    assert got.count() == 401
    assert stats["bulk"]["files_read"] < stats["bulk"]["files_total"]
    assert t.read(range_predicates=[("w", 0.0, 400.0)]).count() == 401

    # new tail appends index w immediately
    extra = spark.range(3000, 4000).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        (F.lit(5999) - F.col("id")).cast("double").alias("w"),
    )
    t.append(extra.repartitionByRange(4, "w"), batch_id=2)
    stats2: dict = {}
    got2 = t.read(range_predicates=[("w", 2000.0, 2100.0)], stats=stats2)
    # 101 rows live in the v1 bulk (k 899..999, residual-filtered) and
    # 101 in the new tail (k 3899..3999, zone-pruned via the new w
    # manifest)
    assert got2.count() == 202
    assert stats2["tail"]["files_read"] < stats2["tail"]["files_total"]

    # next optimize materializes the new layout; v1 pin unchanged
    v2 = t.optimize(target_rows_per_file=500)
    stats3: dict = {}
    got3 = t.read(range_predicates=[("w", 2000.0, 2100.0)], stats=stats3)
    assert got3.count() == 202
    assert stats3["bulk"]["files_read"] < stats3["bulk"]["files_total"]
    # time travel across the layout change: both pins serve exactly
    assert t.snapshot(version=v1).count() == 3000
    assert t.snapshot(version=v2).count() == 4000
    # and the old pin's manifests still prune its own layout
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
        read_optimized,
    )

    pstats: dict = {}
    pinned = read_optimized(
        spark, root, range_predicates=[("v", 0.0, 400.0)],
        version=v1, stats=pstats,
    )
    assert pinned.count() == 401
    assert pstats["files_read"] < pstats["files_total"]


def test_stream_append_and_stream_changes_into_facade(
    spark, tmp_path_factory
):
    """Round-10: Structured-Streaming ingest through the facade —
    data batches land pinned (replay rewrites, post-optimize replays
    fall under the watermark), manifests stay fresh per micro-batch,
    and a streamed change log folds into reads immediately."""
    base = str(tmp_path_factory.mktemp("tstream"))
    root = f"{base}/t"
    src = f"{base}/landing"
    chsrc = f"{base}/changes_landing"
    t = Table.create(spark, root, "k", zone_cols=["v"], bloom_cols=["k"])

    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    df.filter("k < 50").coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f1"
    )
    df.filter("k >= 50").coalesce(1).write.mode("overwrite").parquet(
        f"{src}/f2"
    )
    # landing zone is a flat dir of parquet files for the stream
    import glob
    import shutil

    flat = f"{base}/flat"
    import os

    os.makedirs(flat, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:04d}.parquet")

    q = t.stream_append(flat, "k bigint, v double", f"{base}/ckpt")
    q.awaitTermination()
    assert t.read().count() == 100
    assert len(Table(spark, root).describe()["live_batches"]) >= 1

    # manifests stayed fresh: a pruned read passes the fail-closed
    # coverage check and skips files
    stats: dict = {}
    got = t.read(
        range_predicates=[("v", 0.0, 10.0)],
        in_predicates=[("k", [5])],
        stats=stats,
    )
    assert [r["k"] for r in got.collect()] == [5]

    # replay from the same checkpoint: nothing new, nothing doubled
    q2 = t.stream_append(flat, "k bigint, v double", f"{base}/ckpt")
    q2.awaitTermination()
    assert t.read().count() == 100

    # streamed CDC: a delete + an upsert drain into the change log
    ch = spark.createDataFrame(
        [(7, None, "delete"), (200, 42.0, "upsert")],
        "k bigint, v double, op string",
    )
    ch.coalesce(1).write.mode("overwrite").parquet(f"{chsrc}/b1")
    flatc = f"{base}/flatc"
    os.makedirs(flatc, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{chsrc}/b*/part-*.parquet"))):
        shutil.copy(f, f"{flatc}/{i:04d}.parquet")
    qc = t.stream_changes(flatc, "k bigint, v double, op string",
                          f"{base}/ckpt_ch")
    qc.awaitTermination()
    out = t.read()
    assert out.count() == 100  # -1 delete +1 insert
    assert out.filter("k = 7").count() == 0
    assert out.filter("k = 200").head()["v"] == 42.0
    # the feed sees the streamed ops
    feed = {r["k"]: r["op"] for r in t.changes().collect()}
    assert feed == {7: "delete", 200: "upsert"}


def test_merge_three_clauses_vs_replay(spark, tmp_path_factory):
    """Conditional MERGE: delete-first, conditional update with
    partial update_set (unlisted columns keep TARGET values), and
    conditional insert — checked against a row-by-row Python replay
    of the same clause semantics."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root)
    # source: half overlapping keys (every 3rd), half new (400..449),
    # with its own v/tag proposals
    src = spark.range(0, 450).filter("id % 3 = 0 OR id >= 400").select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("double").alias("v"),
        F.lit("src").alias("tag"),
    )
    t.merge(
        src,
        matched_delete="t.v >= 90",          # target-side condition
        matched_update="s.v < t.v",          # cross-side condition
        update_set={"v": "s.v + t.v"},       # tag keeps TARGET value
        not_matched_insert="s.k % 2 = 0",    # source-side condition
    )

    cur = {r["k"]: (r["k"], r["v"], r["tag"]) for r in df.collect()}
    for r in src.collect():
        k, sv = r["k"], r["v"]
        if k in cur:
            _, tv, ttag = cur[k]
            if tv >= 90:
                del cur[k]
            elif sv < tv:
                cur[k] = (k, sv + tv, ttag)
        elif k % 2 == 0:
            cur[k] = (k, sv, "src")
    assert _rows(t.read()) == sorted(cur.values())


def test_merge_narrow_source_null_pads_and_guards(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=50)
    # a key-only source: pure conditional delete via merge
    t.merge(
        spark.range(0, 50, 7).select(F.col("id").alias("k")),
        matched_delete=True,
        not_matched_insert=False,
    )
    assert _rows(t.read()) == _rows(df.filter("k % 7 <> 0"))
    # narrow insert null-pads the missing columns with typed NULLs
    t.merge(
        spark.createDataFrame([(1000,)], "k bigint"),
        not_matched_insert=True,
    )
    got = t.read().filter("k = 1000").collect()
    assert [(r["k"], r["v"], r["tag"]) for r in got] == [(1000, None, None)]
    # guards
    with pytest.raises(ValueError, match="no clause"):
        t.merge(df, not_matched_insert=False)
    with pytest.raises(ValueError, match="key column"):
        t.merge(df.select(F.col("v")), matched_delete=True)
    with pytest.raises(ValueError, match="must not touch"):
        t.merge(df, matched_update=True, update_set={"k": "s.k + 1"})
    with pytest.raises(ValueError, match="not in the table schema"):
        t.merge(df, matched_update=True, update_set={"zzz": "1"})
    # update_set without an UPDATE clause would silently do nothing
    with pytest.raises(ValueError, match="matched_update"):
        t.merge(df, matched_delete="t.v >= 90", update_set={"v": "s.v"})


def test_merge_null_clause_condition_falls_through(
    spark, tmp_path_factory
):
    """SQL MERGE clause semantics: a clause condition that evaluates
    to NULL is NOT satisfied and the row falls through to the next
    clause — a NULL delete condition must leave the row
    update-eligible, not silently give it no action (round-11 fix:
    the update filter negates coalesce(delete_cond, false))."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 90.0)], "k bigint, v double"
    ))
    src = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "k bigint, v double"
    )
    t.merge(
        src,
        matched_delete="t.v >= 90",   # NULL for k=2 -> fall through
        matched_update=True,
        update_set={"v": "s.v + t.v"},
        not_matched_insert=False,
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    # k=1 updated (5+1); k=2's delete cond was NULL -> UPDATE applies
    # (1 + NULL = NULL); k=3 deleted
    assert got == {1: 6.0, 2: None}


def test_restore_rejects_stranded_index_columns(spark, tmp_path_factory):
    """restore() to a version predating a currently indexed column is
    a contract error naming the fix (evolve the indexes first), not an
    opaque AnalysisException mid-rewrite."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    ))
    v1 = t.optimize(target_rows_per_file=20)
    # widen with a new column, index it, commit a second version
    t.append(
        spark.range(40, 60).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w"),
            (F.col("id") * 2.0).alias("score"),
        ),
        merge_schema=True,
    )
    t.evolve(zone_cols=["score"])
    t.optimize(target_rows_per_file=20)
    with pytest.raises(ValueError, match="evolve"):
        t.restore(v1)
    # evolving the index off the post-v1 column unblocks the restore
    t.evolve(zone_cols=[])
    t.restore(v1)
    assert t.read().count() == 40


def test_merge_is_one_change_batch_and_idempotent_replay(
    spark, tmp_path_factory
):
    """A merge lands as ONE op-tagged change batch (O(source) — no
    data rewrite), and a pinned-batch replay converges instead of
    double-applying."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=60)
    src = spark.range(0, 80, 5).select(
        F.col("id").alias("k"),
        F.lit(500.0).alias("v"),
        F.lit("m").alias("tag"),
    )
    b = t.merge(src, matched_update=True, batch_id=9)
    assert b == 9
    before = _rows(t.read())
    # replay the SAME merge pinned to the same batch id: rewrites the
    # batch in place, the served state is unchanged
    t.merge(src, matched_update=True, batch_id=9)
    assert _rows(t.read()) == before


def test_schema_evolution_append_widen_and_read_alignment(
    spark, tmp_path_factory
):
    """Additive schema evolution: a merge_schema append widens the
    table; rows written before the widening read as typed NULLs in
    the new column across EVERY leg — optimized bulk, live tail, and
    the change fold — and strict appends still fail loudly on
    drift."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=100)
    t.optimize(target_rows_per_file=50)  # narrow bulk version

    # strict append rejects drift in BOTH directions
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(df.withColumn("score", F.lit(1.0)))
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(df.drop("tag"))
    # type changes are never allowed
    with pytest.raises(ValueError, match="type change"):
        t.append(
            df.withColumn("v", F.col("v").cast("string")),
            merge_schema=True,
        )

    # widen: new live batch carries `score`
    wide_rows = spark.range(100, 140).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.lit("w").alias("tag"),
        (F.col("id") * 2).cast("double").alias("score"),
    )
    t.append(wide_rows, merge_schema=True)
    got = t.read()
    assert got.columns == ["k", "v", "tag", "score"]
    assert got.filter("k < 100 AND score IS NOT NULL").count() == 0
    assert got.filter("k >= 100").agg(
        F.min(F.col("score") - F.col("k") * 2)
    ).collect()[0][0] == 0.0
    assert got.count() == 140

    # a narrower producer null-pads under merge_schema
    t.append(
        spark.range(140, 150).select(
            F.col("id").alias("k"), F.lit(5.0).alias("v")
        ),
        merge_schema=True,
    )
    assert t.read().filter("k >= 140 AND tag IS NULL").count() == 10

    # change fold: upsert with the WIDE schema touches an OLD row
    t.upsert(
        spark.createDataFrame(
            [(3, 7.0, "up", 99.0)], "k bigint, v double, tag string, score double"
        )
    )
    r = t.read().filter("k = 3").collect()[0]
    assert (r["v"], r["tag"], r["score"]) == (7.0, "up", 99.0)

    # reconnecting by root serves the widened schema
    assert read_table(spark, root).columns == ["k", "v", "tag", "score"]


def test_schema_evolution_survives_optimize_and_time_travel(
    spark, tmp_path_factory
):
    """The next optimize materializes the widened schema; the
    pre-evolution version pin still serves its own (narrow) layout;
    pruned reads and the change feed align to the widest schema."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=100)
    v1 = t.optimize(target_rows_per_file=50)
    t.append(
        df.limit(0).withColumn("score", F.lit(0.0)), merge_schema=True
    )  # widen with an empty batch (pure DDL-style evolution)
    t.upsert(
        spark.createDataFrame(
            [(5, 1.0, "s", 42.0)],
            "k bigint, v double, tag string, score double",
        )
    )
    # change feed is wide; old-schema change batches would null-pad
    ch = t.changes()
    assert "score" in ch.columns
    v2 = t.optimize(target_rows_per_file=50)
    assert v2 > v1
    # new version: wide, with the upsert materialized
    snap = t.snapshot(v2)
    assert "score" in snap.columns
    assert snap.filter("k = 5").collect()[0]["score"] == 42.0
    # time travel to the pre-evolution version: narrow, original rows
    old = t.snapshot(v1)
    assert "score" not in old.columns
    assert old.count() == 100
    # pruned read through the new version still aligns + filters
    got = t.read(range_predicates=[("v", 0.0, 3.0)])
    want = t.read().filter("v >= 0 AND v <= 3")
    assert _rows(got) == _rows(want)
    assert got.filter("k = 5").count() == 1


def test_consume_changes_exactly_once_loop(spark, tmp_path_factory):
    """The change-feed consumer contract: per-consumer cursor, ranges
    delivered in order with no gaps/overlaps on the happy path,
    at-least-once replay of the SAME range after a crash between
    apply and cursor write, and convergence with an idempotent
    applier."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=40)
    cdir = root + "_consumer"
    seen: list[tuple[int, int, tuple]] = []

    def applier(ch, lo, hi):
        rows = tuple(sorted(
            (r["k"], r["op"], r["batch"]) for r in ch.collect()
        ))
        seen.append((lo, hi, rows))

    # nothing to consume yet
    assert t.consume_changes(cdir, applier) is None

    t.delete([1, 2, 3])
    t.upsert(df.filter("k = 5").select(
        "k", (F.col("v") + 100).alias("v"), "tag"
    ))
    assert t.consume_changes(cdir, applier) == (0, 2)
    # cursor advanced: nothing new
    assert t.consume_changes(cdir, applier) is None
    t.delete([7])
    assert t.consume_changes(cdir, applier) == (2, 3)
    assert [(lo, hi) for lo, hi, _ in seen] == [(0, 2), (2, 3)]
    # the net feed in (0, 2]: keys 1,2,3 deletes + 5 upsert
    assert [r[:2] for r in seen[0][2]] == [
        (1, "delete"), (2, "delete"), (3, "delete"), (5, "upsert")
    ]

    # crash between apply and cursor write -> same range replays
    t.delete([9])

    class Boom(Exception):
        pass

    def crashing(ch, lo, hi):
        applier(ch, lo, hi)
        raise Boom()

    with pytest.raises(Boom):
        t.consume_changes(cdir, crashing)
    # cursor NOT advanced; replay delivers the identical range
    assert t.consume_changes(cdir, applier) == (3, 4)
    assert seen[-1] == seen[-2]

    # two consumers tail independently
    cdir2 = root + "_consumer2"
    got2 = []
    assert t.consume_changes(
        cdir2, lambda ch, lo, hi: got2.append((lo, hi, ch.count()))
    ) == (0, 4)
    assert got2[0][2] == 6  # net keys: 1,2,3,7,9 deletes + 5 upsert


def test_restore_undoes_later_mutations_forward_only(
    spark, tmp_path_factory
):
    """RESTORE serves an earlier snapshot exactly, as a NEW forward
    version (pins to the undone history keep working); mutations
    landing after the restore serve normally; restore composes with
    re-restore."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=60)
    v1 = t.optimize(target_rows_per_file=50)
    want_v1 = _rows(t.read())
    # later history: delete + upsert + another optimize + a live batch
    t.delete([0, 1, 2])
    t.upsert(df.filter("k = 9").select(
        "k", (F.col("v") + 500).alias("v"), "tag"
    ))
    v2 = t.optimize(target_rows_per_file=50)
    t.append(spark.createDataFrame(
        [(100, 1.0, "late")], "k bigint, v double, tag string"
    ))
    assert _rows(t.read()) != want_v1

    v3 = t.restore(v1, target_rows_per_file=50)
    assert v3 > v2
    assert _rows(t.read()) == want_v1
    # the undone version stays pinnable
    assert t.snapshot(v2).filter("k = 9").collect()[0]["v"] == \
        df.filter("k = 9").collect()[0]["v"] + 500
    # new mutations after the restore serve normally
    t.delete([5])
    t.append(spark.createDataFrame(
        [(200, 2.0, "post")], "k bigint, v double, tag string"
    ))
    got = t.read()
    assert got.filter("k = 5").count() == 0
    assert got.filter("k = 200").count() == 1
    assert got.filter("k = 100").count() == 0  # discarded by restore
    # restore the restore: back to v2's state
    t2rows = t.restore(v2, target_rows_per_file=50)
    assert t2rows > v3
    cur = t.read()
    assert cur.filter("k = 0").count() == 0      # v2 had the delete
    assert cur.filter("k = 200").count() == 0    # post-restore undone
    with pytest.raises(ValueError, match="no committed"):
        t.restore(99)


def test_drop_columns_metadata_only_and_readd_semantics(
    spark, tmp_path_factory
):
    """DROP COLUMNS is metadata-only: reads narrow immediately,
    nothing rewrites; the next optimize materializes physically;
    pre-drop version pins keep the column; re-add before an optimize
    resurfaces surviving values (documented plain-parquet trade),
    re-add after starts from NULLs, and a re-typed re-add raises."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=30, zone=False, bloom=False)
    v1 = t.optimize(target_rows_per_file=50)

    with pytest.raises(ValueError, match="not in the schema"):
        t.drop_columns(["zzz"])
    with pytest.raises(ValueError, match="key column"):
        t.drop_columns(["k"])

    t.drop_columns(["tag"])
    assert t.read().columns == ["k", "v"]
    assert t.describe()["schema"] == [("k", "bigint"), ("v", "double")]
    # pre-drop pin still serves it
    assert "tag" in t.snapshot(v1).columns
    # writes operate on the narrow schema
    t.upsert(spark.createDataFrame([(500, 1.5)], "k bigint, v double"))
    assert t.read().filter("k = 500").count() == 1

    # re-typed re-add refuses
    with pytest.raises(ValueError, match="re-add with the original"):
        t.append(
            spark.createDataFrame(
                [(501, 1.0, 7)], "k bigint, v double, tag bigint"
            ),
            merge_schema=True,
        )
    # re-add BEFORE optimize: surviving pre-drop bytes resurface
    t.append(
        spark.createDataFrame(
            [(502, 2.0, "new")], "k bigint, v double, tag string"
        ),
        merge_schema=True,
    )
    got = t.read()
    assert got.columns == ["k", "v", "tag"]
    assert got.filter("k = 5").collect()[0]["tag"] is not None  # resurfaced
    assert got.filter("k = 502").collect()[0]["tag"] == "new"

    # drop again, optimize (physical), re-add: starts from NULLs
    t.drop_columns(["tag"])
    t.optimize(target_rows_per_file=50)
    t.append(
        spark.createDataFrame(
            [(503, 3.0, "fresh")], "k bigint, v double, tag string"
        ),
        merge_schema=True,
    )
    got2 = t.read()
    assert got2.filter("k = 5").collect()[0]["tag"] is None
    assert got2.filter("k = 503").collect()[0]["tag"] == "fresh"


def test_drop_columns_guards_indexed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, _ = _mk(spark, root, n=20)  # zone on v, bloom on k
    with pytest.raises(ValueError, match="indexed"):
        t.drop_columns(["v"])
    t.evolve(zone_cols=[])
    t.drop_columns(["v"])
    assert t.read().columns == ["k", "tag"]


def test_evolve_indexes_onto_evolved_column(spark, tmp_path_factory):
    """evolve() can index a column ADDED by schema evolution even
    while pre-widening tail batches (which lack it on disk) are still
    live — the manifest rebuild reads the tail under the widest
    schema, so the old batches contribute all-NULL zones (soundly
    skippable) instead of an AnalysisException."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("double").alias("v")
    ))
    t.append(
        spark.range(20, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("double").alias("v"),
            (F.col("id") * 1.0).alias("score"),
        ),
        merge_schema=True,
    )
    t.evolve(zone_cols=["score"])
    got = t.read(range_predicates=[("score", 25.0, 27.0)])
    assert sorted(r["k"] for r in got.collect()) == [25, 26, 27]
    # filter-law still holds across the mixed-width tail
    assert _rows_kv(got) == _rows_kv(
        t.read().filter("score >= 25 AND score <= 27")
    )


def _rows_kv(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_merge_not_matched_by_source_full_sync(spark, tmp_path_factory):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the full-sync shape —
    after the merge, the table equals the source exactly (conditional
    variant keeps protected target rows)."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=30)
    src = spark.range(10, 40).select(
        F.col("id").alias("k"),
        F.lit(9.0).alias("v"),
        F.lit("sync").alias("tag"),
    )
    t.merge(
        src,
        matched_update=True,
        not_matched_insert=True,
        not_matched_by_source_delete=True,
    )
    assert _rows(t.read()) == sorted(
        (k, 9.0, "sync") for k in range(10, 40)
    )
    # conditional by-source delete: keep target rows tagged 'sync'
    # with k < 15 (the condition sees t.* only)
    src2 = spark.range(35, 45).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"),
        F.lit("s2").alias("tag"),
    )
    t.merge(
        src2,
        matched_update=True,
        not_matched_insert=True,
        not_matched_by_source_delete="t.k >= 15",
    )
    got = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert sorted(got) == list(range(10, 15)) + list(range(35, 45))
    assert got[10] == (9.0, "sync")   # protected by the condition
    assert got[40] == (1.0, "s2")     # inserted
    assert got[36] == (1.0, "s2")     # updated


def test_restore_restores_the_schema_too(spark, tmp_path_factory):
    """RESTORE brings back the SHAPE: columns dropped after the
    pinned version return with their values; columns added after it
    disappear (and strict appends of the old width work again)."""
    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t, df = _mk(spark, root, n=20, zone=False, bloom=False)
    v1 = t.optimize(target_rows_per_file=50)

    # evolve forward: drop tag, add score
    t.drop_columns(["tag"])
    t.append(
        spark.createDataFrame(
            [(100, 1.0, 5.0)], "k bigint, v double, score double"
        ),
        merge_schema=True,
    )
    assert t.read().columns == ["k", "v", "score"]

    t.restore(v1, target_rows_per_file=50)
    got = t.read()
    assert got.columns == ["k", "v", "tag"]
    assert got.filter("k = 3").collect()[0]["tag"] is not None
    assert got.filter("k = 100").count() == 0
    # the old width is the strict width again
    t.append(spark.createDataFrame(
        [(200, 2.0, "back")], "k bigint, v double, tag string"
    ))
    assert t.read().filter("k = 200").count() == 1


@pytest.mark.slow
def test_filter_law_random_sweep_under_evolution(
    spark, tmp_path_factory
):
    """Randomized soundness sweep (the round-9 combined-pruning
    discipline, extended to mixed-width history): for seeded random
    range/IN predicates over a table with a narrow optimized bulk, a
    widening, live tail batches, and un-materialized changes,
    ``read(preds) ≡ read().filter(preds)`` must hold exactly."""
    import random

    root = str(tmp_path_factory.mktemp("tbl")) + "/t"
    t = Table.create(
        spark, root, "k", zone_cols=["v"], bloom_cols=["k"]
    )
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 90).cast("double").alias("v"),
    )
    t.append(df.filter("k < 150").repartition(4), batch_id=1)
    t.optimize(target_rows_per_file=40)
    t.append(
        df.filter("k >= 150").withColumn(
            "w", (F.col("k") * 2).cast("double")
        ).repartition(4),
        batch_id=2,
        merge_schema=True,
    )
    t.delete([int(x) for x in range(0, 300, 17)])
    t.upsert(
        df.filter("k % 23 = 0 AND k % 17 <> 0").select(
            "k", (F.col("v") + 500).alias("v"),
            F.lit(-1.0).alias("w"),
        )
    )

    rng = random.Random(77)
    full = t.read().localCheckpoint()
    for _ in range(12):
        lo = rng.uniform(-20, 600)
        hi = lo + rng.uniform(0, 300)
        ids = rng.sample(range(-5, 320), rng.randint(1, 8))
        got = t.read(
            range_predicates=[("v", lo, hi)],
            in_predicates=[("k", ids)],
        )
        want = full.filter(
            (F.col("v") >= lo) & (F.col("v") <= hi)
        ).filter(F.col("k").isin(*ids))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), (lo, hi, ids)


# ----- composite keys (round 11) ------------------------------------------


def _mk_composite(spark, root):
    """A (city, day)-keyed table — the real form of the reference's
    concat(city,'_',date) surrogate key (apps/process_reviews.py:111)."""
    t = Table.create(spark, root, ["city", "day"])
    df = spark.range(60).select(
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
        .alias("city"),
        (F.col("id") % 20).alias("day"),
        (F.col("id") % 20).cast("double").alias("temp"),
    )
    t.append(df)
    return t, df


def _crows(df):
    return sorted(map(tuple, df.select("city", "day", "temp").collect()))


def test_composite_key_upsert_delete_merge_changes(
    spark, tmp_path_factory
):
    """The full DML surface over a 2-column key: upsert replaces by
    (city, day); delete accepts tuples AND a key frame; merge joins
    on both columns; the change feed nets per composite key."""
    root = str(tmp_path_factory.mktemp("ctbl")) + "/t"
    t, df = _mk_composite(spark, root)
    assert t.key_cols == ["city", "day"]

    # upsert: replace one (city, day) row
    t.upsert(spark.createDataFrame(
        [("c0", 0, 99.0)], "city string, day bigint, temp double"
    ))
    got = {(r["city"], r["day"]): r["temp"] for r in t.read().collect()}
    assert got[("c0", 0)] == 99.0
    assert got[("c1", 1)] == 1.0  # untouched sibling day

    # delete by plain tuples, then by a key frame
    t.delete([("c0", 3), ("c1", 4)])
    t.delete(spark.createDataFrame(
        [("c2", 5)], "city string, day bigint"
    ))
    keys = {(r["city"], r["day"]) for r in t.read().collect()}
    assert ("c0", 3) not in keys and ("c1", 4) not in keys
    assert ("c2", 5) not in keys
    assert ("c1", 3) in keys  # same day, other city survives

    # merge: delete cold days, bump the rest, insert a new pair
    t.merge(
        spark.createDataFrame(
            [("c0", 6, 1.0), ("c1", 7, 2.0), ("c9", 99, 50.0)],
            "city string, day bigint, temp double",
        ),
        matched_delete="t.temp < 6.5",
        matched_update=True,
        update_set={"temp": "t.temp + s.temp"},
        not_matched_insert=True,
    )
    got = {(r["city"], r["day"]): r["temp"] for r in t.read().collect()}
    assert ("c0", 6) not in got          # temp 6.0 < 6.5 -> deleted
    assert got[("c1", 7)] == 9.0         # 7.0 + 2.0
    assert got[("c9", 99)] == 50.0       # inserted

    # change feed nets per composite key
    ch = {
        (r["city"], r["day"]): r["op"]
        for r in t.changes(from_batch=0).collect()
    }
    assert ch[("c0", 0)] == "upsert"
    assert ch[("c0", 3)] == "delete"
    assert ch[("c9", 99)] == "upsert"

    # optimize folds everything; read state is unchanged
    before = _crows(t.read())
    t.optimize(target_rows_per_file=50)
    assert _crows(t.read()) == before

    # a reopened handle carries the composite key
    t2 = Table(spark, root)
    assert t2.key_cols == ["city", "day"]
    assert _crows(t2.read()) == before


def test_composite_key_guards(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ctbl")) + "/t"
    t, df = _mk_composite(spark, root)
    # source missing one key column
    with pytest.raises(ValueError, match="key column"):
        t.merge(df.select("city", "temp"), matched_update=True)
    # update_set must not touch either key column
    with pytest.raises(ValueError, match="must not touch"):
        t.merge(df, matched_update=True, update_set={"day": "s.day"})
    # one op per composite key per batch (same day, same city twice)
    with pytest.raises(ValueError, match="more than"):
        t.upsert(spark.createDataFrame(
            [("c0", 1, 1.0), ("c0", 1, 2.0)],
            "city string, day bigint, temp double",
        ))
    # but the same day across cities is two distinct keys
    t.upsert(spark.createDataFrame(
        [("c0", 1, 1.0), ("c1", 1, 2.0)],
        "city string, day bigint, temp double",
    ))
    with pytest.raises(ValueError, match="cannot drop"):
        t.drop_columns(["day"])
    with pytest.raises(ValueError, match="distinct column names"):
        Table.create(
            spark, str(tmp_path_factory.mktemp("ctbl")) + "/u",
            ["a", "a"],
        )
    # ["k"] normalizes to "k": both spellings are one config
    r2 = str(tmp_path_factory.mktemp("ctbl")) + "/v"
    ta = Table.create(spark, r2, ["k"])
    assert ta.key_col == "k" and ta.key_cols == ["k"]
    Table.create(spark, r2, "k")  # idempotent re-create, no conflict


def test_all_string_key_optimize_compacts_without_zorder(
    spark, tmp_path_factory
):
    """A table whose key columns are all strings and with no zone
    columns configured still optimizes: plain compaction, no zone
    manifest for the version (Z-order needs numeric dims), reads and
    DML unchanged."""
    root = str(tmp_path_factory.mktemp("stbl")) + "/t"
    t = Table.create(spark, root, ["city", "station"])
    df = spark.range(40).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string"))
        .alias("city"),
        F.concat(F.lit("s"), (F.col("id") % 10).cast("string"))
        .alias("station"),
        F.col("id").cast("double").alias("temp"),
    )
    t.append(df)
    before = sorted(map(tuple, t.read().collect()))
    v = t.optimize(target_rows_per_file=20)
    assert sorted(map(tuple, t.read().collect())) == before
    import os
    assert not os.path.exists(f"{root}/v={v}/zones")
    t.delete([("c0", "s0")])
    assert t.read().filter(
        "city = 'c0' AND station = 's0'"
    ).count() == 0


def test_stream_merge_equals_sequential_batch_merges(
    spark, tmp_path_factory
):
    """stream_merge over N micro-batches ≡ the same N frames merged
    sequentially through Table.merge — conditional clauses and a
    partial update_set included."""
    base_dir = tmp_path_factory.mktemp("smrg")
    src_dir = str(base_dir / "src")
    df0 = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    batches = [
        spark.range(0, 90, 3).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v")
        ),
        spark.range(0, 90, 5).select(
            F.col("id").alias("k"), F.lit(2.0).alias("v")
        ),
        spark.range(0, 90, 7).select(
            F.col("id").alias("k"), F.lit(3.0).alias("v")
        ),
    ]
    import glob as _glob
    import os
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    for i, b in enumerate(batches):
        # the file stream source lists FILES (no recursion): land each
        # batch as one flat parquet file in arrival order
        tmp = f"{src_dir}__stage{i}"
        b.coalesce(1).write.parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{src_dir}/b{i}.parquet")
        shutil.rmtree(tmp)
    clauses = dict(
        matched_delete="t.v >= 9",
        matched_update="s.v < t.v",
        update_set={"v": "s.v + t.v"},
        not_matched_insert="s.k % 2 = 0",
    )

    stream_root = str(base_dir / "t_stream")
    ts = Table.create(spark, stream_root, "k")
    ts.append(df0, batch_id=1)
    q = ts.stream_merge(
        src_dir, "k bigint, v double",
        str(base_dir / "ckpt"), **clauses,
    )
    q.awaitTermination(120)

    batch_root = str(base_dir / "t_batch")
    tb = Table.create(spark, batch_root, "k")
    tb.append(df0, batch_id=1)
    # the stream lands files in maxFilesPerTrigger=1 order of the
    # source listing — replay the same order sequentially
    files = [f"{src_dir}/b{i}.parquet" for i in range(len(batches))]
    for i, fp in enumerate(files):
        tb.merge(
            spark.read.schema("k bigint, v double").parquet(fp),
            batch_id=i + 1,
            **clauses,
        )
    got = sorted(map(tuple, ts.read().collect()))
    want = sorted(map(tuple, tb.read().collect()))
    assert got == want


def test_merge_pinned_replay_converges_with_arithmetic_update(
    spark, tmp_path_factory
):
    """Crash-replay: re-running a pinned merge AFTER its change batch
    already committed must converge — the replay evaluates against
    the pre-batch state (as-of pin), so update_set arithmetic like
    s.v + t.v does not double-apply."""
    root = str(tmp_path_factory.mktemp("mrp")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, v double"
    ), batch_id=1)
    src = spark.createDataFrame([(1, 5.0)], "k bigint, v double")
    t.merge(src, matched_update=True,
            update_set={"v": "s.v + t.v"}, batch_id=1)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {
        1: 15.0, 2: 20.0
    }
    # crash between apply and checkpoint commit -> same batch replays
    t.merge(src, matched_update=True,
            update_set={"v": "s.v + t.v"}, batch_id=1)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {
        1: 15.0, 2: 20.0  # NOT 20.0 = 5 + (5 + 10)
    }


def test_stream_merge_checkpoint_restart_is_idempotent(
    spark, tmp_path_factory
):
    """A full stream replay (checkpoint lost) rewrites every pinned
    batch with identical decisions — the served state is unchanged."""
    base_dir = tmp_path_factory.mktemp("smrg2")
    src_dir = str(base_dir / "src")
    import glob as _glob
    import os
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    for i in range(2):
        tmp = f"{src_dir}__stage{i}"
        spark.range(i * 10, i * 10 + 30).select(
            F.col("id").alias("k"), F.lit(float(i + 1)).alias("v")
        ).coalesce(1).write.parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{src_dir}/b{i}.parquet")
        shutil.rmtree(tmp)
    root = str(base_dir / "t")
    t = Table.create(spark, root, "k")
    t.append(spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(100.0).alias("v")
    ), batch_id=1)
    clauses = dict(matched_update=True,
                   update_set={"v": "s.v + t.v"},
                   not_matched_insert=True)
    t.stream_merge(
        src_dir, "k bigint, v double", str(base_dir / "c1"), **clauses
    ).awaitTermination(120)
    before = sorted(map(tuple, t.read().collect()))
    # checkpoint lost: the whole stream replays with the same pinned
    # batch ids -> identical rewrites, identical state
    t.stream_merge(
        src_dir, "k bigint, v double", str(base_dir / "c2"), **clauses
    ).awaitTermination(120)
    assert sorted(map(tuple, t.read().collect())) == before


def test_update_where_and_delete_where(spark, tmp_path_factory):
    """Single-table UPDATE/DELETE WHERE: set expressions over the
    row's own columns, unlisted columns keep values, guards on key /
    unknown columns, merge-on-read O(affected) change batches."""
    root = str(tmp_path_factory.mktemp("uw")) + "/t"
    t, df = _mk(spark, root, n=100)
    t.update_where("v >= 90", {"v": "v / 10", "tag": "'hot'"})
    got = {r["k"]: (r["v"], r["tag"]) for r in t.read().collect()}
    for r in df.collect():
        if r["v"] >= 90:
            assert got[r["k"]] == (r["v"] / 10, "hot")
        else:
            assert got[r["k"]] == (r["v"], r["tag"])
    t.delete_where("tag = 'hot'")
    assert t.read().filter("tag = 'hot'").count() == 0
    assert t.read().count() == sum(1 for r in df.collect() if r["v"] < 90)
    with pytest.raises(ValueError, match="must not touch"):
        t.update_where("true", {"k": "k + 1"})
    with pytest.raises(ValueError, match="not in the table schema"):
        t.update_where("true", {"zzz": "1"})
    with pytest.raises(ValueError, match="empty set"):
        t.update_where("true", {})


def test_update_where_pinned_replay_converges(spark, tmp_path_factory):
    """Crash-replay of a pinned UPDATE WHERE with arithmetic set
    (v = v + 1) must converge — the replay decides from the pre-batch
    as-of state, never re-incrementing."""
    root = str(tmp_path_factory.mktemp("uwr")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.createDataFrame(
        [(1, 10.0), (2, 99.0)], "k bigint, v double"
    ), batch_id=1)
    t.update_where("v < 50", {"v": "v + 1"}, batch_id=1)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {
        1: 11.0, 2: 99.0
    }
    # replay after the change batch committed
    t.update_where("v < 50", {"v": "v + 1"}, batch_id=1)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {
        1: 11.0, 2: 99.0  # NOT 12.0
    }


def test_delete_where_pinned_replay_converges(spark, tmp_path_factory):
    """Crash-replay of a pinned DELETE WHERE re-derives the SAME key
    set from the pre-batch state (a plain re-read would see the rows
    already gone and rewrite the batch empty, resurrecting them on
    the next fold... of nothing — but with an interleaved upsert the
    shrunken batch would resurrect; the as-of pin closes it)."""
    root = str(tmp_path_factory.mktemp("dwr")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 7.0)], "k bigint, v double"
    ), batch_id=1)
    t.delete_where("v < 50", batch_id=1)
    assert {r["k"] for r in t.read().collect()} == {2}
    t.delete_where("v < 50", batch_id=1)  # replay
    assert {r["k"] for r in t.read().collect()} == {2}


def test_update_delete_where_composite_key(spark, tmp_path_factory):
    """UPDATE/DELETE WHERE fold per COMPOSITE key."""
    root = str(tmp_path_factory.mktemp("uwc")) + "/t"
    t, df = _mk_composite(spark, root)
    t.update_where("day % 5 = 0", {"temp": "temp + 100"})
    got = {(r["city"], r["day"]): r["temp"] for r in t.read().collect()}
    for r in df.collect():
        want = r["temp"] + 100 if r["day"] % 5 == 0 else r["temp"]
        assert got[(r["city"], r["day"])] == want
    t.delete_where("day % 5 = 0")
    assert t.read().filter("day % 5 = 0").count() == 0


@pytest.mark.slow
def test_filter_law_sweep_composite_key(spark, tmp_path_factory):
    """The filter-under-CDC law on a COMPOSITE-key table with indexed
    columns: for seeded random range/IN predicates over an optimized
    bulk + live tail + un-materialized composite-key changes,
    read(preds) ≡ read().filter(preds) exactly."""
    import random

    root = str(tmp_path_factory.mktemp("cfl")) + "/t"
    t = Table.create(
        spark, root, ["city", "day"],
        zone_cols=["temp"], bloom_cols=["city"],
    )
    # (city, day) unique by construction: city cycles, day = id // 4
    df = spark.range(240).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string"))
        .alias("city"),
        (F.col("id") / 4).cast("bigint").alias("day"),
        (F.col("id") % 97).cast("double").alias("temp"),
    )
    t.append(df.filter("day < 30").repartition(3), batch_id=1)
    t.optimize(target_rows_per_file=40)
    t.append(df.filter("day >= 30").repartition(3), batch_id=2)
    t.delete([("c0", d) for d in range(0, 60, 7)])
    t.upsert(
        df.filter("day % 11 = 0 AND NOT (city = 'c0' AND day % 7 = 0)")
        .select("city", "day", (F.col("temp") + 500).alias("temp"))
    )
    rng = random.Random(11)
    for trial in range(6):
        lo = rng.uniform(0, 80)
        hi = lo + rng.uniform(5, 400)
        cities = rng.sample(["c0", "c1", "c2", "c3"], rng.randint(1, 3))
        preds = dict(
            range_predicates=[("temp", lo, hi)],
            in_predicates=[("city", cities)],
        )
        got = sorted(map(tuple, t.read(**preds).collect()))
        want = sorted(map(tuple, t.read().filter(
            (F.col("temp") >= lo) & (F.col("temp") <= hi)
            & F.col("city").isin(cities)
        ).collect()))
        assert got == want, (trial, lo, hi, cities)


def test_stream_knobs_processing_time_and_multi_file_batches(
    spark, tmp_path_factory
):
    """Round-12 directive: the stream source/trigger knobs — a
    processing-time trigger (the long-running ingest mode; stopped
    via processAllAvailable + stop rather than self-terminating) with
    max_files_per_trigger > 1, so micro-batches carry several source
    files. Keys are distinct across files, so ANY batching must
    converge to the same final state as one bulk merge."""
    import os

    base = str(tmp_path_factory.mktemp("tknobs"))
    root = f"{base}/t"
    flat = f"{base}/flat"
    os.makedirs(flat, exist_ok=True)
    t = Table.create(spark, root, "k")
    t.append(
        spark.createDataFrame([(999, -1.0)], "k bigint, v double")
    )
    for i in range(6):
        spark.createDataFrame(
            [(10 * i + j, float(i)) for j in range(3)],
            "k bigint, v double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{base}/stage{i}")
        import glob
        import shutil

        (part,) = glob.glob(f"{base}/stage{i}/part-*.parquet")
        shutil.copy(part, f"{flat}/{i:04d}.parquet")

    q = t.stream_merge(
        flat,
        "k bigint, v double",
        f"{base}/ckpt",
        matched_update=True,
        max_files_per_trigger=3,
        trigger={"processingTime": "1 seconds"},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    got = sorted((r["k"], r["v"]) for r in t.read().collect())
    expect = sorted(
        [(999, -1.0)]
        + [(10 * i + j, float(i)) for i in range(6) for j in range(3)]
    )
    assert got == expect
    # >1 files per batch really happened: 6 files at 3 per trigger
    # is at most 2-3 change batches, never 6
    n_change = len(Table(spark, root).describe()["change_batches"])
    assert 1 <= n_change <= 3, n_change
