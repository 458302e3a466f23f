"""Tests: key-based deletion vectors (sources.deletes) —
merge-on-read semantics, idempotent re-deletes, sidecar compaction,
and the OPTIMIZE materialization that physically removes deleted
rows and resets the sidecar."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
    clear_deletes,
    compact_deletes,
    delete_keys,
    read_deletes,
    read_with_deletes,
)


def _table(spark, path, n=1000):
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("double").alias("v"),
    ).coalesce(4).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_merge_on_read_excludes_deleted_keys(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dv"))
    data = _table(spark, f"{base}/data")
    side = f"{base}/deletes"

    keys = spark.createDataFrame([(7,), (42,), (999,)], "doc_id bigint")
    assert delete_keys(keys, side, "doc_id") == 1
    got = read_with_deletes(data, side, "doc_id")
    assert got.count() == 997
    assert got.filter(F.col("doc_id").isin(7, 42, 999)).count() == 0
    # everything else survives untouched
    assert got.filter("doc_id = 8").count() == 1

    # second batch composes; re-deleting an already-deleted key is a
    # no-op (set semantics)
    delete_keys(
        spark.createDataFrame([(42,), (500,)], "doc_id bigint"),
        side, "doc_id",
    )
    got2 = read_with_deletes(data, side, "doc_id")
    assert got2.count() == 996
    assert read_deletes(spark, side, "doc_id").count() == 4

    # deleting a key absent from the data changes nothing
    delete_keys(
        spark.createDataFrame([(10**9,)], "doc_id bigint"), side, "doc_id"
    )
    assert read_with_deletes(data, side, "doc_id").count() == 996


def test_compact_deletes_folds_batches(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dvc"))
    data = _table(spark, f"{base}/data", n=100)
    side = f"{base}/deletes"
    for k in (1, 2, 3, 2):
        delete_keys(
            spark.createDataFrame([(k,)], "doc_id bigint"), side, "doc_id"
        )
    before = sorted(
        r["doc_id"]
        for r in read_with_deletes(data, side, "doc_id").collect()
    )
    compact_deletes(spark, side, "doc_id")
    import os

    batches = [
        d for d in os.listdir(side) if d.startswith("batch=")
    ]
    assert len(batches) == 1
    after = sorted(
        r["doc_id"]
        for r in read_with_deletes(data, side, "doc_id").collect()
    )
    assert after == before
    assert read_deletes(spark, side, "doc_id").count() == 3


def test_optimize_materializes_deletes(spark, tmp_path_factory):
    """The merge-on-write leg: OPTIMIZE over the merge-on-read frame
    produces a version with the deleted rows physically absent (the
    skipping manifests never saw them), after which the sidecar
    clears and plain pointer reads serve the deleted-free table."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
        optimize_table,
        read_optimized,
        read_optimized_data,
    )

    base = str(tmp_path_factory.mktemp("dvo"))
    data = _table(spark, f"{base}/staging", n=2000)
    side = f"{base}/deletes"
    root = f"{base}/table"
    delete_keys(
        spark.createDataFrame([(i,) for i in range(0, 2000, 10)],
                              "doc_id bigint"),
        side, "doc_id",
    )
    live = read_with_deletes(data, side, "doc_id")
    optimize_table(
        live, root, [("v", 0.0, 100.0)], bloom_cols=["doc_id"],
        target_rows_per_file=500,
    )
    clear_deletes(spark, side)

    assert read_optimized_data(spark, root).count() == 1800
    # a deleted key is gone even via the bloom point-lookup path
    gone = read_optimized(
        spark, root, in_predicates=[("doc_id", [10, 20])]
    )
    assert gone.count() == 0
    kept = read_optimized(
        spark, root, in_predicates=[("doc_id", [11, 21])]
    )
    assert kept.count() == 2
    # sidecar reset: fresh reads need no anti-join input
    assert read_deletes(spark, side, "doc_id").count() == 0


def test_change_batches_equal_sequential_merge_replay(
    spark, tmp_path_factory
):
    """read_with_changes must equal replaying every batch through a
    sequential MERGE: update an existing key, insert a new one,
    delete one, then re-upsert a previously-deleted key — the
    latest-op-per-key fold resolves the full interleaving."""
    base = str(tmp_path_factory.mktemp("cdc"))
    data = _table(spark, f"{base}/data", n=50)
    side = f"{base}/changes"

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        apply_changes,
        read_with_changes,
    )

    schema = "doc_id bigint, v double, op string"
    apply_changes(
        spark.createDataFrame(
            [(3, 999.0, "upsert"), (60, 60.5, "upsert"),
             (7, None, "delete")],
            schema,
        ), side, "doc_id",
    )
    apply_changes(
        spark.createDataFrame(
            [(7, 7.75, "upsert"),       # re-insert after delete
             (60, None, "delete"),      # delete the batch-1 insert
             (3, 333.0, "upsert")],     # second update wins
            schema,
        ), side, "doc_id",
    )
    got = {
        r["doc_id"]: r["v"]
        for r in read_with_changes(data, side, "doc_id").collect()
    }
    # sequential replay in plain python
    want = {i: float(i % 100) for i in range(50)}
    for batch in (
        [(3, 999.0, "upsert"), (60, 60.5, "upsert"), (7, None, "delete")],
        [(7, 7.75, "upsert"), (60, None, "delete"), (3, 333.0, "upsert")],
    ):
        for k, v, op in batch:
            if op == "delete":
                want.pop(k, None)
            else:
                want[k] = v
    assert got == want


def test_change_batch_guards(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        apply_changes,
    )
    import pytest

    side = str(tmp_path_factory.mktemp("cdcg")) + "/changes"
    schema = "doc_id bigint, v double, op string"
    with pytest.raises(ValueError, match="unknown op"):
        apply_changes(
            spark.createDataFrame([(1, 1.0, "replace")], schema),
            side, "doc_id",
        )
    with pytest.raises(ValueError, match="more than"):
        apply_changes(
            spark.createDataFrame(
                [(1, 1.0, "upsert"), (1, None, "delete")], schema
            ), side, "doc_id",
        )


def test_changes_then_optimize_materializes(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        apply_changes,
        read_with_changes,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
        optimize_table,
        read_optimized_data,
    )

    base = str(tmp_path_factory.mktemp("cdco"))
    data = _table(spark, f"{base}/data", n=200)
    side = f"{base}/changes"
    apply_changes(
        spark.createDataFrame(
            [(5, 5555.0, "upsert"), (6, None, "delete")],
            "doc_id bigint, v double, op string",
        ), side, "doc_id",
    )
    live = read_with_changes(data, side, "doc_id")
    optimize_table(
        live, f"{base}/table", [("v", 0.0, 6000.0)],
        target_rows_per_file=100,
    )
    out = read_optimized_data(spark, f"{base}/table")
    assert out.count() == 199
    assert out.filter("doc_id = 5").head()["v"] == 5555.0
    assert out.filter("doc_id = 6").count() == 0


def test_cdc_read_plan_broadcasts_change_side(spark, tmp_path_factory):
    """The 'data never re-shuffles' claim as a plan gate: with AQE,
    the delete-sized anti-join build side must end up BROADCAST —
    the executed plan carries a broadcast join and no shuffle
    exchange on the data side of the anti-join."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        apply_changes,
        read_with_changes,
    )

    base = str(tmp_path_factory.mktemp("cdcp"))
    data = _table(spark, f"{base}/data", n=5000)
    side = f"{base}/changes"
    apply_changes(
        spark.createDataFrame(
            [(5, 1.0, "upsert"), (9, None, "delete")],
            "doc_id bigint, v double, op string",
        ), side, "doc_id",
    )
    out = read_with_changes(data, side, "doc_id")
    out.count()  # materialize so AQE finalizes the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_stream_changes_sink_and_replay(spark, tmp_path_factory):
    """Streaming CDC: after the drain, read_with_changes equals the
    sequential replay of the landed change files (file order = batch
    order via maxFilesPerTrigger=1), and a replay from a fresh
    checkpoint converges — pinned batch ids rewrite idempotently."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        read_with_changes,
        stream_changes_sink,
    )

    base = str(tmp_path_factory.mktemp("cdcs"))
    data = _table(spark, f"{base}/data", n=30)
    src = f"{base}/src"
    side = f"{base}/changes"
    schema = "doc_id bigint, v double, op string"
    batches = [
        [(3, 300.0, "upsert"), (4, None, "delete")],
        [(4, 44.0, "upsert"), (40, 40.0, "upsert")],
        [(40, None, "delete"), (3, 3.5, "upsert")],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    q = stream_changes_sink(
        spark, src, schema, side, "doc_id", f"{base}/ckpt"
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["v"]
        for r in read_with_changes(data, side, "doc_id").collect()
    }
    want = {i: float(i % 100) for i in range(30)}
    # file landing order is append order; each file is one batch
    for b in batches:
        for k, v, op in b:
            if op == "delete":
                want.pop(k, None)
            else:
                want[k] = v
    assert got == want

    # replay with a fresh checkpoint: same files, same pinned batch
    # ids, identical served state
    q2 = stream_changes_sink(
        spark, src, schema, side, "doc_id", f"{base}/ckpt2"
    )
    q2.awaitTermination(120)
    again = {
        r["doc_id"]: r["v"]
        for r in read_with_changes(data, side, "doc_id").collect()
    }
    assert again == got


def test_crash_mid_compact_leaves_superset_never_subset(
    spark, tmp_path_factory, monkeypatch
):
    """compact_deletes writes the fold BEFORE dropping old batches; a
    crash between the two leaves a reader-visible SUPERSET of
    tombstones (harmless under anti-join set semantics) — never a
    subset (which would resurrect deleted rows). A later compact
    converges."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import (
        deletes as dl,
    )

    base = str(tmp_path_factory.mktemp("dvcc"))
    data = _table(spark, f"{base}/data", n=100)
    side = f"{base}/deletes"
    for k in (1, 2, 3):
        dl.delete_keys(
            spark.createDataFrame([(k,)], "doc_id bigint"), side, "doc_id"
        )
    served = sorted(
        r["doc_id"]
        for r in dl.read_with_deletes(data, side, "doc_id").collect()
    )

    real_delete = dl.fsutil.delete

    def boom(spark_, path, recursive=True):
        raise RuntimeError("injected crash after fold, before drop")

    monkeypatch.setattr(dl.fsutil, "delete", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        dl.compact_deletes(spark, side, "doc_id")
    monkeypatch.setattr(dl.fsutil, "delete", real_delete)

    # superset state: fold batch + all originals — same served rows
    import os

    assert len([d for d in os.listdir(side) if d.startswith("batch=")]) == 4
    assert sorted(
        r["doc_id"]
        for r in dl.read_with_deletes(data, side, "doc_id").collect()
    ) == served
    # recovery: the next compact folds everything into one batch
    dl.compact_deletes(spark, side, "doc_id")
    assert len([d for d in os.listdir(side) if d.startswith("batch=")]) == 1
    assert sorted(
        r["doc_id"]
        for r in dl.read_with_deletes(data, side, "doc_id").collect()
    ) == served


def test_concurrent_batch_claims_never_collide(spark, tmp_path_factory):
    """Round-10 ADVICE fix: batch numbers allocate via atomic
    exclusive claims — a number already claimed (by a concurrent
    writer that has not committed yet) is skipped, never overwritten
    (a shared number = silently lost tombstones = resurrected
    rows)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil

    base = str(tmp_path_factory.mktemp("claims"))
    side = f"{base}/deletes"
    k1 = spark.createDataFrame([(1,)], "doc_id bigint")
    assert delete_keys(k1, side, "doc_id") == 1
    # simulate a concurrent writer holding the next number: claim it
    # but never commit the batch dir
    assert fsutil.create_exclusive(spark, f"{side}/__claim_batch=2")
    n = delete_keys(
        spark.createDataFrame([(2,)], "doc_id bigint"), side, "doc_id"
    )
    assert n == 3  # skipped the held claim
    # both committed batches visible; the uncommitted claim invisible
    assert read_deletes(spark, side, "doc_id").count() == 2
    # compaction claims too, and sweeps the dropped batches' claims
    delete_keys(
        spark.createDataFrame([(3,)], "doc_id bigint"), side, "doc_id"
    )
    compact_deletes(spark, side, "doc_id")
    assert read_deletes(spark, side, "doc_id").count() == 3
    assert not fsutil.exists(spark, f"{side}/__claim_batch=1")
    # the foreign (never-committed) claim is not ours to sweep
    assert fsutil.exists(spark, f"{side}/__claim_batch=2")


def test_apply_changes_claims_batch_numbers(spark, tmp_path_factory):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
        apply_changes,
        read_with_changes,
    )

    base = str(tmp_path_factory.mktemp("cdcclaims"))
    data = _table(spark, f"{base}/data", n=10)
    side = f"{base}/changes"
    ch = spark.createDataFrame(
        [(3, None, "delete")], "doc_id bigint, v double, op string"
    )
    assert apply_changes(ch, side, "doc_id") == 1
    assert fsutil.create_exclusive(spark, f"{side}/__claim_batch=2")
    ch2 = spark.createDataFrame(
        [(4, 9.0, "upsert")], "doc_id bigint, v double, op string"
    )
    assert apply_changes(ch2, side, "doc_id") == 3
    got = read_with_changes(data, side, "doc_id")
    assert got.count() == 9
    assert got.filter("doc_id = 4").head()["v"] == 9.0


def test_table_changes_drives_lm_ledger_maintenance(
    spark, tmp_path_factory
):
    """Round-10: the change-data-feed read wired into a derived
    artifact's maintenance path end to end — a unigram LM count
    ledger follows its source table through deletes AND upserts by
    consuming table_changes() (O(changes): subtract the old versions
    of touched keys, add the new), landing row-for-row equal to a
    rebuild from the current table."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        merge_lm_counts,
        subtract_lm_counts,
        unigram_lm_counts,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )

    root = str(tmp_path_factory.mktemp("lmfeed")) + "/t"
    t = Table.create(spark, root, "doc_id")
    docs = spark.createDataFrame(
        [
            (1, "red fox jumps"),
            (2, "red dog"),
            (3, "blue fox"),
            (4, "green dog runs"),
            (5, "blue blue sky"),
        ],
        "doc_id bigint, text string",
    )
    t.append(docs)

    def tok(df):
        return df.select("doc_id", F.split(F.col("text"), " ").alias("t"))

    snapshot0 = t.read().localCheckpoint()  # the consumer's last input
    ledger = unigram_lm_counts(tok(snapshot0)).localCheckpoint()
    cursor = 0

    # source table moves on: a delete, an in-place rewrite, an insert
    t.delete([2])
    t.upsert(spark.createDataFrame(
        [(3, "yellow fox")], "doc_id bigint, text string"
    ))
    t.upsert(spark.createDataFrame(
        [(9, "new red words")], "doc_id bigint, text string"
    ))

    # incremental maintenance from the feed — never rescans the corpus
    feed = t.changes(from_batch=cursor).localCheckpoint()
    touched = feed.select("doc_id")
    removed = unigram_lm_counts(
        tok(snapshot0.join(touched, "doc_id", "left_semi"))
    )
    added = unigram_lm_counts(
        tok(feed.filter("op = 'upsert'").select("doc_id", "text"))
    )
    ledger = merge_lm_counts(subtract_lm_counts(ledger, removed), added)

    rebuild = unigram_lm_counts(tok(t.read()))
    assert sorted(map(tuple, ledger.collect())) == sorted(
        map(tuple, rebuild.collect())
    )
    # and the cursor advances to the feed's max batch for next time
    assert feed.agg(F.max("batch")).head()[0] == 3


def test_consume_changes_drives_ledger_over_rounds(
    spark, tmp_path_factory
):
    """Round-10 continuation: the cursor-driven consumer loop
    (``Table.consume_changes``) maintaining a derived LM ledger over
    SEVERAL feed rounds — each step is O(changes in range), and after
    every consumption the ledger equals a from-scratch rebuild."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        merge_lm_counts,
        subtract_lm_counts,
        unigram_lm_counts,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )

    root = str(tmp_path_factory.mktemp("lmloop")) + "/t"
    t = Table.create(spark, root, "doc_id")
    t.append(spark.createDataFrame(
        [(1, "red fox jumps"), (2, "red dog"), (3, "blue fox"),
         (4, "green dog runs")],
        "doc_id bigint, text string",
    ))

    def tok(df):
        return df.select("doc_id", F.split(F.col("text"), " ").alias("t"))

    state = {
        "snap": t.read().localCheckpoint(),
    }
    state["ledger"] = unigram_lm_counts(
        tok(state["snap"])
    ).localCheckpoint()

    def maintain(feed, lo, hi):
        feed = feed.localCheckpoint()
        touched = feed.select("doc_id")
        removed = unigram_lm_counts(
            tok(state["snap"].join(touched, "doc_id", "left_semi"))
        )
        added = unigram_lm_counts(
            tok(feed.filter("op = 'upsert'").select("doc_id", "text"))
        )
        state["ledger"] = merge_lm_counts(
            subtract_lm_counts(state["ledger"], removed), added
        ).localCheckpoint()
        state["snap"] = t.read().localCheckpoint()

    cdir = root + "_lm"

    def check():
        rebuild = unigram_lm_counts(tok(t.read()))
        assert sorted(map(tuple, state["ledger"].collect())) == sorted(
            map(tuple, rebuild.collect())
        )

    t.delete([2])
    t.upsert(spark.createDataFrame(
        [(3, "yellow fox")], "doc_id bigint, text string"
    ))
    assert t.consume_changes(cdir, maintain) == (0, 2)
    check()

    t.upsert(spark.createDataFrame(
        [(9, "new red words")], "doc_id bigint, text string"
    ))
    t.delete([1])
    assert t.consume_changes(cdir, maintain) == (2, 4)
    check()
    assert t.consume_changes(cdir, maintain) is None
