"""Declarative data-quality expectations (operators.dq): one-scan row
rules (fail-closed on NULL), key uniqueness, referential integrity
with differing key names, and the combined report frame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dq import (
    check_referential,
    check_rows,
    check_unique,
    dq_report,
)


def _by_rule(df):
    return {
        r["rule"]: (r["n_total"], r["n_violations"], r["ok"])
        for r in df.collect()
    }


def test_row_rules_one_scan_fail_closed(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 50.0)],
        "id bigint, v double",
    )
    rep = _by_rule(check_rows(df, {
        "v_nonneg": "v >= 0",          # NULL violates (fail-closed)
        "v_under_100": "v < 100",
        "id_positive": "id > 0",
    }))
    assert rep["v_nonneg"] == (4, 2, False)      # -5 and NULL
    assert rep["v_under_100"] == (4, 1, False)   # NULL
    assert rep["id_positive"] == (4, 0, True)
    with pytest.raises(ValueError, match="empty rule set"):
        check_rows(df, {})


def test_empty_input_reports_explicit_pass_not_nulls(spark):
    """An EMPTY frame is an explicit pass (0 total, 0 violations,
    ok=TRUE) — not NULL sums whose NULL ok a boolean gate
    (filter(~ok)) silently drops (round-11 fix)."""
    df = spark.createDataFrame([], "id bigint, v double")
    rep = _by_rule(check_rows(df, {"v_nonneg": "v >= 0"}))
    assert rep["v_nonneg"] == (0, 0, True)
    uq = _by_rule(check_unique(df, ["id"]))
    assert uq["unique_id"] == (0, 0, True)


def test_unique_and_referential(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (9, "c"), (None, "d")],
        "fk bigint, x string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    u = _by_rule(check_unique(child, ["fk"]))
    assert u["unique_fk"] == (5, 1, False)  # one extra row for the duplicated fk=1
    r = _by_rule(check_referential(
        child, parent, ["fk"], parent_keys=["pk"]
    ))
    # orphans: fk=9 and fk=NULL (fail-closed)
    assert r["fk_fk"] == (5, 2, False)
    rep = dq_report(
        check_rows(child, {"x_set": "x IN ('a','b','c','d')"}),
        check_unique(child, ["fk"]),
        check_referential(child, parent, ["fk"], parent_keys=["pk"]),
    )
    assert rep.columns == ["rule", "n_total", "n_violations", "ok"]
    assert rep.count() == 3


def test_row_rules_are_one_scan_and_interpolate_one_shuffle(spark):
    """Plan gates: N row rules evaluate in ONE scan (one Aggregate
    over one relation — adding rules must not add jobs), and the
    linear-interpolation resample pays ONE key shuffle beyond the
    bounds agg (the union+window as-of shape)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    rep = check_rows(df, {f"r{i}": f"v < {i + 100}" for i in range(12)})
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # the 12 rules share one aggregate over one range scan; the
    # report fan-out is a local union of 1-row projections
    assert plan.count("Range (0, 100") <= 1

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.timeseries import (
        resample_interpolate,
    )

    ts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0),
         (1, "2024-01-03 00:00:00", 5.0),
         (1, "2024-01-06 00:00:00", 2.0),
         (2, "2024-01-01 00:00:00", 10.0)],
        "k bigint, ts string, v double",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = resample_interpolate(ts, "k", "ts", "v", "1 DAY")
    rows = {(r["k"], str(r["ts"])): r["v"] for r in out.collect()}
    # exact at hits, linear between, ffill past the end
    assert rows[(1, "2024-01-01 00:00:00")] == 1.0
    assert rows[(1, "2024-01-02 00:00:00")] == 3.0   # midpoint of 1 and 5
    assert rows[(1, "2024-01-03 00:00:00")] == 5.0
    assert rows[(1, "2024-01-04 00:00:00")] == 4.0   # 5 + (2-5)*(1/3)
    assert rows[(1, "2024-01-06 00:00:00")] == 2.0
    assert rows[(2, "2024-01-01 00:00:00")] == 10.0  # singleton: ffill
    xplan = out._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-adaptive plan after
    # "== Initial Plan ==" — gate the FINAL plan only
    xplan = xplan.split("== Initial Plan ==")[0]
    # key exchanges only: the bounds agg + one per union leg into the
    # single window pass (EnsureRequirements shuffles each leg; there
    # is no per-row range join and no second window)
    assert xplan.count("Exchange hashpartitioning") <= 3
    # ONE Window node carrying both frames (prev trailing / next
    # leading) over a single sort — chained withColumn produced four
    assert xplan.count("Window [") == 1


def test_expectations_gate_in_pipeline(spark, tmp_path_factory):
    """The DQ rule set as a pipeline stage gate: a clean stage
    passes; a violating stage aborts the run with the gate's
    description."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.pipeline import (
        Pipeline,
        Stage,
        expectations_pass,
    )

    good = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id bigint, v double")
    bad = spark.createDataFrame([(1, 5.0), (1, -1.0)], "id bigint, v double")
    rules = {"v_nonneg": "v >= 0"}

    ok_pipe = Pipeline([
        Stage("s", lambda spark, period, ctx: good,
              gates=(("dq", expectations_pass(rules, ["id"])),)),
    ])
    ok_pipe.run(spark, "2024-01")

    bad_pipe = Pipeline([
        Stage("s", lambda spark, period, ctx: bad,
              gates=(("dq", expectations_pass(rules, ["id"])),)),
    ])
    with pytest.raises(RuntimeError, match="quality gate failed"):
        bad_pipe.run(spark, "2024-01")


def test_stream_gated_append_quarantines_and_replays(
    spark, tmp_path_factory
):
    """Streaming expectations: clean rows reach the facade table,
    violating rows land in the quarantine tagged with the rules they
    failed, and a checkpoint replay converges (no duplicates)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.dq import (
        stream_gated_append,
    )

    base = str(tmp_path_factory.mktemp("sdq"))
    src, q, cp = f"{base}/src", f"{base}/quarantine", f"{base}/cp"
    root = f"{base}/t"
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "k bigint, v double"
    ).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(
        [(4, 7.0), (5, 1000.0)], "k bigint, v double"
    ).coalesce(1).write.parquet(f"{src}/f2")
    # flat source dir with two files -> two micro-batches
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        shutil.copy(f, f"{src}/data{i}.parquet")
    shutil.rmtree(f"{src}/f1")
    shutil.rmtree(f"{src}/f2")

    t = Table.create(spark, root, "k")
    rules = {"v_nonneg": "v >= 0", "v_under_100": "v < 100"}
    stream_gated_append(
        t, src, "k bigint, v double", cp, rules, q
    ).awaitTermination()

    assert sorted(r["k"] for r in t.read().collect()) == [1, 4]
    quar = spark.read.option("basePath", q).parquet(q)
    got = {
        r["k"]: sorted(r["__failed_rules"]) for r in quar.collect()
    }
    assert got == {
        2: ["v_nonneg"],
        3: ["v_nonneg", "v_under_100"],  # NULL fails closed on both
        5: ["v_under_100"],
    }

    # drained checkpoint replay: nothing re-processes, nothing dups
    stream_gated_append(
        t, src, "k bigint, v double", cp, rules, q
    ).awaitTermination()
    assert sorted(r["k"] for r in t.read().collect()) == [1, 4]
    assert spark.read.option("basePath", q).parquet(q).count() == 3
