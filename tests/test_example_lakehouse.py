"""Tests: the end-to-end lakehouse DAG (examples.lakehouse) —
pruned + CDC-merged serving equals the unpruned sequential-MERGE
ground truth, the optimized snapshot equals the fully merged table,
and a replayed period converges (batch partitions, manifests, CDC
batches all rewrite idempotently)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.lakehouse import (
    build_pipeline,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    load,
)
from tests.conftest import SF_DIR


def _expected_table(spark, lo_hi_list):
    """Ground truth: ingest slices, replay CDC sequentially in plain
    python semantics — the full merged table."""
    (ev,) = load(spark, SF_DIR, "events")
    rows = {}
    for lo, hi in lo_hi_list:
        batch = (
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .select("event_id", "user_id", "event_type", "value")
            .collect()
        )
        for r in batch:
            rows[r["event_id"]] = (
                r["event_id"], r["user_id"], r["event_type"], r["value"]
            )
        for r in batch:
            eid = r["event_id"]
            if eid % 101 == 0:
                rows.pop(eid, None)
            elif eid % 103 == 0:
                rows[eid] = (
                    eid, r["user_id"], r["event_type"], r["value"] * 2
                )
    return rows


def _expected_serve(spark, lo_hi_list):
    """The full merged table with the serve filters applied."""
    rows = _expected_table(spark, lo_hi_list)
    ids = set(range(0, 4000, 103))
    return sorted(
        t for t in rows.values()
        if t[0] in ids and t[3] is not None and 0.0 <= t[3] <= 400.0
    )


def test_lakehouse_serve_and_snapshot_and_replay(spark, tmp_dir):
    wd = f"{tmp_dir}/lake"
    pipe = build_pipeline(SF_DIR, wd)

    run0 = pipe.run(spark, "0:1500")
    got0 = sorted(map(tuple, run0.results["serve"].collect()))
    assert got0 == _expected_serve(spark, [(0, 1500)])
    assert got0, "serve returned nothing — the invariant is vacuous"

    run1 = pipe.run(spark, "1500:3000")
    got1 = sorted(map(tuple, run1.results["serve"].collect()))
    assert got1 == _expected_serve(spark, [(0, 1500), (1500, 3000)])

    # the optimized snapshot equals the fully merged table — both the
    # facade's own full read and the python sequential-MERGE replay
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        read_table,
    )

    snap = sorted(map(tuple, run1.results["optimize"].collect()))
    assert snap == sorted(
        map(tuple, read_table(spark, f"{wd}/table").collect())
    )
    assert snap == sorted(
        _expected_table(spark, [(0, 1500), (1500, 3000)]).values()
    )
    # deletes are physically absent from the snapshot
    assert (
        run1.results["optimize"].filter("event_id % 101 = 0").count() == 0
    )

    # replay period 1: partitions, manifests, and the pinned CDC
    # batch all rewrite — served rows and snapshot content identical
    run2 = pipe.run(spark, "1500:3000")
    assert sorted(map(tuple, run2.results["serve"].collect())) == got1
    assert sorted(map(tuple, run2.results["optimize"].collect())) == snap
