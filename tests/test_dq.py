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
