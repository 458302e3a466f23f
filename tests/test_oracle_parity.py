"""In-suite oracle parity spot check: a representative query per
family compared against DuckDB at sf0.001 (the full sweep lives in
tools/parity.py; this keeps `pytest` self-contained against oracle
drift)."""

from __future__ import annotations

import duckdb
import pytest

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import (
    ORACLES,
    QUERIES,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.catalog import (
    TABLES,
)
from tests.conftest import SF_DIR
from tools.parity import table_hash

SPOT = [
    "q1_pricing_summary",
    "a_nested_histogram",
    "j_asof_join",
    "w_latest_snapshot_per_key",
    "u_union_dedup_merge",
    "n_sentiment_selective",
    "d_exact_dedup",
    "s_knn_bruteforce",
    "e_session_window",
    "m_binary_frames",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SPOT)
def test_spark_matches_duckdb(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(list(sdf.columns), srows) == table_hash(ocols, orows)
