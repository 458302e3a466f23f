"""Shared fixtures: one SparkSession per test session, repo-local tmp."""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def tmp_dir():
    d = REPO / ".tmp" / "pytest"
    shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
