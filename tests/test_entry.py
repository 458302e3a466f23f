"""Driver-contract smoke: entry() flagship, catalog key discipline."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_attr", "num_entities"}


def test_oracle_keys_subset_of_queries(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == 50  # driver records rows for the first 50 only


def test_queries_run_at_smallest_sf(spark):
    q = entrymod.queries()
    # spot-run one per family through the public dict
    for name in ["q1_pricing_summary", "w_latest_snapshot_per_key",
                 "n_language_detect", "e_tumbling_sliding"]:
        assert q[name](spark, SF_DIR).count() > 0
