"""Self-certifying rows-only queries (round 6): every row's ``ok``
invariant column must hold at test scale, so the driver's recorded
rows carry reviewable evidence, not just row counts.

Each query's docstring defines its invariant; this suite pins that the
planted checks (twin coverage, banding exhaustiveness, exactly-once,
stride arithmetic, hash-predicate membership, pack prefix layout,
decontamination recall, ANN recall floors) all pass — a regression in
any operator flips ``ok`` to false here before the driver sees it.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

SELF_CERTIFYING = [
    "d_minhash_dup_clusters",
    "s_near_dup_lsh_blocked",
    "m_multimodal_pipeline",
    "d_decontaminate",
    "c_pack_sequences",
    "s_ann_methods",
    # round 8: ok = independent in-core degree recount == reported
    # core_degree AND >= k
    "g_kcore_extract",
]


@pytest.mark.parametrize("name", SELF_CERTIFYING)
def test_invariant_column_all_true(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert "ok" in df.columns, f"{name} lost its invariant column"
    rows = df.collect()
    assert rows, f"{name} returned no rows"
    bad = [r for r in rows if not r["ok"]]
    assert not bad, f"{name}: {len(bad)} rows failed their invariant: {bad[:3]}"


def test_minhash_coverage_rows_present(spark):
    rows = entrymod.queries()["d_minhash_dup_clusters"](spark, SF_DIR).collect()
    slices = {r["slice"] for r in rows}
    assert {"twin_coverage_cluster", "twin_coverage_simhash"} <= slices


def test_decontaminate_coverage_rows_present(spark):
    rows = entrymod.queries()["d_decontaminate"](spark, SF_DIR).collect()
    planted = {r["planted"] for r in rows}
    assert {"coverage_verbatim", "coverage_fragment13"} <= planted


def test_lsh_blocked_twin_coverage_row_present(spark):
    """The twin_coverage certification must FAIL CLOSED: the row is
    anchored on a literal 1-row frame and left-joins the observed
    count, so it exists (with ok=false) even if recall collapses to
    zero — the round-7 fix for the groupBy-over-empty-frame fail-open
    seam (same pattern fixed in plans.dedup / plans.curation)."""
    rows = entrymod.queries()["s_near_dup_lsh_blocked"](spark, SF_DIR).collect()
    cov = [r for r in rows if r["slice"] == "twin_coverage"]
    assert len(cov) == 1, f"expected exactly one twin_coverage row: {cov}"
    assert cov[0]["ok"] and cov[0]["id_b"] == 50
