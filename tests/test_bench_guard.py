"""Tests: the contended-bench guard (bench.is_contended) — the
round-8 incident (a co-tenant inflated the first bench run 8x and
only a manual re-run caught it) codified as code, not tribal
knowledge."""

from __future__ import annotations

import bench


def test_idle_host_not_contended():
    assert not bench.is_contended(0.0, 32)
    assert not bench.is_contended(1.9, 32)
    # just under a quarter of the cores
    assert not bench.is_contended(7.9, 32)


def test_busy_host_contended():
    # a competing 32-thread Spark job reads ~32
    assert bench.is_contended(32.0, 32)
    assert bench.is_contended(8.0, 32)


def test_small_host_floor():
    # the 2.0 floor keeps tiny-cpu hosts from flagging background
    # jitter, but a genuinely busy 4-cpu host still flags
    assert not bench.is_contended(1.5, 4)
    assert bench.is_contended(2.0, 4)


def test_read_load1_parses_proc():
    v = bench.read_load1()
    # linux container: must parse; value is a non-negative float
    assert v is None or v >= 0.0


def test_drift_ratio_median_of_canaries():
    from bench import drift_ratio

    committed = {"q1_pricing_summary": 1.0, "j_left_enrich_fk": 0.5,
                 "w_moving_frames": 0.25}
    # uniform 1.3x inflation reads as 1.3
    current = {k: v * 1.3 for k, v in committed.items()}
    assert drift_ratio(current, committed) == 1.3
    # one genuinely regressed canary must NOT read as run-level drift
    current = dict(committed)
    current["q1_pricing_summary"] = 10.0
    assert drift_ratio(current, committed) == 1.0
    # missing / zero committed references drop out; none left -> None
    assert drift_ratio({"q1_pricing_summary": 1.0}, {}) is None
    assert drift_ratio(
        {"q1_pricing_summary": 1.0}, {"q1_pricing_summary": 0.0}
    ) is None
    # subset overlap still works
    assert drift_ratio(
        {"q1_pricing_summary": 2.0}, {"q1_pricing_summary": 1.0}
    ) == 2.0


def test_host_probe_ms_positive_and_fast():
    # tiny probe: sanity that the contention probe runs and returns ms
    v = bench.host_probe_ms(n_threads=4, reps=50)
    assert v is not None and 0.0 < v < 10_000.0
