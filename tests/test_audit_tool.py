"""The plan-invariant audit CLI (tools/audit_plans.py) runs green as
part of the suite, so every `pytest tests/` enforces the full audited
family — not just the subset mirrored in test_plans.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_audit_plans_main_exits_zero(spark, monkeypatch, capsys):
    sys.path.insert(0, str(REPO / "tools"))
    import audit_plans

    # main() reads sys.argv[1] for the sf dir; plans are only built,
    # never executed, so the small factor keeps this cheap.
    monkeypatch.setattr(sys, "argv", ["audit_plans.py", "/root/testdata/sf0.01"])
    audit_plans.main()  # sys.exit(1) on any violation → test error
    out = capsys.readouterr().out
    assert "plan invariants: OK" in out
