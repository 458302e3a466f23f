"""Cross-PROCESS writer races on one Table root (round 12): the
threaded tests in ``test_table_concurrency.py`` share one JVM, so
they can't prove the claim/ticket primitives hold across separate
filesystems clients — two independent Spark processes can. This is
the deployment shape the CONCURRENCY contract targets (parallel
ingest jobs and a compactor racing from different drivers).

One worker subprocess per role, each building its OWN SparkSession
against the same root; the parent asserts the invariant: every
appended row is served, losers failed loudly (ConcurrentWriteError),
and the pointer names a committed version.

Marked via the module-level guard to keep the default suite light —
two extra JVM boots cost ~40 s.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import ConcurrentWriteError
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import Table

role, root, start_file = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"mp-{role}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
t = Table(spark, root)
# barrier: both processes poll for the parent's go-file so the
# optimize races actually overlap
import os
while not os.path.exists(start_file):
    time.sleep(0.05)
out = {"role": role, "ok": 0, "conflict": 0, "error": None}
try:
    if role == "appender":
        for j in range(4):
            t.append(spark.createDataFrame(
                [(5000 + j, float(j))], "k bigint, v double"))
            out["ok"] += 1
    else:
        for _ in range(3):
            try:
                t.optimize(keep=10)
                out["ok"] += 1
            except ConcurrentWriteError:
                out["conflict"] += 1
except Exception as e:  # noqa: BLE001
    out["error"] = repr(e)
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def test_two_processes_append_and_optimize_never_corrupt(
    spark, tmp_path_factory
):
    base = str(tmp_path_factory.mktemp("mproc"))
    root = f"{base}/t"
    start_file = f"{base}/go"

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import Table

    t = Table.create(spark, root, "k", zone_cols=["k"])
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "k bigint, v double"
        )
    )

    script = _WORKER % {"repo": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, role, root, start_file],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            cwd=REPO,
        )
        for role in ("appender", "compactor", "compactor2")
    ]
    import time

    time.sleep(15)  # let both JVMs boot so the race overlaps
    open(start_file, "w").close()
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        line = [
            ln for ln in out.decode().splitlines()
            if ln.startswith("RESULT:")
        ]
        assert line, out.decode()[-2000:]
        results.append(json.loads(line[0][len("RESULT:"):]))

    by_role = {r["role"]: r for r in results}
    # the appender is lock-free: it must never fail
    assert by_role["appender"]["error"] is None, by_role
    assert by_role["appender"]["ok"] == 4
    # compactors either win or lose LOUDLY with ConcurrentWriteError
    for role in ("compactor", "compactor2"):
        assert by_role[role]["error"] is None, by_role
    assert (
        by_role["compactor"]["ok"] + by_role["compactor2"]["ok"] >= 1
    )

    # the invariant: nothing lost, whatever interleaved across JVMs
    got = sorted(r["k"] for r in Table(spark, root).read().collect())
    assert got == sorted(list(range(10)) + [5000 + j for j in range(4)])
