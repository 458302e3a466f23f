"""Per-query profiler: run catalog queries with the Spark event log
enabled and attribute wall time to jobs and stages (guide §1: measure
first; §7.1-7.2: map stages back to operators).

Usage::

    python tools/profile_query.py SF_DIR QUERY [QUERY...] [--runs N]
        [--explain-dir DIR] [--noop]

For each query:

- times ``--runs`` executions (default 2: run 1 warms the JVM/footers,
  run 2 is the steady-state number — both printed);
- labels the jobs with ``setJobDescription`` so the event log maps
  jobs to queries and runs;
- parses the event log afterwards and prints, per job: wall time, and
  per stage: wall time, summed executor run time, shuffle read/write
  bytes and records — the "where is the time" table the Spark UI
  would show, produced headless;
- with ``--explain-dir``, writes ``<query>.txt`` containing
  ``explain('formatted')`` for the judge-checkable plan evidence.

The timed action is ``df.count()`` — the SAME action bench.py times,
so numbers line up; pass ``--noop`` for the noop-sink action (guide
§1.4) when a count() is suspected of pruning work.

Run it ALONE: a concurrent Spark process inflates timings 2-14x
(round-7 lesson, documented in the verify skill).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def parse_event_log(path: str) -> dict:
    """Event-log lines -> {job_id: {desc, wall, stages: {...}}}."""
    jobs: dict[int, dict] = {}
    stage_wall: dict[int, dict] = {}
    stage_tasks: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc,
                    "start": ev.get("Submission Time", 0),
                    "end": None,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev.get("Completion Time", 0)
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stage_wall[sid] = {
                    "name": si.get("Stage Name", ""),
                    "wall": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    )
                    / 1000.0,
                    "n_tasks": si.get("Number of Tasks", 0),
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks.setdefault(
                    sid,
                    {
                        "run": 0.0,
                        "sh_read": 0,
                        "sh_read_rec": 0,
                        "sh_write": 0,
                        "sh_write_rec": 0,
                        "spill": 0,
                        "input": 0,
                    },
                )
                agg["run"] += tm.get("Executor Run Time", 0) / 1000.0
                sr = tm.get("Shuffle Read Metrics") or {}
                agg["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                agg["sh_read_rec"] += sr.get("Total Records Read", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["sh_write"] += sw.get("Shuffle Bytes Written", 0)
                agg["sh_write_rec"] += sw.get("Shuffle Records Written", 0)
                agg["spill"] += tm.get("Disk Bytes Spilled", 0)
                inp = tm.get("Input Metrics") or {}
                agg["input"] += inp.get("Bytes Read", 0)
    for sid, info in stage_wall.items():
        info.update(stage_tasks.get(sid, {}))
        jid = stage_to_job.get(sid)
        if jid in jobs:
            jobs[jid].setdefault("stages", {})[sid] = info
    return jobs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--min-stage-sec", type=float, default=0.02)
    args = ap.parse_args()

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import (
        QUERIES,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import (
        get_spark,
    )

    import shutil

    evdir = "/tmp/spark-events-profile"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    spark.read.parquet(f"{args.sf_dir}/nation.parquet").count()

    timings: dict[str, list[float]] = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}.txt"), "w"
            ) as fh:
                fh.write(plan)
        for r in range(args.runs):
            sc.setJobDescription(f"{name}#run{r}")
            start = time.perf_counter()
            df = fn(spark, args.sf_dir)
            built = time.perf_counter() - start
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings.setdefault(name, []).append(
                time.perf_counter() - start
            )
            # Catalyst phase timings (ms) for THIS DataFrame's last
            # execution — splits driver-side planning from execution
            try:
                phases = dict(
                    df._jdf.queryExecution().tracker().phasesPy4J()
                )
            except Exception:
                try:
                    jm = df._jdf.queryExecution().tracker().phases()
                    it = jm.iterator()
                    phases = {}
                    while it.hasNext():
                        kv = it.next()
                        ph = kv._2()
                        phases[kv._1()] = (
                            ph.endTimeMs() - ph.startTimeMs()
                        )
                except Exception:
                    phases = {}
            timings.setdefault(f"{name}#phases", []).append(
                {"build_s": round(built, 3), **phases}
            )
            sc.setJobDescription(None)

    # flush the event log
    spark.stop()
    logs = []
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        if f.startswith("."):
            continue
        if os.path.isdir(p):
            # Spark 4 rolling event-log dir: events_* files inside
            logs += [
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events")
            ]
        else:
            logs.append(p)
    jobs = {}
    for log in logs:
        jobs.update(parse_event_log(log))

    for name in args.queries:
        runs = ", ".join(f"{t:.2f}s" for t in timings[name])
        print(f"\n=== {name}: runs [{runs}]")
        for ph in timings.get(f"{name}#phases", []):
            print(f"  phases: {ph}")
        for jid in sorted(jobs):
            info = jobs[jid]
            if not info["desc"].startswith(f"{name}#"):
                continue
            wall = (
                ((info["end"] or 0) - info["start"]) / 1000.0
                if info.get("end")
                else float("nan")
            )
            big = [
                (sid, s)
                for sid, s in info.get("stages", {}).items()
                if s["wall"] >= args.min_stage_sec
            ]
            print(
                f"  job {jid} [{info['desc'].split('#')[1]}] "
                f"wall={wall:.2f}s stages={len(info.get('stages', {}))}"
                f" (showing {len(big)} >= {args.min_stage_sec}s)"
            )
            for sid, s in sorted(
                big, key=lambda kv: -kv[1]["wall"]
            ):
                nm = s["name"].split("\n")[0][:70]
                print(
                    f"    stage {sid} wall={s['wall']:.2f}s "
                    f"run={s.get('run', 0):.2f}s tasks={s['n_tasks']} "
                    f"in={fmt_bytes(s.get('input', 0))} "
                    f"shR={fmt_bytes(s.get('sh_read', 0))}"
                    f"/{s.get('sh_read_rec', 0)}r "
                    f"shW={fmt_bytes(s.get('sh_write', 0))}"
                    f"/{s.get('sh_write_rec', 0)}r "
                    f"spill={fmt_bytes(s.get('spill', 0))} :: {nm}"
                )


if __name__ == "__main__":
    main()
