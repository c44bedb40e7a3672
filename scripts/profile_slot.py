#!/usr/bin/env python3
"""Per-slot stage-level profile (guide §1: measure first).

Runs one registry query with the Spark event log enabled (warmup rep +
timed rep, noop sink, same methodology as bench.py), then parses the
event log and prints, per job and stage of the TIMED rep: wall time,
task time, shuffle read/write bytes, and the stage's callsite — so the
expensive stage can be mapped back to an operator before touching code.

Usage: python scripts/profile_slot.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark import queries as registry  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    log_dir = tempfile.mkdtemp(prefix="rdp_eventlog_")
    spark = get_spark(
        "profile_slot",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": log_dir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    fn = qs[name]

    # warmup (JIT/codegen, artifact builds) — untimed
    spark.sparkContext.setJobGroup("warmup", f"warmup {name}")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    times = []
    for rep in range(reps):
        spark.sparkContext.setJobGroup("timed", f"timed {name} rep{rep}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    print(f"\n=== {name}: timed reps {times} (min {min(times)}) ===")

    # parse the event log: single-file format or the rolling v2
    # directory (eventlog_v2_<appId>/events_*)
    paths = [
        p
        for p in glob.glob(f"{log_dir}/{app_id}*")
        + glob.glob(f"{log_dir}/eventlog_v2_{app_id}/events_*")
        if os.path.isfile(p)
    ]
    raw = b""
    for p in sorted(paths):
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rb") as f:
            raw += f.read()
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    for line in raw.splitlines():
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if not isinstance(ev, dict):
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "group": props.get("spark.jobGroup.id", ""),
                "desc": props.get("spark.job.description", ""),
                "t0": ev.get("Submission Time", 0),
            }
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev.get("Completion Time", 0)
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            acc = {
                a.get("Name"): a.get("Value")
                for a in si.get("Accumulables", [])
            }
            stages[sid] = {
                "name": si.get("Stage Name", ""),
                "details": (si.get("Details") or "").split("\n")[0],
                "tasks": si.get("Number of Tasks", 0),
                "t0": si.get("Submission Time", 0),
                "t1": si.get("Completion Time", 0),
                "sr": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                + (acc.get("internal.metrics.shuffle.read.localBytesRead") or 0),
                "sw": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                "task_time": acc.get("internal.metrics.executorRunTime", 0),
                "in": acc.get("internal.metrics.input.bytesRead", 0),
            }

    # keep only the timed rep's jobs
    timed_jobs = {j: v for j, v in jobs.items() if v.get("group") == "timed"}
    if not timed_jobs:
        timed_jobs = jobs
    rows = []
    for sid, s in sorted(stages.items()):
        jid = stage_job.get(sid)
        if jid not in timed_jobs:
            continue
        wall = (s["t1"] - s["t0"]) / 1000 if s["t1"] and s["t0"] else 0
        rows.append((wall, sid, jid, s))
    total_wall = sum(r[0] for r in rows)
    total_task = sum((r[3]["task_time"] or 0) / 1000 for r in rows)
    njobs = len(timed_jobs)
    print(
        f"timed-rep jobs: {njobs}, stages: {len(rows)}, "
        f"sum stage wall: {total_wall:.2f}s, sum task time: {total_task:.1f}s"
    )
    print(f"{'wall_s':>7} {'tasks':>5} {'task_s':>7} {'shufR':>8} {'shufW':>8} {'input':>8}  stage (job) callsite")
    for wall, sid, jid, s in sorted(rows, key=lambda r: -r[0])[:25]:
        print(
            f"{wall:7.2f} {s['tasks']:5d} {(s['task_time'] or 0)/1000:7.1f} "
            f"{(s['sr'] or 0)/1e6:7.1f}M {(s['sw'] or 0)/1e6:7.1f}M {(s['in'] or 0)/1e6:7.1f}M"
            f"  s{sid} (j{jid}) {s['name'][:40]} | {s['details'][:60]}"
        )
    # job-level gaps: time between consecutive jobs (driver-side latency)
    tj = sorted(
        (v.get("t0", 0), v.get("t1", 0), j) for j, v in timed_jobs.items()
    )
    gap_total = 0.0
    prev_end = None
    for t0, t1, j in tj:
        if prev_end is not None and t0 > prev_end:
            gap_total += (t0 - prev_end) / 1000
        prev_end = max(prev_end or 0, t1 or t0)
    span = (tj[-1][1] - tj[0][0]) / 1000 if tj and tj[-1][1] else 0
    print(f"job span {span:.2f}s, inter-job driver gaps {gap_total:.2f}s")


if __name__ == "__main__":
    main()
