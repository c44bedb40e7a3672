#!/usr/bin/env python3
"""Whole-registry slot profile (guide §1): one session, every query.

For each registry query: one untimed warmup rep, then ``reps`` timed
reps (noop sink, clearCache between reps — bench.py methodology), with
the Spark event log on. Prints one TSV row per slot: min rep seconds,
jobs per rep, summed stage wall, summed task seconds, and inter-job
driver gap seconds for the LAST timed rep — the cheap way to tell a
compute-bound slot (task_s high) from a driver-latency-bound one
(gaps high, jobs many) across the whole suite.

Usage: python scripts/profile_all.py [sf_dir] [reps] [query ...]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])
    log_dir = tempfile.mkdtemp(prefix="rdp_eventlog_all_")
    spark = get_spark(
        "profile_all",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": log_dir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in qs if not only or n in only]

    times: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobGroup("warmup", f"warmup {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        for rep in range(reps):
            spark.sparkContext.setJobGroup(f"timed:{name}:{rep}", name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

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
                "t0": ev.get("Submission Time", 0),
            }
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {
                a.get("Name"): a.get("Value")
                for a in si.get("Accumulables", [])
            }
            stages[si["Stage ID"]] = {
                "t0": si.get("Submission Time", 0),
                "t1": si.get("Completion Time", 0),
                "task_time": acc.get("internal.metrics.executorRunTime", 0),
            }

    print(
        f"{'slot':35} {'min_s':>7} {'jobs':>5} {'stage_wall':>10} "
        f"{'task_s':>8} {'gaps_s':>7}"
    )
    for name in names:
        grp = f"timed:{name}:{reps - 1}"
        jids = sorted(j for j, v in jobs.items() if v["group"] == grp)
        wall = task = gaps = 0.0
        prev_end = None
        for j in jids:
            v = jobs[j]
            if prev_end is not None and v["t0"] > prev_end:
                gaps += (v["t0"] - prev_end) / 1000
            prev_end = max(prev_end or 0, v.get("t1", v["t0"]))
        for sid, s in stages.items():
            if stage_job.get(sid) in jids:
                if s["t1"] and s["t0"]:
                    wall += (s["t1"] - s["t0"]) / 1000
                task += (s["task_time"] or 0) / 1000
        print(
            f"{name:35} {min(times[name]):7.3f} {len(jids):5d} "
            f"{wall:10.2f} {task:8.1f} {gaps:7.2f}"
        )


if __name__ == "__main__":
    main()
