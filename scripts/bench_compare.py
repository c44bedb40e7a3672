#!/usr/bin/env python3
"""Cross-round bench comparison, normalized for host-speed drift.

Raw seconds are not comparable across rounds: the same committed code
has measured >3x wall-clock differences on this VM (see README). Each
BENCH_r*.json carries `calib_sec` — a fixed pure-compute probe — so the
comparable quantity is t_query / calib_sec.

Usage: python scripts/bench_compare.py BENCH_r03.json BENCH_r04.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, dict]:
    d = json.load(open(path))
    d = d.get("parsed", d)
    calibs = {}
    for key in ("calib_sec", "calib_long_sec", "calib_sched_sec"):
        samples = d.get(key.replace("_sec", "_samples"))
        if samples:  # round >= 5: median of 3 probes (GC-pause robust)
            calibs[key] = sorted(samples)[len(samples) // 2]
        elif d.get(key):
            calibs[key] = d[key]
    return d["queries"], calibs


def pick_calib(ca: dict, cb: dict) -> tuple[float, float]:
    """Prefer the 1G probe (low relative jitter) when both rounds have
    it; fall back to the 200M probe comparable back to round 3."""
    for key in ("calib_long_sec", "calib_sec"):
        if key in ca and key in cb:
            return ca[key], cb[key]
    return 1.0, 1.0


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    (qa, cas), (qb, cbs) = load(sys.argv[1]), load(sys.argv[2])
    ca, cb = pick_calib(cas, cbs)
    common = sorted(set(qa) & set(qb))
    print(f"calib: {ca} -> {cb}   common queries: {len(common)} "
          f"(+{len(set(qb)-set(qa))} new, -{len(set(qa)-set(qb))} gone)")
    # when both rounds carry the scheduling probe, print its drift too:
    # most sf0.1 queries are overhead-bound, so the honest normalized
    # ratio sits BETWEEN the compute-probe and sched-probe columns
    if "calib_sched_sec" in cas and "calib_sched_sec" in cbs:
        sa, sb = cas["calib_sched_sec"], cbs["calib_sched_sec"]
        print(f"sched calib: {sa} -> {sb} "
              f"(overhead-bound normalizer: x{(sa / sb):.2f} on norm column)")
    print(f"{'query':34} {'t_a':>7} {'t_b':>7} {'raw':>6} {'norm':>6}")
    tot_a = tot_b = 0.0
    rows = []
    for q in common:
        raw = qb[q] / qa[q]
        norm = (qb[q] / cb) / (qa[q] / ca)
        tot_a += qa[q]
        tot_b += qb[q]
        rows.append((norm, f"{q:34} {qa[q]:7.2f} {qb[q]:7.2f} {raw:5.2f}x {norm:5.2f}x"))
    for _, line in sorted(rows, reverse=True):
        print(line)
    raw = tot_b / tot_a
    norm = (tot_b / cb) / (tot_a / ca)
    print(f"{'COMMON TOTAL':34} {tot_a:7.2f} {tot_b:7.2f} {raw:5.2f}x {norm:5.2f}x")


if __name__ == "__main__":
    main()
