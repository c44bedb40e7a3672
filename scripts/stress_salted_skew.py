#!/usr/bin/env python3
"""Stress the hot-shingle fallback tiers at forced-skew row counts —
the evidence that df-stratification (not AQE) defuses the straggler.

Round-12 background: AQE's OptimizeSkewedJoin only matches a
sort-merge join whose children are bare ENSURE_REQUIREMENTS shuffles
directly under Sort; the fallback's right side is a persisted
aggregate, so the rule can never fire and a plain anti-join
concentrates a ubiquitous shingle's rows in ONE task. This script
builds an exploded index with one shingle covering most rows and
compares four regimes over identical data:

  broadcast            — the normal guard path (hot set under the cap)
  stratified_fallback  — cap forced to 0: the ubiquitous shingle's df
                         routes it to the ULTRA broadcast tier
                         (map-side drop) when df > ULTRA_DF, else the
                         warm shuffle anti-join
  salted_last_resort   — cap AND ULTRA_DF forced to 0: the salted
                         (shingle, xxhash64(doc) % 32) anti-join
  unsalted_r11_design  — a plain anti-join on `shingle` against the
                         persisted hot set, for the record

Output: one JSON line with per-regime seconds + row parity. Both
fallback tiers must stay within 2x broadcast (exit 1 otherwise).

Usage: python scripts/stress_salted_skew.py [n_hot] [n_cold_keys]
Defaults: 2_000_000 hot rows, 25_000 cold keys x 20 rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rental_data_pipeline_spark.operators import dedup as D  # noqa: E402
from rental_data_pipeline_spark.session import get_spark  # noqa: E402


def build_exploded(spark, n_hot: int, n_cold_keys: int):
    """One ubiquitous data-dependent shingle + a uniform cold tail.
    The hot shingle is computed from the row id (not a literal) so the
    optimizer cannot fold the hot branch away."""
    n = n_hot + n_cold_keys * 20
    return spark.range(n).select(
        F.col("id").alias("doc"),
        F.concat(
            F.lit("shingle_payload_"),
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("id") % n_cold_keys + 1)
            .cast("string"),
        ).alias("shingle"),
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cold = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    spark = get_spark("stress-salted-skew")
    exploded = build_exploded(spark, n_hot, n_cold).persist()
    exploded.count()
    cap = 100  # hot shingle df >> cap; cold keys ~20 each stay under

    def run_capped():
        return D._cap_hot_shingles(exploded, max_doc_freq=cap).count()

    def run_unsalted():
        # the round-11 fallback shape, reproduced for comparison
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > cap)
            .select("shingle")
            .persist()
        )
        n = exploded.join(hot, "shingle", "left_anti").count()
        hot.unpersist()
        return n

    out = {"n_hot": n_hot, "n_cold_keys": n_cold}
    saved_cap = D.HOT_SHINGLE_BROADCAST_CAP
    saved_ultra = D.HOT_SHINGLE_ULTRA_DF
    # warmup (JIT/codegen) then min-of-2 per regime, broadcast first.
    # "stratified" forces the fallback (cap=0): the hot shingle's df
    # decides ultra-vs-warm routing naturally; "salted" additionally
    # forces ULTRA_DF=0 so the last-resort tier runs.
    for label, cap_override, ultra_override, fn in (
        ("broadcast", None, None, run_capped),
        ("stratified_fallback", 0, None, run_capped),
        ("salted_last_resort", 0, 0, run_capped),
        ("unsalted_r11_design", None, None, run_unsalted),
    ):
        if cap_override is not None:
            D.HOT_SHINGLE_BROADCAST_CAP = cap_override
        if ultra_override is not None:
            D.HOT_SHINGLE_ULTRA_DF = ultra_override
        try:
            best_rows = best_dt = None
            for _ in range(2):
                rows, dt = timed(fn)
                if best_dt is None or dt < best_dt:
                    best_rows, best_dt = rows, dt
            out[label] = {"rows": best_rows, "sec": best_dt}
        finally:
            D.HOT_SHINGLE_BROADCAST_CAP = saved_cap
            D.HOT_SHINGLE_ULTRA_DF = saved_ultra

    exploded.unpersist()
    spark.stop()
    expected = n_cold * 20
    out["parity"] = all(
        out[k]["rows"] == expected
        for k in (
            "broadcast",
            "stratified_fallback",
            "salted_last_resort",
            "unsalted_r11_design",
        )
    )
    out["fallback_within_2x_broadcast"] = (
        out["stratified_fallback"]["sec"] <= 2 * out["broadcast"]["sec"] + 1.0
        and out["salted_last_resort"]["sec"]
        <= 2 * out["broadcast"]["sec"] + 1.0
    )
    print(json.dumps(out))
    if not (out["parity"] and out["fallback_within_2x_broadcast"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
