#!/usr/bin/env python3
"""Stress the sharded two-level top-k / bottom-k against the
single-window forms at forced group skew — the round-13 evidence.

Builds a frame where ONE group holds ~95% of the rows (the shape a
dominant language / event type takes at corpus scale) and compares,
over identical persisted data:

  single_window   — plain row_number over (group) + rank filter.
                    NOT a whole-group sort: Spark's
                    InferWindowGroupLimit inserts a map-side
                    WindowGroupLimit, so each partition forwards at
                    most k rows per group. Its residual cost is the
                    REDUCE tail (P·k rows through one task per
                    group), invisible at local[32]'s P=32 but 10^6+
                    rows at a 100 TB scan's partition count.
  sharded_topk    — operators/topk.topk_per_group: the extra shard
                    level that caps the reduce task; locally this
                    MEASURES THE OVERHEAD of the extra exchange
                    (expected: slightly slower here, bounded 2x).
  single_bottomk  — the pre-r13 bottom-k sketch shape, inline for
                    the record. The per-group COUNT window between
                    the shuffle and the rank blocks the group-limit
                    pushdown entirely, so this one really does sort
                    the whole 20M-row group in one task.
  sharded_bottomk — operators/sketch.bottomk_sample_state (shipped):
                    must be MUCH faster (measured ~12x) — this is
                    the r12-VERDICT straggler the rework removed.

Row/value parity is asserted between each pair (the sharded forms
are provably identical; this checks it at stress scale). Output: one
JSON line with per-regime seconds. Gates (exit 1 otherwise):
sharded_topk <= 2x single_window (overhead bound at a P where the
shard level cannot win) and sharded_bottomk <= 0.5x single_bottomk
(the straggler fix must show).

Usage: python scripts/stress_topk_skew.py [n_hot] [n_cold_keys]
Defaults: 20_000_000 hot rows, 50 cold groups x 20_000 rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rental_data_pipeline_spark.operators.sketch import (  # noqa: E402
    bottomk_sample_state,
)
from rental_data_pipeline_spark.operators.topk import topk_per_group  # noqa: E402
from rental_data_pipeline_spark.session import get_spark  # noqa: E402


def build(spark, n_hot: int, n_cold_groups: int, n_cold_rows: int):
    """One dominant group + a uniform tail; value/key derived from the
    row id so nothing constant-folds."""
    n = n_hot + n_cold_groups * n_cold_rows
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("g"), (F.col("id") % n_cold_groups).cast("string"))
        )
        .alias("g"),
        (F.xxhash64("id") % 1_000_000).alias("v"),
        F.col("id").alias("key"),
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_cold_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = 64
    spark = get_spark("stress-topk-skew")
    df = build(spark, n_hot, n_cold_groups, 20_000).persist()
    df.count()
    order = [F.col("v").desc(), F.col("key")]

    def run_single_topk():
        w = Window.partitionBy("g").orderBy(*order)
        return sorted(
            map(
                tuple,
                df.withColumn("r", F.row_number().over(w))
                .where(F.col("r") <= k)
                .drop("r")
                .collect(),
            )
        )

    def run_sharded_topk():
        return sorted(
            map(
                tuple,
                topk_per_group(
                    df, ["g"], order, k, F.xxhash64("key"), n_shards=64
                ).collect(),
            )
        )

    def run_single_bottomk():
        # pre-r13 sketch shape, inline for the record
        h = F.md5(F.concat(F.lit("sq"), F.col("key").cast("string")))
        w = Window.partitionBy("g").orderBy(F.col("__h"), F.col("key"))
        return sorted(
            map(
                tuple,
                df.select("g", "v", "key", h.alias("__h"))
                .withColumn(
                    "__n", F.count(F.lit(1)).over(Window.partitionBy("g"))
                )
                .withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= k)
                .drop("__rk", "__h")
                .collect(),
            )
        )

    def run_sharded_bottomk():
        return sorted(
            map(
                tuple,
                bottomk_sample_state(df, ["g"], "v", "key", k=k, n_shards=64)
                .drop("__h")
                .collect(),
            )
        )

    out = {"n_hot": n_hot, "n_cold_groups": n_cold_groups, "k": k}
    results = {}
    for label, fn in (
        ("single_window", run_single_topk),
        ("sharded_topk", run_sharded_topk),
        ("single_bottomk", run_single_bottomk),
        ("sharded_bottomk", run_sharded_bottomk),
    ):
        best_rows = best_dt = None
        for _ in range(2):  # warmup then measure; keep the best
            rows, dt = timed(fn)
            if best_dt is None or dt < best_dt:
                best_rows, best_dt = rows, dt
        results[label] = best_rows
        out[label] = {"rows": len(best_rows), "sec": best_dt}

    df.unpersist()
    spark.stop()
    out["topk_parity"] = results["single_window"] == results["sharded_topk"]
    out["bottomk_parity"] = (
        results["single_bottomk"] == results["sharded_bottomk"]
    )
    out["ok"] = (
        out["topk_parity"]
        and out["bottomk_parity"]
        and out["sharded_topk"]["sec"] <= 2.0 * out["single_window"]["sec"]
        and out["sharded_bottomk"]["sec"]
        <= 0.5 * out["single_bottomk"]["sec"]
    )
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
