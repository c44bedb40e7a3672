#!/usr/bin/env python3
"""Quantify bucket-pruned state maintenance vs full rewrite.

Builds a state table of N keys via a seed fold, then folds a small
batch (K keys) twice: once through the bucket-pruned delta path
(compact_every high) and once forced through the full-snapshot path
(compact_every=1 → every commit is a full rewrite, the reference's
load-all/rewrite-all shape). Reports per-fold wall-clock, bytes
written, and files written — the numbers behind the round-5 claim
that per-batch I/O is O(touched buckets), not O(|state|).

Usage: python scripts/stress_state_buckets.py [n_keys] [batch_keys]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402


def dir_stats(path: str, exclude: set[str]) -> tuple[int, int]:
    """(bytes, files) of parquet data under version dirs not in
    ``exclude``."""
    total, files = 0, 0
    for v in glob.glob(f"{path}/v_*"):
        if os.path.basename(v) in exclude:
            continue
        for root, _, names in os.walk(v):
            for n in names:
                if n.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, n))
                    files += 1
    return total, files


def run(spark, n_keys: int, batch_keys: int, compact_every: int) -> dict:
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.streaming import (
        incremental_merge_stream,
        read_snapshot_stream,
    )
    from rental_data_pipeline_spark.streaming.incremental import SNAPSHOT_SCHEMA

    base = tempfile.mkdtemp(prefix="state_stress_")
    landing, state, ckpt = f"{base}/landing", f"{base}/state", f"{base}/ckpt"

    seed = spark.range(n_keys).select(
        F.col("id").alias("offer_id"),
        F.to_timestamp(F.lit("2024-01-01 10:00:00")).alias("updated_date"),
        (F.col("id") % 1000 + 1).cast("double").alias("price_value"),
        F.lit(False).alias("is_unpublished"),
        F.col("id").alias("event_id"),
    )
    seed.coalesce(1).write.mode("append").parquet(landing)
    batch = seed.where(F.col("offer_id") < batch_keys).select(
        "offer_id",
        F.to_timestamp(F.lit("2024-01-02 10:00:00")).alias("updated_date"),
        (F.col("price_value") + 10).alias("price_value"),
        "is_unpublished",
        (F.col("event_id") + n_keys).alias("event_id"),
    )

    def fold_available():
        q = incremental_merge_stream(
            read_snapshot_stream(spark, landing, SNAPSHOT_SCHEMA, max_files_per_trigger=1),
            state, ckpt, compact_every=compact_every, keep_versions=100,
            # production bucket count: pruning only bites when batches
            # touch a small fraction of buckets (at the default 16, any
            # batch over ~50 keys hits them all)
            n_buckets=256,
        )
        q.awaitTermination(600)

    fold_available()  # seed fold (full snapshot either way)
    pre = {os.path.basename(v) for v in glob.glob(f"{state}/v_*")}

    batch.coalesce(1).write.mode("append").parquet(landing)
    t0 = time.perf_counter()
    fold_available()
    dt = round(time.perf_counter() - t0, 2)
    wrote_bytes, wrote_files = dir_stats(state, exclude=pre)
    shutil.rmtree(base, ignore_errors=True)
    return {"sec": dt, "mb_written": round(wrote_bytes / 1e6, 2), "files": wrote_files}


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("state_stress")
    spark.sparkContext.setLogLevel("ERROR")
    pruned = run(spark, n_keys, batch_keys, compact_every=1000)
    full = run(spark, n_keys, batch_keys, compact_every=1)
    print(f"state={n_keys} keys, batch={batch_keys} keys")
    print(f"bucket-pruned delta: {pruned}")
    print(f"full rewrite       : {full}")
    print(
        f"I/O ratio: {full['mb_written'] / max(pruned['mb_written'], 0.01):.0f}x "
        f"bytes, {full['files']}/{pruned['files']} files"
    )


if __name__ == "__main__":
    main()
