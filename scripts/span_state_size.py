#!/usr/bin/env python3
"""Measure the span-hash state's size envelope — the round-8 verdict's
"state is O(distinct 10-grams)" caveat, quantified.

Folds the documents table (in 4 monotonic-id chunks, then a final
compaction commit) into a fresh span state at each scale tier and
reports: corpus tokens, distinct spans (state rows), singleton share,
on-disk bytes of the live compacted snapshot, and bytes per distinct
span — for BOTH key encodings: the state-internal binary128 form the
fold writes, and the legacy 32-char hex-string form (the same rows
rewritten with hex keys, identical partition layout), to pin what the
narrow encoding buys. The count columns are near-constant over the
Zipf tail and RLE away; the incompressible random key is the table.

Usage: python scripts/span_state_size.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark.sources.tables import load_table  # noqa: E402
from rental_data_pipeline_spark.streaming.span_stream import (  # noqa: E402
    fold_spans_batch,
)

WINDOW = 10


def parquet_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    return total


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("span-state-size")
    print(
        f"{'tier':24s} {'docs':>7s} {'tokens':>10s} {'spans':>10s} "
        f"{'single%':>8s} {'bin bytes':>10s} {'B/span':>7s} "
        f"{'hex bytes':>10s} {'B/span':>7s}"
    )
    for sf_dir in sf_dirs:
        docs = load_table(spark, "documents", sf_dir).select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        n_tokens = docs.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
        ).collect()[0][0]
        base = tempfile.mkdtemp(prefix="span_size_")
        state = f"{base}/state"
        try:
            # 4 monotonic chunks, then a compaction commit so the live
            # snapshot is ONE full version (the steady-state footprint)
            bounds = [0, 1, 2, 3]
            for i in bounds:
                fold_spans_batch(
                    spark, state,
                    docs.where(F.pmod("doc_id", F.lit(4)) == i),
                    i, window=WINDOW, compact_every=16,
                )
            from rental_data_pipeline_spark.streaming.span_stream import (
                read_span_state,
            )

            st = read_span_state(spark, state)
            stats = st.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("n_docs") == 1).cast("long")).alias("s"),
            ).collect()[0]
            n_spans, n_single = stats["n"], stats["s"]
            # force one compacted snapshot for a clean footprint: write
            # the composed state once per encoding, same layout
            bin_dir = f"{base}/bin"
            hex_dir = f"{base}/hex"
            body = st.select("span_hash", "keeper_id", "n_copies", "n_docs")
            body.repartition(8).write.parquet(bin_dir)
            body.withColumn(
                "span_hash", F.lower(F.hex("span_hash"))
            ).repartition(8).write.parquet(hex_dir)
            bin_b, hex_b = parquet_bytes(bin_dir), parquet_bytes(hex_dir)
            tier = os.path.basename(sf_dir.rstrip("/"))
            print(
                f"{tier:24s} {n_docs:>7d} {n_tokens:>10d} {n_spans:>10d} "
                f"{100.0 * n_single / max(n_spans, 1):>7.1f}% "
                f"{bin_b:>10d} {bin_b / max(n_spans, 1):>7.1f} "
                f"{hex_b:>10d} {hex_b / max(n_spans, 1):>7.1f}"
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
