#!/usr/bin/env python3
"""Stress-measure the hot-shingle doc-frequency cap — the evidence
behind the 100 TB claim for capped n-gram Jaccard dedup.

A single shingle present in every document turns the inverted-index
self-join into a |docs|² join key: at 1M docs that one key alone is a
10¹²-row candidate blow-up. `max_doc_freq` drops shingles whose doc
frequency exceeds the cap BEFORE the self-join, bounding any key's
contribution to cap² pairs.

This script salts every sf document with a shared boilerplate
sentence (each 3-shingle of it lands in ~100% of docs — the worst
case) and compares uncapped vs capped `jaccard_pairs`:
candidate-pair volume, survivor pairs, and wall-clock.

Usage: python scripts/stress_dedup_cap.py [sf_dir]
Prints one JSON line; numbers land in README.md / BENCH notes.
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
from rental_data_pipeline_spark.sources.tables import load_table  # noqa: E402

BOILERPLATE = (
    "subscribe to our newsletter for weekly updates and exclusive offers today"
)


def candidate_pairs(spark, docs, max_doc_freq):
    """Candidate volume the self-join must process: sum over shingles
    of C(df,2) — computed from doc frequencies, not by materializing
    the join, so the uncapped number is measurable even when the join
    itself would be the blow-up."""
    counts, index = D._intersection_counts(docs, 3, "text", "doc_id", max_doc_freq)
    row = counts.agg(
        F.count(F.lit(1)).alias("distinct_pairs"),
        F.sum("n_inter").alias("joined_rows"),
    ).collect()[0]
    index.unpersist()
    counts.unpersist()
    return {"distinct_pairs": row["distinct_pairs"], "joined_rows": row["joined_rows"]}


def timed_pairs(docs, max_doc_freq):
    t0 = time.perf_counter()
    out = D.jaccard_pairs(docs, threshold=0.8, max_doc_freq=max_doc_freq)
    n_pairs = out.count()
    return n_pairs, round(time.perf_counter() - t0, 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-dedup-cap")
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", F.concat_ws(" ", "text", F.lit(BOILERPLATE)).alias("text"))
        .persist()
    )
    n_docs = docs.count()

    out = {"sf_dir": sf_dir, "n_docs": n_docs, "boilerplate_shingles": 10}
    # third regime: the same cap with the hot-set broadcast DISABLED,
    # forcing the SALTED shuffle anti-join fallback that guards the
    # aggressive-cap/large-corpus case where the over-cap set outgrows
    # broadcast range — measures what the guard costs when it fires.
    # The boilerplate shingles are ubiquitous (df = 100% of docs), so
    # this is exactly the skewed regime the salt exists for; the
    # script asserts the fallback stays within 2x the broadcast path.
    # The uncapped blow-up runs LAST: its 100M-row join leaves JVM
    # heap/GC churn that polluted successor regimes by 3-10x when it
    # ran first (measured round 11 — interleaved A/B reads both capped
    # paths at ~1.9 s where the polluted ordering read 25.7 s)
    for label, cap, bcast_cap in (
        ("capped_df5", 5, None),
        ("capped_df5_shuffle_fallback", 5, 0),
        ("uncapped", None, None),
    ):
        saved = D.HOT_SHINGLE_BROADCAST_CAP
        if bcast_cap is not None:
            D.HOT_SHINGLE_BROADCAST_CAP = bcast_cap
        try:
            # warm + timed (min of 2) like bench.py
            best_pairs = best_dt = None
            for _ in range(2):
                n_pairs, dt = timed_pairs(docs, cap)
                spark.catalog.clearCache()
                if best_dt is None or dt < best_dt:
                    best_pairs, best_dt = n_pairs, dt
            out[label] = {
                **candidate_pairs(spark, docs, cap),
                "survivor_pairs": best_pairs,
                "sec": best_dt,
            }
        finally:
            D.HOT_SHINGLE_BROADCAST_CAP = saved
        spark.catalog.clearCache()

    docs.unpersist()
    spark.stop()
    # skew pin: the salted fallback must not reintroduce the straggler
    # the cap exists to kill — hold it to ~2x the broadcast path
    # (+1 s grace for the extra salt-replicated shuffle at tiny SF)
    b, f = out["capped_df5"]["sec"], out["capped_df5_shuffle_fallback"]["sec"]
    out["fallback_within_2x_broadcast"] = f <= 2 * b + 1.0
    print(json.dumps(out))
    if not out["fallback_within_2x_broadcast"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
