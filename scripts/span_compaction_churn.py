#!/usr/bin/env python3
"""Span-state MAINTENANCE churn, measured — the round-9 verdict's one
unmeasured scale cost: not "how big is the state" (span_state_size.py)
or "is the fold flat" (stress_streaming_folds.py, whose tiny 12-token
docs leave the span table overhead-dominated), but how many BYTES the
state layout rewrites per folded batch once the accumulated state
dwarfs the batch.

For each tier (1x / 10x accumulated state) this script seeds a span
state from synthetic ~48-token docs (39 window-10 spans/doc — a
realistic span:doc ratio), compacts it to one base slice, then
measures steady-state work for a FIXED 200-doc batch:

- ``delta``   sec + bytes written by a plain fold (no compaction due)
- ``l0``      sec + bytes written by the fold that trips the level-0
              compaction (the amortized rewrite the compaction cadence
              schedules: merges the accumulated BATCH-sized slices,
              never the base)
- ``full``    sec + bytes of a forced full compaction (the
              migration-only cost: what ``rebucket_tiered`` pays)
- ``read``    sec to materialize the merged duplicated-span report
              (merge-on-read cost at the tier's slice count)

History: under the previous merge-on-write layout the "delta" measured
O(state) — 17.4 MB written per 200-doc fold at 30 MB state, 178.9 MB
at 313 MB state (every bucket touched by uniform span hashes; no
bucket count can fix a batch whose keys hit every bucket). At the
README's projected ~16 TB production state that is terabytes rewritten
per batch. The size-tiered layout (``streaming/tiered.py``) makes
delta and l0 O(batch) — constant across tiers — leaving only the
explicit, offline ``full`` as O(state).

Usage: python scripts/span_compaction_churn.py [1x 10x ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark.streaming.span_stream import (  # noqa: E402
    _reduce_span_stats,
    fold_spans_batch,
    read_duplicated_spans,
)
from rental_data_pipeline_spark.streaming.tiered import (  # noqa: E402
    maybe_compact,
)

WINDOW = 10
TOKENS_PER_DOC = 48  # 39 spans/doc at window 10
BATCH_DOCS = 200
COMPACT_EVERY = 16
TIERS = {"1x": 20_000, "10x": 200_000}


def _docs(spark, n: int, start: int = 0):
    # per-doc-unique token streams: no cross-doc span overlap, so the
    # state is all Zipf-tail singletons — the worst (and measured
    # dominant) case for state size
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), F.col("id").cast("string"))
                for j in range(TOKENS_PER_DOC)
            ],
        ).alias("text"),
    )


def parquet_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for nm in names:
            if nm.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, nm))
    return total


def _dir_set(state: str) -> dict[str, int]:
    """Top-level state subdirs -> parquet bytes (one snapshot)."""
    out = {}
    if not os.path.isdir(state):
        return out
    for d in os.listdir(state):
        p = os.path.join(state, d)
        if os.path.isdir(p):
            out[d] = parquet_bytes(p)
    return out


def _measure(state: str, fn) -> dict:
    """Run fn(); return wall sec + parquet bytes WRITTEN (bytes of
    dirs created or grown, before counting deletions)."""
    before = _dir_set(state)
    t0 = time.perf_counter()
    fn()
    sec = time.perf_counter() - t0
    after = _dir_set(state)
    written = sum(
        b - before.get(d, 0) for d, b in after.items() if b > before.get(d, 0)
    )
    return {"sec": round(sec, 2), "written_mb": round(written / 1e6, 2)}


def run_tier(spark, name: str, n_docs: int) -> dict:
    base = tempfile.mkdtemp(prefix=f"span_churn_{name}_")
    state = f"{base}/state"
    try:
        # seed the accumulated state, then compact to ONE base slice
        # (the steady-state shape after a long stream)
        t0 = time.perf_counter()
        chunk = n_docs // 4
        for i in range(4):
            fold_spans_batch(
                spark, state, _docs(spark, chunk, start=i * chunk), i,
                window=WINDOW, compact_every=10**6,
            )
        maybe_compact(spark, state, _reduce_span_stats, force_full=True)
        seed_sec = round(time.perf_counter() - t0, 1)
        state_mb = round(parquet_bytes(state) / 1e6, 2)

        nxt = [100]

        def fold_once(compact_every: int) -> dict:
            bid = nxt[0]
            nxt[0] += 1
            return _measure(
                state,
                lambda: fold_spans_batch(
                    spark, state,
                    _docs(spark, BATCH_DOCS, start=10_000_000 + bid * BATCH_DOCS),
                    bid, window=WINDOW, compact_every=compact_every,
                ),
            )

        # steady-state DELTA folds (no compaction due)
        deltas = [fold_once(10**6) for _ in range(3)]
        # accumulate to COMPACT_EVERY level-0 slices, then measure the
        # fold that trips the L0 compaction (the amortized path)
        while len([d for d in os.listdir(state) if d.startswith("b_")]) < (
            COMPACT_EVERY - 1
        ):
            fold_once(10**6)
        l0 = fold_once(COMPACT_EVERY)
        # merge-on-read cost at the post-compaction slice count
        t0 = time.perf_counter()
        n_dup = read_duplicated_spans(spark, state).count()
        read_sec = round(time.perf_counter() - t0, 2)
        # forced FULL compaction — the offline migration cost
        full = _measure(
            state,
            lambda: maybe_compact(
                spark, state, _reduce_span_stats, force_full=True
            ),
        )
        return {
            "docs": n_docs,
            "state_mb": state_mb,
            "seed_sec": seed_sec,
            "delta": deltas,
            "delta_sec_min": min(d["sec"] for d in deltas),
            "delta_written_mb_min": min(d["written_mb"] for d in deltas),
            "l0_compact": l0,
            "read_sec": read_sec,
            "n_duplicated": n_dup,
            "full_compact": full,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("span-churn")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name, n_docs in TIERS.items():
        if only and name not in only:
            continue
        results[name] = run_tier(spark, name, n_docs)
        r = results[name]
        print(
            f"{name:4s} docs={r['docs']:>7d} state={r['state_mb']:>8.1f}MB "
            f"delta: {r['delta_sec_min']}s/{r['delta_written_mb_min']}MB  "
            f"l0: {r['l0_compact']['sec']}s/{r['l0_compact']['written_mb']}MB  "
            f"read: {r['read_sec']}s  "
            f"full: {r['full_compact']['sec']}s/{r['full_compact']['written_mb']}MB",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
