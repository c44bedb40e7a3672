#!/usr/bin/env python3
"""How much of the streaming bench slots is Spark's StreamingQuery
floor vs this engine's operators — the round-9 verdict's ask #8.

The three streaming slots (streaming_merge_state, stateful_price_changes,
streaming_window_stats) each run REAL StreamingQuery sessions per call
— that is the proof (a fake micro-batch loop would not exercise
offset/commit logs, state-store checkpoints or watermark eviction).
This script measures, on the SAME landing fixtures and trigger
config as the slots:

- ``floor``       a null query: readStream → foreachBatch(pass) →
                  availableNow. Pays file listing, the per-batch
                  offset/commit WAL round-trip, and query start/stop —
                  with ZERO computation. The irreducible per-session
                  cost of proving anything on the real engine.
- ``floor_read``  the same, but each batch is fully materialized
                  (count) — adds the source scan.
- ``actual``      the registered bench query itself (min of 2).

actual − floor_read ≈ the engine's own operator + state-store work;
floor / actual = the share no operator change can remove. Printed as
one JSON line for the README table.

Usage: python scripts/streaming_floor.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402


def _null_stream(spark, landing, schema, n_parts, materialize):
    from rental_data_pipeline_spark.streaming.incremental import (
        read_snapshot_stream,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    ckpt = tempfile.mkdtemp(prefix="floor_ckpt_")
    try:
        kw = {} if schema is None else {"schema": schema}
        stream = read_snapshot_stream(
            spark, landing, max_files_per_trigger=1, **kw
        )

        def body(df, bid):
            if materialize:
                df.count()

        t0 = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        return round(time.perf_counter() - t0, 2)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "streaming-floor",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rental_data_pipeline_spark import queries as registry
    import rental_data_pipeline_spark.queries_streaming as QS

    qs = registry.queries()
    # build the cached landings once (also what the bench warmup does)
    snaps = registry._event_snapshots(spark, sf_dir)
    merge_landing = QS._landing_for(sf_dir, "merge", snaps)
    late_landing = QS._landing_for(
        sf_dir, "late", QS._late_fixture_frame(spark)
    )
    win_snaps = snaps.drop("is_unpublished", "event_id")
    window_landing = QS._landing_for(sf_dir, "window", win_snaps)

    out: dict[str, dict] = {}
    # (slot, [(landing, schema, n_parts) per StreamingQuery it runs])
    SLOTS = {
        "streaming_merge_state": [(merge_landing, None, 8)],
        "stateful_price_changes": [(merge_landing, None, 8)],
        "streaming_window_stats": [
            (window_landing, QS._WINDOW_STREAM_SCHEMA, 8),
            (late_landing, QS._LATE_STREAM_SCHEMA, 2),
        ],
    }
    for name, sessions in SLOTS.items():
        floor = sum(
            min(
                _null_stream(spark, ld, sch, np, False) for _ in range(2)
            )
            for ld, sch, np in sessions
        )
        floor_read = sum(
            min(
                _null_stream(spark, ld, sch, np, True) for _ in range(2)
            )
            for ld, sch, np in sessions
        )
        actual = min(
            _measure_query(spark, qs[name], sf_dir) for _ in range(2)
        )
        out[name] = {
            "floor_sec": round(floor, 2),
            "floor_read_sec": round(floor_read, 2),
            "actual_sec": round(actual, 2),
            "floor_share": round(floor / actual, 2) if actual else None,
            "n_sessions": len(sessions),
        }
        print(
            f"{name:26s} floor={floor:.2f}s floor+read={floor_read:.2f}s "
            f"actual={actual:.2f}s floor/actual={floor / actual:.0%}",
            flush=True,
        )
    print(json.dumps(out))


def _measure_query(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
