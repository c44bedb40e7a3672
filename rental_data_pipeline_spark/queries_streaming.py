"""Oracle-checked queries for the streaming path (SURVEY §2.8).

``streaming_merge_state`` runs the REAL Structured Streaming pipeline
(landing files → readStream → foreachBatch merge → state table) with
``Trigger.AvailableNow``, then returns the state — which must equal
the one-shot batch fold, so it shares the batch CDC oracle. This is
the strongest cross-engine check available: DuckDB SQL vs a
micro-batched streaming execution.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rental_data_pipeline_spark.queries import _SNAPSHOT_CTE, _event_snapshots, register
from rental_data_pipeline_spark.sources.tables import load_table
from rental_data_pipeline_spark.streaming import (
    incremental_merge_stream,
    read_state,
    read_snapshot_stream,
    windowed_price_stats_stream_exact,
)

_STREAM_CHUNKS = 3

# Landing-file fixtures are pure INPUT (the parquet drops a scraper
# would have produced) — cache them per (sf_dir, label) for the session
# so repeated runs time the streaming engine, not tempdir re-writes.
# State/checkpoint dirs stay fresh per run: those ARE the engine's.
_LANDING_CACHE: dict[tuple[str, str], str] = {}


def _landing_for(sf_dir: str, label: str, snaps: DataFrame) -> str:
    key = (sf_dir, label)
    if key not in _LANDING_CACHE:
        base = tempfile.mkdtemp(prefix=f"rdp_landing_{label}_")
        _write_time_chunks(snaps, f"{base}/landing")
        _LANDING_CACHE[key] = f"{base}/landing"
    return _LANDING_CACHE[key]


def _write_time_chunks(snaps: DataFrame, landing: str) -> None:
    """Write the event history as _STREAM_CHUNKS parquet files in
    ASCENDING time ranges (date terciles): the micro-batch replay then
    processes events in the same global order the batch fold (and its
    oracle) uses. Out-of-order chunks would be processed too (T5: the
    reference has no ordering guard) but would legitimately produce
    different CDC history than the oracle."""
    dates = sorted(
        r[0] for r in snaps.select(F.to_date("updated_date")).distinct().collect()
    )
    n = len(dates)
    cuts = {d: (i * _STREAM_CHUNKS) // n for i, d in enumerate(dates)}
    chunk_expr = F.coalesce(
        *[F.when(F.to_date("updated_date") == F.lit(d), F.lit(c)) for d, c in cuts.items()],
        F.lit(0),
    )
    chunked = snaps.withColumn("__chunk", chunk_expr)
    for i in sorted(set(cuts.values())):
        chunked.where(F.col("__chunk") == i).drop("__chunk").coalesce(1).write.mode(
            "append"
        ).parquet(landing)


@register(
    "streaming_merge_state",
    oracle=f"""
WITH {_SNAPSHOT_CTE}
SELECT offer_id,
       arg_max(price_value, CASE WHEN price_value IS NOT NULL THEN seq END) AS price_value,
       arg_max(is_unpublished, CASE WHEN is_unpublished IS NOT NULL THEN seq END) AS is_unpublished,
       arg_min(updated_date, seq) AS publication_date,
       arg_max(updated_date, CASE WHEN updated_date IS NOT NULL THEN seq END) AS last_active,
       CASE WHEN count(*) FILTER (WHERE price_chg) > 0
            THEN count(*) FILTER (WHERE price_chg) END AS total_price_changes,
       string_agg(CAST(diff AS VARCHAR), ', ' ORDER BY seq)
         FILTER (WHERE price_chg) AS price_changes
FROM ev
GROUP BY offer_id
""",
)
def streaming_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T3: events replayed as micro-batch files through
    readStream → foreachBatch(merge_listings) → state table; the final
    state equals the batch fold (equivalence asserted in
    tests/test_streaming.py) and therefore shares its SQL oracle."""
    snaps = _event_snapshots(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="rdp_stream_q_")
    state, ckpt = f"{base}/state", f"{base}/ckpt"
    landing = _landing_for(sf_dir, "merge", snaps)

    # same state-store sizing rationale as stateful_price_changes below:
    # the merge fold touches ~150 keys per batch; 32 near-empty shuffle
    # partitions per micro-batch is pure task overhead.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = read_snapshot_stream(spark, landing, max_files_per_trigger=1)
        q = incremental_merge_stream(stream, state, ckpt)
        q.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    out = (
        read_state(spark, state)
        .select(
            "offer_id",
            "price_value",
            "is_unpublished",
            "publication_date",
            "last_active",
            "total_price_changes",
            "price_changes",
        )
        .localCheckpoint(eager=True)  # detach from temp files before cleanup
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


_WINDOW_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.LongType()),
        T.StructField("updated_date", T.TimestampNTZType()),
        T.StructField("price_value", T.DoubleType()),
    ]
)


@register(
    "streaming_window_stats",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       count(*) AS n_snapshots,
       count(DISTINCT user_id) AS n_offers,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_price,
       min(value) AS min_price,
       max(value) AS max_price
FROM events
GROUP BY 1
""",
)
def streaming_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 on the REAL streaming engine: events replayed as micro-batch
    files through readStream → tumbling-window aggregation → complete
    output mode → memory sink. Every aggregate is micro-batch
    deterministic (exact distinct via collect_set size, DECIMAL price
    sum, avg derived from that sum), so a DuckDB time_bucket oracle
    value-hash-checks an actual StreamingQuery execution. The
    watermarked production variant (bounded state, late-data eviction)
    is ``windowed_price_stats``, pytest-proven batch≡stream."""
    ev = load_table(spark, "events", sf_dir)
    snaps = ev.select(
        F.col("user_id").alias("offer_id"),
        F.col("ts").alias("updated_date"),
        F.col("value").alias("price_value"),
    )
    landing = _landing_for(sf_dir, "window", snaps)

    # complete-mode window state is ~|windows| rows; 32 near-empty state
    # partitions per micro-batch would be pure task overhead (same
    # sizing rationale as the other streaming slots)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = read_snapshot_stream(
            spark, landing, schema=_WINDOW_STREAM_SCHEMA, max_files_per_trigger=1
        )
        q = (
            windowed_price_stats_stream_exact(stream, "1 hour")
            .writeStream.format("memory")
            .queryName("window_stats_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table("window_stats_stream").localCheckpoint(eager=True)


@register(
    "session_window_stats",
    oracle="""
WITH gapped AS (
  SELECT user_id, ts,
         -- >= not >: Spark's session_window end is EXCLUSIVE, so a gap
         -- of exactly 30 minutes starts a new session
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gapped)
SELECT user_id AS offer_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
""",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per key — the
    gap-merging stateful window Structured Streaming runs with
    ``session_window`` + watermark; evaluated batch-side here so the
    DuckDB oracle can replay the gap detection with lag + running sum."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.col("user_id").alias("offer_id"),
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "offer_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stateful_price_changes",
    oracle="""
WITH p AS (
  SELECT user_id AS offer_id, ts AS updated_date, value AS price_value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events WHERE value IS NOT NULL),
l AS (
  SELECT offer_id, updated_date, price_value AS new_price,
         lag(price_value) OVER (PARTITION BY offer_id ORDER BY seq) AS old_price
  FROM p)
SELECT offer_id, updated_date AS change_ts, old_price, new_price,
       CAST(trunc(new_price) AS BIGINT) - CAST(trunc(old_price) AS BIGINT) AS price_diff
FROM l WHERE old_price IS NOT NULL AND new_price <> old_price
""",
)
def stateful_price_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-stateful/T3: the ``applyInPandasWithState`` change-feed
    operator run through the REAL streaming engine — events replayed
    as ascending-time micro-batch files, one GroupState value per key
    carried across batches, change rows appended to a memory sink.
    The oracle replays the same detection with lag() over non-null
    prices — a full value-hash check on an arbitrary-state streaming
    operator."""
    from rental_data_pipeline_spark.streaming.stateful import price_change_stream

    snaps = _event_snapshots(spark, sf_dir)
    landing = _landing_for(sf_dir, "merge", snaps)

    # state-store partition count is frozen per stream from this conf:
    # size it to key cardinality (150 keys here), not the session's
    # batch-shuffle width — 200 near-empty state partitions x batches
    # is pure per-partition overhead (measured 21 s -> ~7 s at sf0.01)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = read_snapshot_stream(spark, landing, max_files_per_trigger=1)
        q = (
            price_change_stream(stream)
            .writeStream.format("memory")
            .queryName("stateful_changes")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table("stateful_changes").localCheckpoint(eager=True)
