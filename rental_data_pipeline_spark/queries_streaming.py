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
    different CDC history than the oracle. A frame carrying an explicit
    ``__chunk`` column (the late-data fixture) chunks by it instead.

    The chunk FILES are written driver-side with pyarrow after one
    Spark collect: the landing simulates externally-arriving crawl
    drops (pure fixture input, never the measured operator), and the
    per-chunk Spark write jobs this replaces each carried a distinct
    filter literal — a fresh whole-stage-codegen compile per chunk,
    measured ~3 s/chunk on a cold session, i.e. ~20 s of landing-setup
    noise polluting every streaming slot's cold time. mtimes are set
    strictly increasing so FileStreamSource's (modificationTime, path)
    ordering replays chunks deterministically in chunk order."""
    import os as _os
    import time as _time

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from pyspark.sql import types as T

    if "__chunk" in snaps.columns:
        chunked = snaps.withColumnRenamed("__chunk", "__c")
    else:
        dates = sorted(
            r[0] for r in snaps.select(F.to_date("updated_date")).distinct().collect()
        )
        n = len(dates)
        cuts = {d: (i * _STREAM_CHUNKS) // n for i, d in enumerate(dates)}
        chunk_expr = F.coalesce(
            *[F.when(F.to_date("updated_date") == F.lit(d), F.lit(c)) for d, c in cuts.items()],
            F.lit(0),
        )
        chunked = snaps.withColumn("__c", chunk_expr)

    fields = [f for f in chunked.schema.fields if f.name != "__c"]
    _PA = {
        T.LongType: _pa.int64(),
        T.IntegerType: _pa.int32(),
        T.DoubleType: _pa.float64(),
        T.FloatType: _pa.float32(),
        T.BooleanType: _pa.bool_(),
        T.StringType: _pa.string(),
        # session timezone is pinned UTC, so collected naive datetimes
        # ARE UTC wall-clock; write adjusted-to-UTC micros (the standard
        # TIMESTAMP_MICROS Spark maps back to TimestampType)
        T.TimestampType: _pa.timestamp("us", tz="UTC"),
        # NTZ columns (the nanosAsLong-converted events table) write as
        # naive micros — isAdjustedToUTC=false, exactly what Spark's own
        # writer produces for TIMESTAMP_NTZ
        T.TimestampNTZType: _pa.timestamp("us"),
    }
    if any(type(f.dataType) not in _PA for f in fields):
        # type not in the mapping (date, decimal, array, ...): fall back
        # to per-chunk Spark writes — slower (a codegen compile per
        # chunk literal) but type-complete
        for i in sorted(r[0] for r in chunked.select("__c").distinct().collect()):
            chunked.where(F.col("__c") == i).drop("__c").coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        return
    # fixture tables only (bounded): the collect trades a driver pass
    # for N+1 Spark write jobs, each of which pays a fresh codegen
    # compile for its chunk-filter literal
    by_chunk: dict[int, list] = {}
    for r in chunked.collect():
        by_chunk.setdefault(r["__c"], []).append(r)
    _os.makedirs(landing, exist_ok=True)
    base = _time.time()
    for seq, c in enumerate(sorted(by_chunk)):
        rows = by_chunk[c]
        tbl = _pa.Table.from_arrays(
            [
                _pa.array([r[f.name] for r in rows], type=_PA[type(f.dataType)])
                for f in fields
            ],
            names=[f.name for f in fields],
        )
        path = f"{landing}/chunk-{seq:05d}.parquet"
        _pq.write_table(tbl, path)
        _os.utime(path, (base + seq, base + seq))


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

# Late-data fixture for the WATERMARKED append-mode branch: (chunk,
# offer_id, event_time, price). One file per chunk → one micro-batch
# per chunk, so the watermark advances deterministically. Spark ≥3.4
# keeps TWO watermarks per batch (empirically confirmed on this
# engine, and what the oracle below replays):
#
#   wm_evict(i) = max(event time over chunks < i)  - delay
#                 (evicts + emits closed windows at batch i)
#   wm_late(i)  = wm_evict(i-1)
#                 (filters incoming late rows — one batch BEHIND
#                  eviction, so a window can never be resurrected)
#
# Chunk 3's 10:50 row arrives when wm_late = 11:30 has passed its
# [10:00,11:00) window (already emitted at chunk 2) → the engine MUST
# drop it: price 999 appears nowhere in the output. Chunk 1's 10:40 row
# is late but within tolerance → kept. After the last file, the engine
# runs one final no-data batch whose wm_evict = max(all) - delay
# flushes every closed window; still-open windows are never emitted.
_LATE_FIXTURE = [
    (0, 1, "2024-03-01 10:00:00", 100.0),
    (0, 2, "2024-03-01 10:10:00", 200.0),
    (1, 1, "2024-03-01 10:40:00", 110.0),  # late, window still open: kept
    (1, 1, "2024-03-01 12:00:00", 130.0),
    (2, 1, "2024-03-01 13:00:00", 140.0),  # advances wm; [10,11) emits here
    (3, 2, "2024-03-01 10:50:00", 999.0),  # TOO late (wm_late 11:30): DROPPED
    (3, 2, "2024-03-01 13:40:00", 150.0),
    (4, 1, "2024-03-01 15:00:00", 160.0),  # [15,16) stays open: never emitted
]

_LATE_VALUES_SQL = ",\n  ".join(
    f"({c}, {k}, TIMESTAMP '{ts}', {p})" for c, k, ts, p in _LATE_FIXTURE
)

# The oracle REPLAYS the engine's two-watermark rule over the same
# literals: a row is kept iff its window end is above wm_late of its
# chunk; a window is emitted iff the final no-data batch's wm_evict
# (= max event time - delay) closed it.
_LATE_APPEND_ORACLE = f"""
WITH raw(chunk, offer_id, ts, price) AS (VALUES
  {_LATE_VALUES_SQL}),
wm AS (
  SELECT *,
         max(ts) OVER (ORDER BY chunk RANGE BETWEEN UNBOUNDED PRECEDING
                       AND 2 PRECEDING) - INTERVAL '30 minutes' AS wm_late
  FROM raw),
kept AS (
  SELECT *, time_bucket(INTERVAL '1 hour', ts) AS w
  FROM wm
  WHERE wm_late IS NULL
     OR time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' > wm_late)
SELECT w AS window_start,
       count(*) AS n_snapshots,
       count(DISTINCT offer_id) AS n_offers,
       CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) / count(price) AS avg_price,
       min(price) AS min_price,
       max(price) AS max_price
FROM kept
GROUP BY w
HAVING w + INTERVAL '1 hour' <= (SELECT max(ts) - INTERVAL '30 minutes' FROM raw)
"""


@register(
    "streaming_window_stats",
    oracle=f"""
SELECT 'complete_exact' AS mode,
       time_bucket(INTERVAL '1 hour', ts) AS window_start,
       count(*) AS n_snapshots,
       count(DISTINCT user_id) AS n_offers,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_price,
       min(value) AS min_price,
       max(value) AS max_price
FROM events
GROUP BY 2
UNION ALL
SELECT 'append_watermarked' AS mode, * FROM ({_LATE_APPEND_ORACLE})
""",
)
def streaming_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 on the REAL streaming engine, both output modes:

    - ``complete_exact``: the full events table replayed as micro-batch
      files through readStream → tumbling-window aggregation → complete
      mode → memory sink. Every aggregate is micro-batch deterministic
      (exact distinct via collect_set size, DECIMAL price sum, avg
      derived from that sum), so a DuckDB time_bucket oracle
      value-hash-checks an actual StreamingQuery execution.
    - ``append_watermarked``: the BOUNDED-STATE production path — the
      same aggregation behind ``withWatermark`` in append mode, over a
      chunked replay where one row arrives after the watermark has
      closed its window. The engine must DROP that row and emit only
      watermark-finalized windows; the oracle replays the
      watermark/eviction rule in SQL over the same fixture literals
      (``_LATE_FIXTURE``), so late-data eviction is value-hash-OBSERVED
      on a real ``StreamingQuery``, not just pytest-equivalence."""
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

        # the append fixture's state is 5 windows; 2 state partitions —
        # 6 micro-batches x 8 near-empty state stores is pure overhead.
        # Started CONCURRENTLY with the complete-mode stream: each
        # StreamExecution runs on its own cloned SparkSession (conf
        # captured at start, so the partition settings don't race) and
        # the two replays share no landing, sink, or state, so their
        # micro-batch scheduling overlaps — the append fixture's six
        # near-empty micro-batches (~2.3 s of pure engine latency) hide
        # under the real stream instead of serializing after it
        # (measured 4.1 s -> 2.6 s warm for the slot).
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        late_landing = _landing_for(sf_dir, "late", _late_fixture_frame(spark))
        stream2 = read_snapshot_stream(
            spark, late_landing, schema=_LATE_STREAM_SCHEMA, max_files_per_trigger=1
        )
        q2 = (
            windowed_price_stats_stream_exact(
                stream2.withWatermark("updated_date", "30 minutes"), "1 hour"
            )
            .writeStream.format("memory")
            .queryName("window_stats_append")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q2.awaitTermination(600)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    complete = spark.table("window_stats_stream").select(
        F.lit("complete_exact").alias("mode"), "*"
    )
    append = spark.table("window_stats_append").select(
        F.lit("append_watermarked").alias("mode"), "*"
    )
    return complete.unionByName(append).localCheckpoint(eager=True)


# withWatermark demands TIMESTAMP (LTZ); the session timezone is
# pinned, so LTZ fixture values collect as the same naive datetimes the
# oracle's TIMESTAMP literals produce.
_LATE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.LongType()),
        T.StructField("updated_date", T.TimestampType()),
        T.StructField("price_value", T.DoubleType()),
    ]
)


def _late_fixture_frame(spark: SparkSession) -> DataFrame:
    """The late-data fixture as a (chunked) snapshot frame; `__chunk`
    drives the one-file-per-chunk landing write."""
    df = spark.createDataFrame(
        [(c, k, ts, p) for c, k, ts, p in _LATE_FIXTURE],
        "chunk int, offer_id long, updated_date string, price_value double",
    )
    return df.select(
        "offer_id",
        F.to_timestamp("updated_date").alias("updated_date"),
        "price_value",
        F.col("chunk").alias("__chunk"),
    )


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

    # State-store partition count is frozen per stream from the
    # session's shuffle setting — deliberately NOT shrunk to key
    # cardinality like the window streams below: this operator does
    # O(batch rows) work per partition (Arrow transfer + the pandas
    # fold), so parallelism follows row volume, not state size.
    # Measured at sf0.1 (alternating reps): a hard 8-partition
    # override 4.9-5.5 s vs the cores-derived session setting
    # 3.7-4.6 s; the session setting also scales with
    # $SPARK_GRAFT_CPUS / cluster conf instead of pinning a local
    # constant (the near-empty-state rationale that fits the window
    # fixtures does not apply to a row-bound stateful map).
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
    return spark.table("stateful_changes").localCheckpoint(eager=True)
