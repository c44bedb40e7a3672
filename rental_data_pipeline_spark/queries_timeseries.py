"""Time-series / interval queries: binned range join, time-spine
gap-fill with LOCF, and the char-entropy quality score.

The range join and gap-fill are the interval operators the brief calls
out as "operators Spark lacks" — both are composed from equi-joins,
sequences, and windows (``operators/rangejoin.py``) so Catalyst plans
them with ordinary hash exchanges; the DuckDB twins use the engine's
native inequality/ASOF machinery, which makes them strong oracles:
two completely different algorithms must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators import rangejoin as RJ
from rental_data_pipeline_spark.operators import textstats as TS
from rental_data_pipeline_spark.queries import register
from rental_data_pipeline_spark.sources.tables import load_table


@register(
    "range_join_incident_window",
    oracle="""
SELECT e.event_id AS incident_id,
       count(p.event_id) AS n_purchases,
       CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events e
JOIN events p
  ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
GROUP BY 1
""",
)
def range_join_incident_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with NO equi-key: purchases falling in
    the 30-minute window after any error event (cross-user incident
    attribution). Binned decomposition (`rangejoin.point_in_interval_join`)
    vs DuckDB's native inequality join as the oracle."""
    ev = load_table(spark, "events", sf_dir)
    intervals = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("win_lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("win_hi"),
    )
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"), "value"
    )
    pairs = RJ.point_in_interval_join(
        points, intervals, "p_ts", "win_lo", "win_hi",
        bin_width=F.expr("INTERVAL 30 MINUTE"),
    )
    return pairs.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "gapfill_user_daily",
    oracle="""
WITH b AS (
  SELECT user_id, date_trunc('day', ts) AS tick, arg_max(value, ts) AS v
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id,
         unnest(generate_series(min(tick), max(tick), INTERVAL 1 DAY)) AS tick
  FROM b GROUP BY user_id
)
SELECT s.user_id, s.tick,
       round(b.v, 6) AS value
FROM s ASOF LEFT JOIN b
  ON s.user_id = b.user_id AND s.tick >= b.tick
""",
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user spine with last-observation-carried-forward
    (`rangejoin.gapfill_locf`): sequence/explode spine + one window
    pass vs DuckDB's native ASOF join as the oracle. (events has no
    duplicate (user_id, ts), so bucket-last is deterministic.)"""
    ev = load_table(spark, "events", sf_dir)
    out = RJ.gapfill_locf(
        ev, "user_id", "ts", ["value"],
        step=F.expr("INTERVAL 1 DAY"), bucket="day",
    )
    return out.select(
        "user_id",
        "tick",
        F.round("value", 6).alias("value"),
    )


def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    perplexity-proxy quality filter (`textstats.char_entropy`), via the
    join-free H = log2(N) − Σn·log2(n)/N identity on both engines."""
    return TS.char_entropy(load_table(spark, "documents", sf_dir))
