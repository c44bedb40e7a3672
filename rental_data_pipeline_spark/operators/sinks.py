"""Sinks (SURVEY §2.1 K1-K4, §2.3 F4, §2.7 X17).

The reference persists state as one JSON array file with NaN scrubbed
to null (``parse_data.py:187-204`` K1), plus two CSV snapshots — full
and a recent-or-active filtered view (``parse_data.py:465-496``
K2/K3) — and intermediate JSON checkpoints (K4).

Spark-first restatement:

- JSON/CSV sinks are ``df.write`` with the NaN scrub expressed as a
  per-column ``nanvl`` projection (X17) — columnar, no recursive
  driver-side walk.
- The filtered view (F4) is a ``where`` over the same DataFrame —
  written from one lineage so both snapshots share the scan.
- Intermediate checkpoints (K4) map to materialized parquet tables;
  at scale these are the stage boundaries you actually want on disk
  (restartability), not a serialization quirk.
- State itself lives as parquet (sources/tables loads it); JSON/CSV
  are *export* formats for the dashboard, exactly the reference's
  split between ``merged_listings_flattened.json`` (state) and
  ``combined_data*.csv`` (views).

All writers take an explicit ``path`` and return it, so jobs compose
as ``path = write_x(df, path)`` chains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scrub_nan(df: DataFrame) -> DataFrame:
    """X17: NaN → null on every floating-point column (the reference
    recursively scrubs before JSON dump, parse_data.py:191-202)."""
    floats = {
        f.name: F.nanvl(F.col(f.name), F.lit(None))
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    }
    return df.withColumns(floats) if floats else df


def write_state_json(df: DataFrame, path: str) -> str:
    """K1: JSON state export with NaN scrub. One file per partition —
    at scale the state is partitioned; the reference's single-file
    shape is ``coalesce(1)`` for the caller to opt into."""
    scrub_nan(df).write.mode("overwrite").json(path)
    return path


def write_csv_snapshot(df: DataFrame, path: str, single_file: bool = False) -> str:
    """K2: full CSV snapshot (header, UTF-8 — Spark's default).

    Complex columns (array/map/struct — the state schema carries
    ``image_urls``/``features`` arrays) render as JSON strings: the
    CSV datasource rejects them outright
    (UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE), which used to kill the
    export stage on any state loaded from the shared schema."""
    complex_cols = {
        f.name: F.to_json(F.col(f.name))
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    }
    if complex_cols:
        df = df.withColumns(complex_cols)
    out = df.coalesce(1) if single_file else df
    scrub_nan(out).write.mode("overwrite").option("header", True).csv(path)
    return path


def recent_or_active(
    df: DataFrame,
    now: Column | str,
    last_active_col: str = "last_active",
    status_col: str = "status",
    days: int = 7,
) -> DataFrame:
    """F4: dashboard predicate — last_active within ``days`` of ``now``
    OR currently active (parse_data.py:476-484; ``now`` injected for
    determinism, SURVEY §7.4#2)."""
    nowc = F.lit(now).cast("timestamp") if isinstance(now, str) else now
    recent = F.col(last_active_col).cast("timestamp") >= nowc - F.expr(
        f"INTERVAL {days} DAYS"
    )
    return df.where(
        F.coalesce(recent, F.lit(False)) | (F.col(status_col) == "active")
    )


def write_filtered_csv(
    df: DataFrame, path: str, now: Column | str, single_file: bool = False, **kwargs
) -> str:
    """K3: the filtered dashboard view, same writer as K2."""
    return write_csv_snapshot(recent_or_active(df, now, **kwargs), path, single_file)


def checkpoint_table(df: DataFrame, path: str) -> DataFrame:
    """K4: materialize an intermediate as parquet and return the
    re-read DataFrame — a durable stage boundary (the reference's
    ``*_interm.json`` files), which also truncates lineage for
    iterative jobs."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
