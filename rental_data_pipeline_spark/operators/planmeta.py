"""Cheap, memoized plan-metadata probes for volume-adaptive operators.

``df.rdd.getNumPartitions()`` runs the full QueryExecution pipeline
(analysis → physical planning → RDD conversion) — measured 0.2-0.5 s
per call on this engine's corpus frames — and the volume-adaptive
operators (the conditional tokenize fan-out, the auto shard counts,
the Python-stage partition sizing) probe it during EVERY query
construction. Within one Spark application the probe's answer is a
pure function of the (deterministic) plan, so both probes memoize on
``(applicationId, semanticHash)``: repeated constructions of the same
query — warm bench reps, a long-lived service's repeated calls — pay
the planning pass (or the count job) once per session.

Only plan METADATA is memoized, never data or results, and every
caller uses the value purely to pick a partitioning/shard count the
result is invariant to by construction — so even a (astronomically
unlikely) 32-bit ``semanticHash`` collision could only change a plan
shape, never a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PARTS_MEMO: dict[tuple, int] = {}
_ROWS_MEMO: dict[tuple, int] = {}


def _key(df: DataFrame) -> tuple | None:
    try:
        return (
            df.sparkSession.sparkContext.applicationId,
            df.semanticHash(),
        )
    except Exception:  # pragma: no cover — exotic plans; fall back
        return None


def plan_partitions(df: DataFrame) -> int:
    """``df.rdd.getNumPartitions()`` with a per-application memo."""
    key = _key(df)
    if key is None:
        return df.rdd.getNumPartitions()
    v = _PARTS_MEMO.get(key)
    if v is None:
        v = df.rdd.getNumPartitions()
        _PARTS_MEMO[key] = v
    return v


def plan_rows(df: DataFrame) -> int:
    """``df.count()`` with a per-application memo — for operators that
    size a fan-out by row volume (the count is one zero-column scan
    job; the memo keeps it to one per session instead of one per
    construction)."""
    key = _key(df)
    if key is None:
        return df.count()
    v = _ROWS_MEMO.get(key)
    if v is None:
        v = df.count()
        _ROWS_MEMO[key] = v
    return v
