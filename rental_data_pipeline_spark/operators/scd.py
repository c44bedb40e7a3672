"""Slowly-changing-dimension (type 2) intervals from snapshot history.

The CDC merge keeps latest-value state plus stringified change history
(the reference's shape); analytics and training-metadata joins often
want the TEMPORAL form instead: one row per (key, attribute-run) with
``[valid_from, valid_to)`` bounds, so "the record as of time T" is a
plain range predicate (and composes with ``operators/asof.py``).

Gaps-and-islands over one key-partitioned sort: flag rows whose
attributes differ (null-safely) from their predecessor, running-sum
the flags into run ids, aggregate each run to its start, then close
each interval with the next run's start. One shuffle (the key
partition), reused by both windows and the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """``(key, attrs..., valid_from, valid_to)`` — consecutive
    snapshots with identical ``attr_cols`` collapse into one interval;
    ``valid_to`` is the next change's timestamp, null while current.
    Ties on ``ts_col`` within a key are broken by the attribute values
    themselves (deterministic, order-insensitive input).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    # first row of the key via row_number, NOT lag(ts).isNull(): a
    # predecessor whose ts is NULL would otherwise flag every successor
    # as a run start, splitting identical-attribute history into
    # duplicate (even doubly-"current") intervals
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    runs = df.select(key_col, ts_col, *attr_cols).withColumn(
        "__run",
        F.sum(changed.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = runs.groupBy(key_col, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    # Close over (valid_from, attrs): two runs of one key can share
    # valid_from (equal ts, differing attrs), and lead() over a tied
    # sort would make valid_to nondeterministic across runs.
    w_close = Window.partitionBy(key_col).orderBy("valid_from", *attr_cols)
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w_close))
        .drop("__run")
        .select(key_col, *attr_cols, "valid_from", "valid_to")
    )
