"""As-of join (backward and forward): for each left row, the nearest
right row at-or-before (backward) / at-or-after (forward) its event
time, per key.

A custom operator Spark lacks natively, composed from existing
DataFrame ops (no join at all): union both sides tagged, window
``last(right-payload, ignorenulls=True)`` over (key, time), keep left
rows. The forward direction is the same plan with the time ordering
reversed. One shuffle on the key — same scale shape as the CDC merge,
and immune to the row-explosion a naive range-join would cost. (A
sort-merge range join materializes every candidate pair before
filtering; the union-window form touches each row once.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    how: str = "left",
) -> DataFrame:
    """Left rows + columns ``right_payload`` from the nearest right row
    on the same key: latest with ``right.time <= left.time``
    (``direction='backward'``) or earliest with ``right.time >=
    left.time`` (``'forward'``). ``how='left'`` keeps unmatched left
    rows with null payload; ``'inner'`` drops them (DuckDB's
    ``ASOF [LEFT] JOIN`` semantics in both directions).

    ``tiebreak`` picks deterministically among simultaneous RIGHT rows
    (the largest for backward, the smallest for forward — it must be a
    left-schema column; the right side's values are carried when the
    column exists there). ALL simultaneous right rows sort before the
    left row, so an exactly-simultaneous right row IS visible to it
    (<= / >=, never strict). Right rows with a null key or null time
    match nothing; left rows with a null key or null time are
    unmatched (kept with null payload under ``how='left'``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    lcols = left.columns
    # One struct per right row — never per column. A per-column
    # last(ignorenulls) would let a NULL payload field inherit from an
    # OLDER right row while sibling fields come from the newer one; the
    # struct is non-null iff the row is a right row, so one
    # last(ignorenulls) picks every payload field from the same matched
    # row (NULL fields stay NULL, as-of semantics preserved).
    payload_struct = F.struct(*[F.col(c).alias(c) for c in right_payload])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload) + ">"
    )
    # columns a right row keeps under the left schema: the join key,
    # the event time, and the tiebreak (when the right side has it —
    # nulling it, the previous behavior, left simultaneous right rows
    # with NO deterministic order, so the matched payload depended on
    # input partitioning)
    keep_r = {key, time_col}
    if tiebreak is not None and tiebreak in right.columns:
        keep_r.add(tiebreak)
    # a tiebreak that lives only on the RIGHT side (a sequence number,
    # an event id) rides the union as an extra column: null for left
    # rows, the right row's value for right rows
    extra_l: list = []
    extra_r: list = []
    if tiebreak is not None and tiebreak not in lcols:
        if tiebreak not in right.columns:
            raise ValueError(
                f"asof_join: tiebreak column {tiebreak!r} exists on "
                "neither side"
            )
        extra_l = [
            F.lit(None).cast(right.schema[tiebreak].dataType).alias(tiebreak)
        ]
        extra_r = [F.col(tiebreak)]
    tagged_l = left.select(
        *lcols,
        *extra_l,
        null_struct.alias("__r_payload"),
        F.lit(1).alias(_SIDE),
    )
    tagged_r = right.select(
        *[
            # the carried tiebreak is cast to the LEFT schema's type
            # like every other carried column: two sides typing the
            # sequence column differently (int vs long is routine
            # across ingest surfaces) would otherwise fail the union
            # or silently widen the sort key
            (
                F.col(c).cast(left.schema[c].dataType).alias(c)
                if c == tiebreak
                else F.col(c)
            )
            if c in keep_r
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *extra_r,
        payload_struct.alias("__r_payload"),
        F.lit(0).alias(_SIDE),
    ).where(
        # ASOF semantics ignore null keys and null times on the match
        # side: a null key matches nothing (joins never match nulls)
        # and a null right time is un-orderable — without this filter
        # it sorts first and matches EVERY left row as time=-infinity
        F.col(key).isNotNull() & F.col(time_col).isNotNull()
    )
    # ordering: time, then SIDE (all simultaneous right rows sort
    # before any simultaneous left row — the <=/>= visibility
    # contract), then tiebreak (deterministic winner among
    # simultaneous right rows: max for backward, min for forward).
    # Null left times sort FIRST in both directions, so they see no
    # right rows and stay unmatched (left.time NULL compares unknown).
    if direction == "backward":
        order = [F.col(time_col).asc_nulls_first(), F.col(_SIDE).asc()]
        if tiebreak:
            order.append(F.col(tiebreak).asc_nulls_first())
    else:
        # forward = the same scan in reverse time order: the running
        # last-non-null payload is then the EARLIEST right row at or
        # after the left row's time
        order = [F.col(time_col).desc_nulls_first(), F.col(_SIDE).asc()]
        if tiebreak:
            order.append(F.col(tiebreak).desc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged_r.unionByName(tagged_l).select(
        "*",
        F.last("__r_payload", ignorenulls=True).over(w).alias("__asof_payload"),
    )
    out = filled.where(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.where(F.col("__asof_payload").isNotNull())
    return out.select(
        *lcols,
        *[F.col(f"__asof_payload.{c}").alias(f"asof_{c}") for c in right_payload],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward/left as-of join (the original API; see
    :func:`asof_join`)."""
    return asof_join(
        left, right, key, time_col, right_payload, tiebreak,
        direction="backward", how="left",
    )
