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
from pyspark.sql import types as T

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
    # When the tiebreak lives on BOTH sides with different types, the
    # ORDERING runs on a shadow ``__tb_sort`` column cast to a common
    # comparison type, and the emitted left column is never touched
    # (so no value in the output can be corrupted by a round-trip
    # cast). Comparison type: the wider integral type when both sides
    # are integral (lossless), else DoubleType — exact for every
    # float/double and for integers up to 2^53; a long tiebreak past
    # 2^53 compared against a fractional side can collapse
    # near-adjacent SORT keys (the emitted values stay exact), which
    # is the best any shared numeric comparison type can do.
    # Incomparable type pairs raise at plan time.
    tb_sort_type = None  # shadow comparison type, None = order on the column
    if tiebreak is not None and tiebreak in right.columns:
        keep_r.add(tiebreak)
        if tiebreak in lcols:
            lt = left.schema[tiebreak].dataType
            rt = right.schema[tiebreak].dataType
            if lt != rt:
                integral = {
                    T.ByteType: 0, T.ShortType: 1,
                    T.IntegerType: 2, T.LongType: 3,
                }
                fractional = (T.FloatType, T.DoubleType)
                lt_ok = type(lt) in integral or isinstance(lt, fractional)
                rt_ok = type(rt) in integral or isinstance(rt, fractional)
                if not (lt_ok and rt_ok):
                    raise ValueError(
                        f"asof_join: tiebreak {tiebreak!r} is typed "
                        f"{lt.simpleString()} on the left but "
                        f"{rt.simpleString()} on the right — only "
                        "numeric width differences can be reconciled"
                    )
                if type(lt) in integral and type(rt) in integral:
                    tb_sort_type = (
                        lt if integral[type(lt)] >= integral[type(rt)] else rt
                    )
                else:
                    tb_sort_type = T.DoubleType()
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
    # shadow sort column (both sides cast to the shared comparison
    # type; the real tiebreak column rides the union at the LEFT type
    # untouched — right rows null it, their value only ever mattered
    # for ordering, which the shadow now owns)
    shadow_l: list = []
    shadow_r: list = []
    if tb_sort_type is not None:
        shadow_l = [F.col(tiebreak).cast(tb_sort_type).alias("__tb_sort")]
        shadow_r = [F.col(tiebreak).cast(tb_sort_type).alias("__tb_sort")]
    tagged_l = left.select(
        *[F.col(c) for c in lcols],
        *extra_l,
        *shadow_l,
        null_struct.alias("__r_payload"),
        F.lit(1).alias(_SIDE),
    )
    tagged_r = right.select(
        *[
            # a shadowed tiebreak is nulled at the left type (its
            # ordering role moved to __tb_sort); every other carried
            # column keeps the right side's value cast to nothing
            # (key/time types must already agree for the join to
            # mean anything)
            (
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c == tiebreak and tb_sort_type is not None
                else F.col(c)
            )
            if c in keep_r
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *extra_r,
        *shadow_r,
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
    tb_order = "__tb_sort" if tb_sort_type is not None else tiebreak
    if direction == "backward":
        order = [F.col(time_col).asc_nulls_first(), F.col(_SIDE).asc()]
        if tiebreak:
            order.append(F.col(tb_order).asc_nulls_first())
    else:
        # forward = the same scan in reverse time order: the running
        # last-non-null payload is then the EARLIEST right row at or
        # after the left row's time
        order = [F.col(time_col).desc_nulls_first(), F.col(_SIDE).asc()]
        if tiebreak:
            order.append(F.col(tb_order).desc_nulls_first())
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
        # left columns pass through untouched — the tiebreak was
        # never cast (ordering ran on the __tb_sort shadow), so the
        # output contract (left schema preserved, values exact) holds
        *[F.col(c) for c in lcols],
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
