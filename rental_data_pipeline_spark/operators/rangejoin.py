"""Range join and time-spine gap-fill — interval operators Spark lacks
natively, composed from equi-joins so Catalyst can plan them.

``point_in_interval_join``: joining a point column to an interval table
with NO shared equi-key is, naively, a BroadcastNestedLoopJoin (or a
cartesian product) — quadratic and un-shardable. The classic scalable
form bins the axis: each interval is exploded to the bins it covers,
each point maps to exactly one bin, and the join becomes an equi-join
on the bin id followed by the exact ``lo <= p < hi`` filter. Shuffle
is on the bin key (axis-uniform by construction), candidate volume is
|points| + Σ interval_bins — linear, never |points| × |intervals|.
DuckDB solves the same problem with IEJoin (the oracle twin uses its
inequality join directly); the binned-equi-join decomposition is the
standard distributed answer (it is what Spark's own range-join hints
on Databricks do under the hood).

``gapfill_locf``: densify an irregular per-key time series onto a
regular spine (one row per key per step) and carry the last observed
value forward. The spine is generated map-side per key via
``sequence`` + ``explode`` (no driver loop, no cross join against a
global calendar), then one union + one window pass — the same
single-shuffle shape as the as-of join (``asof.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: Column,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point < hi``.

    ``bin_width`` is an interval/numeric literal matching the axis type
    (e.g. ``F.expr("INTERVAL 1 DAY")`` for timestamps). Choose it near
    the typical interval length: each interval then explodes into
    O(1) bins and each bin's candidate set stays small. Output columns:
    all point columns + all interval columns (names must not collide).

    how='left_outer' keeps unmatched points with null interval columns
    (implemented as join-then-restore so the exploded copies of a point
    never duplicate the outer row).
    """
    pt = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    # bin index = how many whole bin_widths since epoch; works for both
    # numeric and timestamp axes (timestamps divide via unix micros).
    if dict(points.dtypes)[point_col].startswith("timestamp"):
        # cast covers TIMESTAMP_NTZ (tz-naive parquet), which unix_micros
        # rejects; an ntz->ltz session-tz shift applies equally to points
        # and interval bounds, so bin alignment is preserved.
        mu = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        # the divisor is the WIDTH in micros: mu(epoch+width) - mu(epoch).
        # mu(epoch+width) alone bakes the session timezone's 1970 offset
        # into the divisor — at tz=+01:00 with a 1-hour width it is
        # literally ZERO (ANSI divide-by-zero; silent null bins without
        # ANSI), and any other offset mis-sizes every bin.
        epoch = F.to_timestamp(F.lit("1970-01-01"))
        width = mu(epoch + bin_width) - mu(epoch)
        to_bin = lambda c: F.floor(mu(c) / width)  # noqa: E731
    else:
        to_bin = lambda c: F.floor(c / bin_width)  # noqa: E731

    p = points.withColumn("__bin", to_bin(pt))
    # explode each interval over its covered bins; hi is exclusive, so
    # an interval ending exactly on a bin edge does not claim that bin
    # (sequence is inclusive — trim with the filter below).
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(to_bin(lo), to_bin(hi))),
    )
    joined = p.join(iv, on="__bin", how="inner").where((lo <= pt) & (pt < hi))
    if how == "inner":
        return joined.drop("__bin")
    if how == "left_outer":
        # restore points that matched no interval — anti-join on the
        # matched keys with NULL-SAFE equality: a name-list anti join
        # uses null-unsafe equality, so a matched point carrying a NULL
        # in any column would fail to match itself and be re-emitted as
        # a spurious unmatched row (duplicating it in the output).
        # The matched frame feeds BOTH output branches (the union and
        # the anti-join key set); persisted so the explode+join subtree
        # computes once across branches — measured: at broadcast sizes
        # nothing is exchange-reused and the Generate(explode) appeared
        # twice in the executed plan. persist (not localCheckpoint):
        # lazy — no Spark job runs during plan construction — and
        # lineage-preserving, so an executor loss mid-query recomputes
        # the lost blocks instead of failing the job. The cache is
        # released by Spark's ContextCleaner when the frame is GC'd.
        matched = joined.drop("__bin").persist()
        pa = p.drop("__bin").alias("__p")
        mk = matched.select(*points.columns).distinct().alias("__m")
        cond = None
        for c in points.columns:
            e = F.col(f"__p.{c}").eqNullSafe(F.col(f"__m.{c}"))
            cond = e if cond is None else cond & e
        unmatched = pa.join(mk, on=cond, how="left_anti").select(
            *[F.col(f"__p.{c}") for c in points.columns]
        )
        for c in intervals.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: Column,
    bucket: str = "day",
) -> DataFrame:
    """Regularize ``df`` onto a per-key spine of ``bucket``-truncated
    ticks from the key's first to last observation, filling each value
    column from the latest observation at-or-before the tick (LOCF).

    Ticks with an exact observation take that row's values; gap ticks
    inherit. Multiple observations inside one bucket: the last one (by
    ``ts_col``) wins — same the-batch-is-ordered-last-wins rule as the
    CDC merge (``merge.py``); EXACT ``ts_col`` ties break on the value
    struct itself (largest wins), so the output is a pure function of
    the data rather than of partition layout. Returns
    (key, tick, *value_cols).

    Plan: groupBy(key) min/max → sequence/explode spine (map-side after
    one small agg shuffle), union with tagged observations, one window
    pass — no join against a driver-built calendar, no per-key loop.
    """
    obs = df.select(
        F.col(key_col),
        F.date_trunc(bucket, F.col(ts_col)).alias("__tick"),
        F.col(ts_col).alias("__ts"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
        # a null-timestamp observation cannot be placed on the spine —
        # and since spine rows are identified by __ts IS NULL below, it
        # would otherwise masquerade as a spine row and leak a phantom
        # (key, tick=NULL, value) row into the output
    ).where(F.col("__ts").isNotNull())
    spine = (
        df.groupBy(key_col)
        .agg(
            F.date_trunc(bucket, F.min(ts_col)).alias("__lo"),
            F.date_trunc(bucket, F.max(ts_col)).alias("__hi"),
        )
        .select(
            F.col(key_col),
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("__tick"),
            F.lit(None).cast("timestamp").alias("__ts"),
            F.lit(None)
            .cast(
                "struct<"
                + ",".join(
                    f"{c}:{df.schema[c].dataType.simpleString()}" for c in value_cols
                )
                + ">"
            )
            .alias("__v"),
        )
    )
    # the spine row sorts after its bucket's observations (its __ts is
    # NULL, asc_nulls_last), so the bucket's own observations are
    # visible to it and the latest one wins; gap ticks inherit from
    # earlier buckets. The ORDERABLE value columns join the sort
    # (asc_nulls_last; spine rows never tie with observations — their
    # NULL __ts already sorts them apart) so two observations with
    # IDENTICAL (key, ts) resolve deterministically: without it, which
    # row F.last picked depended on the partition's physical order.
    # Unorderable value types (maps, at any nesting depth) are excluded
    # from the sort struct — they would raise at plan time — so rows
    # identical in every orderable value column remain interchangeable,
    # the strongest determinism the data admits.
    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return True

    sortable = [c for c in value_cols if _orderable(df.schema[c].dataType)]
    order = [F.col("__tick").asc(), F.col("__ts").asc_nulls_last()]
    if sortable:
        order.append(
            F.struct(*[F.col(f"__v.{c}").alias(c) for c in sortable])
            .asc_nulls_last()
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = spine.unionByName(obs).select(
        key_col,
        "__tick",
        "__ts",
        F.last("__v", ignorenulls=True).over(w).alias("__fill"),
    )
    return (
        filled.where(F.col("__ts").isNull())  # keep spine rows only
        .select(
            F.col(key_col),
            F.col("__tick").alias("tick"),
            *[F.col(f"__fill.{c}").alias(c) for c in value_cols],
        )
    )
