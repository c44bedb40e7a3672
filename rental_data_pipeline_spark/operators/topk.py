"""Sharded two-level per-group top-k — bounding the rank window's
REDUCE-side tail.

What Spark already does: a ``row_number() OVER (PARTITION BY group
ORDER BY ...)`` filtered to ``<= k`` triggers ``InferWindowGroupLimit``
(Spark 3.5+), which inserts a map-side ``WindowGroupLimit Partial``
BEFORE the shuffle — each upstream partition forwards at most k rows
per group, so the map side is never a whole-group sort. (Measured in
``scripts/stress_topk_skew.py``: a 20M-row hot group ranks in ~2 s
either way locally.)

What it does NOT bound: the reduce side. One task per group still
receives and sorts ``P·k`` rows (P = upstream partitions). At 100 TB
with ~10^5-10^6 scan partitions and a handful of groups (languages,
event types), that is 10^6-10^7 rows funneled through ONE task per
group — a tail, not a crash, but exactly the kind of straggler a
1000-executor cluster waits on. This operator adds the middle level of
a hierarchical merge: rank within (group, hash-shard) first — the
reduce cell there receives ~``P·k / n_shards`` rows — then re-rank the
≤ ``k·n_shards`` survivors per group. Reduce-side task volume drops
from ``P·k`` to ``max(P·k/n_shards, k·n_shards)`` for one extra (tiny)
shuffle; locally the extra exchange costs ~0.5-1 s on 20M rows (the
stress script records both).

The result is IDENTICAL to the single-window form for any
``n_shards``: every row in the group's true top-k is, a fortiori,
within the top-k of its own shard (the shard is a subset ranked by the
same order), so stage 1 only ever discards rows the global cut would
discard too.

The sibling case that is NOT optional: when another window function
rides the same partition (the bottom-k sketch's per-group count),
``InferWindowGroupLimit`` cannot fire and the single-window form
really does buffer and sort the whole group in one task — measured
94 s vs 8 s sharded on a 20M-row group (``operators/sketch.py``
handles that shape itself; this module is for plain rank limits).

Correctness precondition (same as any row_number use): the order must
be TOTAL over distinct rows within a group — supply tiebreak columns —
or rows that tie on the full order must be interchangeable (identical
in every emitted column). Otherwise which tied row survives either
cut is partition-dependent, sharded or not.

Reference parity: the reference has no top-k at all (its "worklists"
are full sorts of small in-memory lists, parse_data.py); this operator
exists for the Spark-scale queries built beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    shard_expr: Column,
    n_shards: "int | str" = 32,
    rank_name: str | None = None,
) -> DataFrame:
    """Keep each group's top ``k`` rows under ``order_cols`` with the
    per-group reduce task bounded at ``max(P·k/n_shards, k·n_shards)``
    rows instead of ``P·k`` (module docstring).

    ``shard_expr`` must be a DETERMINISTIC function of the row (a
    hash of one of its columns — nondeterministic expressions break
    retry/recompute consistency under shuffle replay). ``n_shards``
    never changes the result, only the fan-in of the merge: size it
    ≈ sqrt(P·k / k) at scale, or pass ``"auto"`` to derive it from the
    input's upstream partition count P (guide §2.4 — partitioning
    sized to the data): small P collapses to the plain single-window
    rank (the reduce task's P·k rows are trivial, and the shard level
    would add an exchange that prunes nothing), large P shards at
    ~sqrt(P). ``rank_name`` adds the final 1-based rank as a column;
    the two bookkeeping columns are always dropped."""
    if n_shards == "auto":
        from rental_data_pipeline_spark.operators.planmeta import plan_partitions

        p = plan_partitions(df)
        if p <= 256:
            n_shards = 1
        else:
            n_shards = max(2, min(256, int(p ** 0.5)))
    if n_shards < 1:
        # pmod by 0 is NULL in Spark SQL: every row would land in one
        # NULL shard cell — the exact single-task funnel this operator
        # exists to prevent, silently. Refuse instead.
        raise ValueError(f"topk_per_group: n_shards must be >= 1, got {n_shards}")
    rk = rank_name or "__tk_rank"
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    if n_shards == 1:
        # one shard ≡ the plain rank: skip the shard level instead of
        # paying its exchange for zero pruning
        out = (
            df.withColumn(rk, F.row_number().over(w2))
            .where(F.col(rk) <= k)
        )
        return out if rank_name else out.drop(rk)
    w1 = Window.partitionBy(*group_cols, "__tk_shard").orderBy(*order_cols)
    out = (
        df.withColumn("__tk_shard", F.pmod(shard_expr, F.lit(n_shards)))
        .withColumn("__tk_rk1", F.row_number().over(w1))
        .where(F.col("__tk_rk1") <= k)
        .withColumn(rk, F.row_number().over(w2))
        .where(F.col(rk) <= k)
        .drop("__tk_shard", "__tk_rk1")
    )
    return out if rank_name else out.drop(rk)
