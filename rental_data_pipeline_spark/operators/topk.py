"""Sharded two-level per-group top-k — the straggler-free rank window.

A single ``row_number() OVER (PARTITION BY group ORDER BY ...)`` puts a
group's ENTIRE row set into one window task, which buffers and sorts
O(group) rows: at 100 TB a skewed group (one dominant language's
distinct bigrams, one event type's distinct users) turns into a
straggler that a 1000-executor cluster waits on. The fix mirrors the
bottom-k quantile sketch's round-13 rework (``operators/sketch.py``):

1. shard each group by a deterministic hash of the row, rank within
   (group, shard) and keep only k per shard — task volume
   O(group / n_shards), spread evenly because the shard is a hash;
2. re-rank the ≤ k·n_shards survivors per group and keep k.

The result is IDENTICAL to the single-window form for any ``n_shards``:
every row in the group's true top-k is, a fortiori, within the top-k of
its own shard (the shard is a subset ranked by the same order), so
stage 1 only ever discards rows the global cut would discard too.

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
    n_shards: int = 32,
    rank_name: str | None = None,
) -> DataFrame:
    """Keep each group's top ``k`` rows under ``order_cols`` without
    ever sorting a whole group in one task.

    ``shard_expr`` must be a DETERMINISTIC function of the row (a
    hash of one of its columns — nondeterministic expressions break
    retry/recompute consistency under shuffle replay). ``n_shards``
    never changes the result, only the parallelism of stage 1: size
    it ≈ max group rows / target task rows. ``rank_name`` adds the
    final 1-based rank as a column; the two bookkeeping columns are
    always dropped."""
    rk = rank_name or "__tk_rank"
    w1 = Window.partitionBy(*group_cols, "__tk_shard").orderBy(*order_cols)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = (
        df.withColumn("__tk_shard", F.pmod(shard_expr, F.lit(n_shards)))
        .withColumn("__tk_rk1", F.row_number().over(w1))
        .where(F.col("__tk_rk1") <= k)
        .withColumn(rk, F.row_number().over(w2))
        .where(F.col(rk) <= k)
        .drop("__tk_shard", "__tk_rk1")
    )
    return out if rank_name else out.drop(rk)
