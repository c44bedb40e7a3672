"""Incrementally-maintained HLL distinct-count sketches.

``COUNT(DISTINCT x)`` over an unbounded stream either keeps every
distinct value in state (unbounded) or keeps a SKETCH. The HLL
register table (``sketch.hll_registers``) is the bounded mergeable
state: 2^p rows per group, and register-wise MAX is the union
operation — so per micro-batch the fold computes the batch's register
slice and appends it; the reader merges all slices with one
``groupBy(group, reg).max`` and folds the estimate. The merged
estimate is EXACTLY the estimate of the concatenated input (register
max is associative/commutative/idempotent), proven by the equivalence
test against the batch operator.

Append-only + ``_SUCCESS``-gated per-batch dirs (idempotent replay,
crash garbage invisible) — the same commit contract as
``streaming/dedup_index.py``. At 100 TB this is the pattern for every
mergeable aggregate (sketches, counts, sums): state size is
O(groups x 2^p), never O(distinct values).
"""

from __future__ import annotations

import os as _os
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.sketch import (
    hll_estimate_from_registers,
    hll_registers,
)
from rental_data_pipeline_spark.streaming.incremental import (
    atomic_json_write as _atomic_json_write,
    slice_id_compacted as _slice_id_compacted,
    sliced_committed,
)


def _committed(root: str) -> list[str]:
    return sliced_committed(root)


def read_hll_registers(spark: SparkSession, path: str) -> DataFrame | None:
    """The merged register state across every committed batch slice."""
    dirs = _committed(path)
    if not dirs:
        return None
    df = spark.read.parquet(*dirs)
    group_cols = [c for c in df.columns if c not in ("__reg", "__M")]
    return df.groupBy(*group_cols, "__reg").agg(F.max("__M").alias("__M"))


def read_hll_estimate(
    spark: SparkSession, path: str, p: int = 8
) -> DataFrame | None:
    """Per-group estimates over everything ingested so far."""
    regs = read_hll_registers(spark, path)
    if regs is None:
        return None
    group_cols = [c for c in regs.columns if c not in ("__reg", "__M")]
    return hll_estimate_from_registers(regs, group_cols, p)


def compact_sketch(
    spark: SparkSession,
    state_path: str,
    min_slices: int = 2,
    sweep_grace_sec: float | None = None,
) -> bool:
    """Merge every committed register slice into ONE consolidated
    slice (the registers' groupBy-max union — the same value the
    reader computes) and drop the sources, under the shared
    manifest-commit contract (``incremental.sliced_committed``): a
    crash in either window never double-counts or loses registers.
    Physical source deletion is the shared covered-slice sweep
    (``sweep_grace_sec`` defers it for concurrent readers; ``None`` =
    the table's persisted ``set_gc_grace`` setting). Returns True when
    a compaction ran."""
    import glob as _glob
    import json as _json

    from rental_data_pipeline_spark.streaming.incremental import (
        C_SLICE_RE,
        sweep_covered_slices,
    )

    sweep_covered_slices(
        state_path, sweep_grace_sec, uncommitted_re=C_SLICE_RE
    )
    dirs = _committed(state_path)
    if len(dirs) < min_slices:
        return False
    merged = read_hll_registers(spark, state_path)
    from rental_data_pipeline_spark.streaming.incremental import (
        next_slice_dir,
    )

    cdir = next_slice_dir(state_path)
    merged.write.parquet(cdir)
    _atomic_json_write(f"{cdir}/_covered.json", sorted(_os.path.basename(d) for d in dirs))
    sweep_covered_slices(state_path, sweep_grace_sec)
    return True


def fold_registers_batch(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    compact_every: int = 16,
) -> None:
    """Fold ONE batch's register slice — the per-batch body of
    :func:`incremental_hll_stream`, module-level so the composed
    corpus fold (``streaming/corpus_stream.py``) drives the same code
    path. Idempotent per ``batch_id``."""
    bdir = f"{state_path}/b_{batch_id:09d}"
    if _os.path.exists(f"{bdir}/_SUCCESS"):
        return  # committed replay: no-op
    if _slice_id_compacted(state_path, batch_id):
        return  # folded then compacted away: committed replay
    if _os.path.exists(bdir):
        _shutil.rmtree(bdir, ignore_errors=True)  # crashed attempt
    hll_registers(batch, group_cols, value_col, p).write.parquet(bdir)
    if len(_committed(state_path)) >= compact_every:
        compact_sketch(spark, state_path)


def incremental_hll_stream(
    events: DataFrame,
    state_path: str,
    checkpoint_path: str,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    available_now: bool = True,
    compact_every: int = 16,
):
    """Fold a stream into the register table; returns the started
    StreamingQuery. Each batch writes ONLY its own slice (O(groups x
    2^p) rows) — merge cost is deferred to the reader, where it is one
    bounded aggregation; every ``compact_every`` committed slices the
    fold consolidates them (:func:`compact_sketch`) so the dir count
    stays bounded too."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        fold_registers_batch(
            batch.sparkSession, state_path, batch, batch_id,
            group_cols, value_col, p=p, compact_every=compact_every,
        )

    writer = (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
