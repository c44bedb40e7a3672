"""Incrementally-maintained bottom-k quantile sketches.

Per-group quantiles over an unbounded stream either buffer every value
in state (unbounded — the exact ``percentile`` shape) or keep a
SKETCH. The bottom-k hash sample (``sketch.bottomk_sample_state``) is
the bounded mergeable state: per group, the k rows whose
``md5(salt||key)`` sorts lowest plus the group's true row count —
bottom-k of a union is bottom-k of the concatenated states, and counts
are additive, so per micro-batch the fold writes only the BATCH's own
state slice and the reader merges all slices with one rank window.
The merged state is EXACTLY the batch operator's state over the
concatenated input (any globally-bottom-k row is bottom-k within its
own batch), proven by the equivalence test.

Append-only + ``_SUCCESS``-gated per-batch dirs with
manifest-committed compaction — the same commit contract as
``streaming/sketch_stream.py`` (shared ``sliced_committed`` listing).
At 100 TB the state is O(groups x k) per slice, never O(rows); slices
stay bounded by the ``compact_every`` consolidation.

Slice rows carry a ``__sid`` column (the originating slice id): the
group's true count ``__n`` repeats on every kept row WITHIN one
slice, so the merged total must sum ONE value per (group, slice) —
``__sid`` is what makes that well-defined after slices are read
together (and after compaction rewrites them under a new id).
"""

from __future__ import annotations

import os as _os
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.sketch import (
    bottomk_sample_state,
    quantiles_from_bottomk,
)
from rental_data_pipeline_spark.streaming.incremental import (
    atomic_json_write as _atomic_json_write,
    next_slice_dir,
    slice_id_compacted as _slice_id_compacted,
    sliced_committed,
)


_META = "_meta.json"


def _check_meta(
    state_path: str,
    k: int,
    salt: str | None,
    group_cols: list[str],
    key_col: str,
    create: bool = False,
) -> None:
    """Freeze the sketch parameters at first fold (the sibling
    stores' ``_meta.json`` discipline): slices folded under different
    (k, salt, columns) are NOT mergeable — a different salt draws a
    different hash order (the union of two bottom-k sets under
    different hashes is a bottom-k of nothing), and reading or
    compacting with k above the folded k silently under-samples.
    Mismatches refuse loudly instead."""
    import json as _json

    path = f"{state_path}/{_META}"
    if not _os.path.exists(path):
        if create:
            _os.makedirs(state_path, exist_ok=True)
            _atomic_json_write(
                path,
                {
                    "k": k,
                    "salt": salt,
                    "group_cols": list(group_cols),
                    "key_col": key_col,
                },
            )
        return
    with open(path) as f:
        meta = _json.load(f)
    problems = []
    if k > meta["k"] or (create and k != meta["k"]):
        problems.append(f"k={k} vs folded k={meta['k']}")
    if salt is not None and salt != meta["salt"]:
        problems.append(f"salt={salt!r} vs folded salt={meta['salt']!r}")
    if list(group_cols) != meta["group_cols"] or key_col != meta["key_col"]:
        problems.append(
            f"columns ({group_cols}, {key_col}) vs folded "
            f"({meta['group_cols']}, {meta['key_col']})"
        )
    if problems:
        raise ValueError(
            f"bottomk_stream: {state_path} was folded with different "
            "parameters — " + "; ".join(problems)
        )


def read_bottomk_state(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    key_col: str,
    k: int,
) -> DataFrame | None:
    """The merged bottom-k state across every committed slice: counts
    summed once per (group, slice), the union re-ranked on the same
    hash order, k kept — byte-equal to the batch operator over the
    concatenated input.

    ``k`` must be AT MOST the k the slices were folded with: each
    slice only retains its own bottom-k rows, so a larger read-k
    would silently under-sample (rows ranked k+1 within one slice can
    belong to the union's true bottom-k'). Reading a smaller k is
    exact (bottom-k' of a bottom-k superset, k' <= k).

    Group columns may be NULL: the totals groupBy keys nulls like any
    other value and the totals join is null-safe
    (``_join_group_totals``) — a plain equi-join would silently drop
    every null-keyed group from the merged state. The rank order
    carries the payload-column tiebreak (``_bottomk_order``), matching
    the batch operator exactly for non-unique keys."""
    from rental_data_pipeline_spark.operators.sketch import (
        _bottomk_order,
        _join_group_totals,
        _state_payload_cols,
    )

    _check_meta(path, k, None, group_cols, key_col)
    dirs = sliced_committed(path)
    if not dirs:
        return None
    df = spark.read.parquet(*dirs)
    totals = (
        df.groupBy(*group_cols, "__sid")
        .agg(F.first("__n").alias("__n_slice"))
        .groupBy(*group_cols)
        .agg(F.sum("__n_slice").alias("__n_total"))
    )
    order = _bottomk_order(key_col, _state_payload_cols(df, group_cols, key_col))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        _join_group_totals(df.drop("__n", "__sid"), totals, group_cols)
        .withColumnRenamed("__n_total", "__n")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def read_sampled_quantiles(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    qs: list[float],
    k: int,
) -> DataFrame | None:
    """Per-group quantile estimates over everything ingested so far."""
    state = read_bottomk_state(spark, path, group_cols, key_col, k)
    if state is None:
        return None
    return quantiles_from_bottomk(state, group_cols, value_col, qs)


def compact_bottomk(
    spark: SparkSession,
    state_path: str,
    group_cols: list[str],
    key_col: str,
    k: int,
    min_slices: int = 2,
    sweep_grace_sec: float | None = None,
) -> bool:
    """Merge every committed slice into ONE consolidated slice (the
    same rank-window union the reader computes, restamped under the
    new slice's ``__sid``) and cover the sources, under the shared
    manifest-commit contract: a crash in either window never
    double-counts or loses sample rows. Returns True when a
    compaction ran."""
    from rental_data_pipeline_spark.streaming.incremental import (
        C_SLICE_RE,
        sweep_covered_slices,
    )

    import json as _json

    meta_path = f"{state_path}/{_META}"
    if _os.path.exists(meta_path):
        with open(meta_path) as f:
            fold_k = _json.load(f)["k"]
        if k != fold_k:
            raise ValueError(
                f"compact_bottomk: k={k} but {state_path} was folded "
                f"with k={fold_k} — compacting at a smaller k would "
                "permanently trim sample rows later reads are owed"
            )
    sweep_covered_slices(state_path, sweep_grace_sec, uncommitted_re=C_SLICE_RE)
    dirs = sliced_committed(state_path)
    if len(dirs) < min_slices:
        return False
    merged = read_bottomk_state(spark, state_path, group_cols, key_col, k)
    cdir = next_slice_dir(state_path)
    merged.withColumn("__sid", F.lit(_os.path.basename(cdir))).write.parquet(
        cdir
    )
    _atomic_json_write(
        f"{cdir}/_covered.json", sorted(_os.path.basename(d) for d in dirs)
    )
    sweep_covered_slices(state_path, sweep_grace_sec)
    return True


def fold_bottomk_batch(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 512,
    salt: str = "sq",
    compact_every: int = 16,
) -> None:
    """Fold ONE batch's bottom-k slice — idempotent per ``batch_id``
    (committed replays and compacted-away replays both no-op; a
    crashed half-written slice is rewritten wholesale)."""
    _check_meta(state_path, k, salt, group_cols, key_col, create=True)
    bdir = f"{state_path}/b_{batch_id:09d}"
    if _os.path.exists(f"{bdir}/_SUCCESS"):
        return
    if _slice_id_compacted(state_path, batch_id):
        return
    if _os.path.exists(bdir):
        _shutil.rmtree(bdir, ignore_errors=True)
    bottomk_sample_state(
        batch, group_cols, value_col, key_col, k=k, salt=salt
    ).withColumn("__sid", F.lit(_os.path.basename(bdir))).write.parquet(bdir)
    if len(sliced_committed(state_path)) >= compact_every:
        compact_bottomk(spark, state_path, group_cols, key_col, k)


def incremental_bottomk_stream(
    events: DataFrame,
    state_path: str,
    checkpoint_path: str,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 512,
    salt: str = "sq",
    available_now: bool = True,
    compact_every: int = 16,
):
    """Fold a stream into the bottom-k state; returns the started
    StreamingQuery. Each batch writes ONLY its own O(groups x k)
    slice; merge cost is deferred to the reader's one rank window."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        fold_bottomk_batch(
            batch.sparkSession, state_path, batch, batch_id,
            group_cols, value_col, key_col, k=k, salt=salt,
            compact_every=compact_every,
        )

    writer = (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
