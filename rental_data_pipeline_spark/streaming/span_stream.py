"""Incremental substring-level dedup: the span-hash statistics table
folded per micro-batch.

Batch counterpart: ``operators/dedup.py:duplicated_spans`` (the
Lee-et-al suffix-array dedup as a sliding-window fingerprint scan).
Its output is a pure keyed aggregate over (span_hash) of per-(span,
doc) occurrence rows — min keeper id, total occurrences, distinct-doc
count — and under the corpus stream's arrival-order contract every
document arrives in EXACTLY ONE batch, so the per-batch aggregates
merge losslessly: keeper = min of mins, n_copies = sum of sums,
n_docs = sum of per-batch distinct-doc counts (disjoint doc sets).
That makes the fold a plain associative/commutative keyed merge, so
it rides :func:`incremental.bucketed_keyed_fold` unchanged — the same
LSM commit protocol (replay no-op, crashed-attempt cleanup,
touched-bucket pruning, periodic compaction) as the CDC state, the
curation state and the df-vocabulary.

With this, every dedup variant in the engine has an incremental
maintenance path: exact content-hash (curation state), MinHash/LSH
near-dup (dedup index), SimHash/Jaccard pairs (same index), semantic
(SemDeDup labels over the streamed ANN index), and now substring
spans. A growing crawl keeps "which 10-grams are boilerplate" current
per batch instead of rescanning O(corpus) token windows.

Reference has no counterpart — beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rental_data_pipeline_spark.streaming.incremental import (
    N_STATE_BUCKETS,
    bucketed_keyed_fold,
    read_state_or_legacy,
)

_KEY = "span_hash"
_COLS = ["span_hash", "keeper_id", "n_copies", "n_docs"]


def _batch_span_stats(
    batch: DataFrame, text_col: str, id_col: str, window: int
) -> DataFrame:
    """Per-batch (span_hash, keeper_id, n_copies, n_docs) aggregate —
    the batch-local restriction of ``duplicated_spans`` WITHOUT the
    min_docs filter (a span seen once so far may become duplicated by
    a later batch, so singletons must enter the state)."""
    from rental_data_pipeline_spark.operators.dedup import _span_positions

    per_doc = (
        _span_positions(batch, text_col, id_col, window)
        .groupBy(_KEY, "doc")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return per_doc.groupBy(_KEY).agg(
        F.min("doc").alias("keeper_id"),
        F.sum("n_occ").alias("n_copies"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _merge_span_stats(target: DataFrame | None, b: DataFrame) -> DataFrame:
    b = b.select(*_COLS)
    if target is None:
        return b
    return (
        target.select(*_COLS)
        .unionByName(b)
        .groupBy(_KEY)
        .agg(
            F.min("keeper_id").alias("keeper_id"),
            F.sum("n_copies").alias("n_copies"),
            F.sum("n_docs").alias("n_docs"),
        )
    )


def fold_spans_batch(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int,
    window: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_every: int = 16,
    n_state_buckets: int = N_STATE_BUCKETS,
) -> None:
    """Fold one document batch's span statistics into the bucketed
    state table. Idempotent per ``batch_id`` (LSM commit protocol);
    assumes each doc id arrives in exactly one batch (the corpus
    stream's arrival-order contract) — a replayed doc would
    double-count occurrences, which is exactly why the fold rides the
    replay-no-op versioned commit. The window is frozen in
    ``_span_window.json`` on the first fold (the bucket-count
    discipline: folding a different window into the same state would
    silently mix incomparable fingerprints) — later folds refuse a
    mismatched ``window``."""
    frozen = read_span_window(state_path)
    if frozen is None:
        import json as _json
        import os as _os

        _os.makedirs(state_path, exist_ok=True)
        tmp = f"{state_path}/_span_window.json.tmp"
        with open(tmp, "w") as f:
            _json.dump({"window": int(window)}, f)
        _os.replace(tmp, f"{state_path}/_span_window.json")
    elif frozen != window:
        raise ValueError(
            f"span state at {state_path} was built with window={frozen}; "
            f"refusing to fold window={window} fingerprints into it"
        )
    bucketed_keyed_fold(
        _batch_span_stats(batch, text_col, id_col, window),
        batch_id,
        state_path,
        key=_KEY,
        merge_fn=_merge_span_stats,
        n_buckets=n_state_buckets,
        compact_every=compact_every,
    )


def read_span_window(state_path: str) -> int | None:
    """The window frozen at the first fold, or None before it."""
    import json as _json
    import os as _os

    p = f"{state_path}/_span_window.json"
    if not _os.path.exists(p):
        return None
    with open(p) as f:
        return int(_json.load(f)["window"])


def read_duplicated_spans(
    spark: SparkSession, state_path: str, min_docs: int = 2
) -> DataFrame | None:
    """The accumulated duplicated-span report — equal to
    ``duplicated_spans(full corpus)`` with the same ``min_docs``.
    ``None`` before the first committed fold."""
    state = read_state_or_legacy(spark, state_path)
    if state is None:
        return None
    return state.select(*_COLS).where(F.col("n_docs") >= min_docs)
