"""Streaming ANN index maintenance — the crawl's embedding feed.

Completes the incremental story for the last index artifact: the CDC
state table, the MinHash/LSH dedup index, the connected-components
labels, and the HLL registers all fold per micro-batch; this module
does the same for the persisted ANN index (``operators/ann_index``).
Each micro-batch of new embeddings is assigned against the FROZEN
centroid/codebook tables and committed as an append slice
(``appends/b_<batch>``) under the shared slice protocol —
``append_ann_index`` is idempotent per batch id, so foreachBatch
replays after a crash heal themselves, and probes
(``ivf_topk_persisted`` / ``pq_topk_persisted``) read base + committed
slices with the same partition pruning.

Cost per batch is O(batch): a map-side argmax against broadcast
centroids and one slice write — never a touch of the stored corpus
(``scripts/stress_streaming_folds.py`` measures the analogous folds
flat in state size). Centroid drift is handled by periodic offline
rebuilds (``build_ann_index``), the standard IVF maintenance split.

Reference has no counterpart — beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def incremental_ann_index_stream(
    vecs: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    compact_every: int = 16,
):
    """Fold an embedding stream into an EXISTING persisted index
    (``build_ann_index`` must have run — the artifact's training is
    offline by design); returns the started StreamingQuery. ``vecs``
    is a streaming DataFrame with ``id_col`` unique across the whole
    stream (append-only corpus, the dedup-index contract). Once the
    index accretes ``compact_every`` live append slices the fold runs
    ``compact_ann_appends`` inline — the same amortized small-file
    bound every other incremental table here keeps."""

    # imported lazily: operators.ann_index itself imports from the
    # streaming package (_bucket_of), so a module-level import here
    # would be circular through streaming/__init__
    from rental_data_pipeline_spark.operators.ann_index import (
        _append_slice_dirs,
        append_ann_index,
        compact_ann_appends,
        read_meta,
    )

    def fold(batch: DataFrame, batch_id: int) -> None:
        append_ann_index(
            batch, index_path, batch_id=batch_id,
            id_col=id_col, vec_col=vec_col,
        )
        if len(_append_slice_dirs(index_path, read_meta(index_path))) >= (
            compact_every
        ):
            compact_ann_appends(batch.sparkSession, index_path)

    writer = (
        vecs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
