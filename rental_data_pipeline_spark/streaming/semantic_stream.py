"""Incrementally-maintained SemDeDup labels — the ANN index doubles
as the blocking structure.

Batch ``similarity.semantic_dedup`` recomputes cell assignments and
within-cell domination over the WHOLE corpus each run. On a crawl the
corpus is append-only with MONOTONIC ids (the corpus stream's
arrival-order contract), which makes SemDeDup incrementally foldable:

- a doc's dominators all carry LOWER ids, so an already-labelled doc
  can never change status when later docs arrive — labels are
  append-only facts;
- a NEW doc is dominated iff some lower-id same-cell doc (stored, or
  earlier in its own batch) sits at cosine ≥ threshold — and the
  persisted ANN index (``operators/ann_index.py``) already stores
  exactly that: the corpus Voronoi-partitioned by frozen-centroid
  cell id, partition-pruned by ``cid``.

So the fold is: after the batch's vectors are appended to the index
(``append_ann_index`` — same frozen centroids, same rounded-cosine /
lowest-cid assignment expressions), read ONLY the touched cells'
assignment partitions, broadcast the batch against them with the
``stored.vec_id < new.vec_id`` domination condition, and commit one
``b_*`` label slice of ``(vec_id, cid, is_kept)``. Per-batch cost is
O(|batch| × touched-cell occupancy) — the same blocking trade the
batch operator makes, with ``n_cells`` growing ~√N at scale — and
never a rescan of previously labelled docs.

Union of committed slices ≡ ``semantic_dedup`` over the full corpus
with the same centroids (the equivalence pytest,
``tests/test_semantic_stream.py``). Zero-norm vectors are dropped
uniformly (they are absent from the index and from the batch operator
— the shared cosine-path contract).

Reference has no counterpart — beyond-reference training-data layer.
"""

from __future__ import annotations

import os as _os
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rental_data_pipeline_spark.streaming.incremental import sliced_committed


def fold_semantic_batch(
    spark: SparkSession,
    index_path: str,
    sem_path: str,
    batch: DataFrame,
    batch_id: int,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fold one batch's semantic-dedup labels. PRECONDITIONS: the
    batch's vectors are already appended to the index at
    ``index_path`` (so stored-cell reads see batch-mates too — the
    lower-id side of within-batch domination comes for free), and ids
    are monotonic across batches. Idempotent per ``batch_id``."""
    from rental_data_pipeline_spark.operators.ann_index import (
        _read_assignments,
        _read_centroids,
        read_meta,
    )
    from rental_data_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        _corpus,
        cosine,
        norm,
    )

    sdir = f"{sem_path}/b_{batch_id:09d}"
    if _os.path.exists(f"{sdir}/_SUCCESS"):
        return  # committed replay: no-op
    if _os.path.exists(sdir):
        _shutil.rmtree(sdir, ignore_errors=True)
    _os.makedirs(sem_path, exist_ok=True)

    meta = read_meta(index_path)
    centroids = _read_centroids(spark, index_path)
    corpus = (
        _corpus(batch, id_col, vec_col)
        .withColumn("vn", norm(F.col("v")))
        .where(F.col("vn") > 0)
    )
    dt = batch.schema[id_col].dataType.simpleString()
    # identical assignment expressions to the index build/append, so
    # the batch's cells equal what the batch operator would assign
    asg = _assign_to_centroids(corpus, centroids).select(
        "vec_id", "v", "cid"
    ).localCheckpoint(eager=True)  # feeds the touched-cell collect,
    # the domination join AND the final labels — one materialization
    if asg.limit(1).count() == 0:
        spark.createDataFrame(
            [], f"vec_id {dt}, cid int, is_kept boolean"
        ).write.parquet(sdir)
        return

    touched = sorted(r[0] for r in asg.select("cid").distinct().collect())
    # partition-pruned read of ONLY the touched cells — includes this
    # batch's own appended slice, whose lower ids are exactly the
    # within-batch domination candidates
    stored = _read_assignments(spark, index_path, meta).where(
        F.col("cid").isin(touched)
    )
    s, n = stored.alias("s"), asg.alias("n")
    dominated = (
        s.join(
            F.broadcast(n),
            (F.col("s.cid") == F.col("n.cid"))
            & (F.col("s.vec_id") < F.col("n.vec_id")),
        )
        .where(F.round(cosine(F.col("s.v"), F.col("n.v")), 6) >= threshold)
        .select(F.col("n.vec_id").alias("vec_id"))
        .distinct()
    )
    (
        asg.join(dominated.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id", "cid",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_kept"),
        )
        .write.parquet(sdir)
    )


def read_semantic_labels(
    spark: SparkSession, sem_path: str, as_of_batch: int | None = None
) -> DataFrame | None:
    """Accumulated ``(vec_id, cid, is_kept)`` labels, or None before
    the first fold. Labels are append-only facts (monotonic ids), so
    the read is a plain union of committed slices; ``as_of_batch``
    restricts to slices ≤ it (slices are never compacted — they are
    part of the corpus event log)."""
    dirs = sliced_committed(sem_path)
    if as_of_batch is not None:
        dirs = [
            d
            for d in dirs
            if int(_os.path.basename(d)[2:]) <= as_of_batch
        ]
    if not dirs:
        return None
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d), allowMissingColumns=True)
    return out
