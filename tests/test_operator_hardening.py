"""Rare-input and scale hardening of the batch operator suite (review
findings the sf0.01 oracle can't see): zero-norm embeddings, ANSI
overflow boundaries, recall-bound guards, and crash-consistent index
rebuilds."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="op_hardening_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_zero_norm_embeddings_do_not_crash_cosine_ops(spark):
    """Under ANSI mode (the Spark 4 default) a zero-norm vector in
    cosine()'s denominator is a DIVIDE_BY_ZERO crash; every cosine-
    space operator must drop such vectors (no direction), as
    _unit_corpus always documented."""
    from rental_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.5, 0.1, 0.2]),
        (2, [0.9, 0.1, 0.0, 0.5, 0.1, 0.2]),
        (3, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # zero-norm: undirectional
        (4, [0.0, 1.0, 0.2, 0.0, 0.3, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_topk(df, [1], top_k=2).collect()
    assert {r.vec_id for r in got} == {2, 4}  # 3 dropped, no crash
    pairs = embedding_near_dup_pairs(df, threshold=0.9).collect()
    assert all(3 not in (r.vec_id_a, r.vec_id_b) for r in pairs)


def test_simhash_survives_beyond_old_packing_bound(spark):
    """The 2x32-bit packed counters must aggregate docs past the old
    4x16-bit layout's ~2^15-token overflow point, and the 2^16
    distinct-token guard must RAISE (reachably — under the old packing
    the aggregation itself overflowed first, so the guard was dead
    code under ANSI)."""
    from rental_data_pipeline_spark.operators.dedup import (
        simhash_signatures,
    )

    # 40k distinct tokens: past the old overflow bound, under the guard
    big = " ".join(f"t{i}" for i in range(40_000))
    df = spark.createDataFrame([(1, big)], "doc_id long, text string")
    assert simhash_signatures(df).count() == 1

    # past the guard: raises the documented chunk-it-first error
    over = " ".join(f"t{i}" for i in range(66_000))
    df = spark.createDataFrame([(2, over)], "doc_id long, text string")
    with pytest.raises(Exception, match="2\\^16|chunk"):
        simhash_signatures(df).collect()


def test_components_converge_with_hash_scale_ids(spark):
    """Convergence is detected via a label-sum metric; summing raw
    64-bit hash-derived ids overflows a signed long (ANSI crash) —
    the metric must aggregate in decimal."""
    from rental_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    base = 1 << 55
    pairs = spark.createDataFrame(
        [(base + i, base + i + 1) for i in range(0, 400, 2)],
        "doc_a long, doc_b long",
    )
    labels = connected_components(pairs)
    got = {r.node: r.component for r in labels.collect()}
    for i in range(0, 400, 2):
        assert got[base + i] == base + i
        assert got[base + i + 1] == base + i


def test_simhash_near_pairs_refuses_incomplete_recall(spark):
    """The 4-band pigeonhole guarantees candidates only up to Hamming
    distance 3; a larger threshold silently truncates recall, so it
    must raise."""
    from rental_data_pipeline_spark.operators.dedup import (
        simhash_near_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(df, max_hamming=4)


def test_fingerprint_groups_member_cap(spark):
    """max_group_members bounds the emitted membership list (sorted,
    keeper always first); default behavior is unchanged."""
    from rental_data_pipeline_spark.operators.dedup import (
        fingerprint_duplicate_groups,
    )

    df = spark.createDataFrame(
        [(i, "same tokens here") for i in range(10)],
        "doc_id long, text string",
    )
    full = fingerprint_duplicate_groups(df).collect()[0]
    assert full.doc_ids == list(range(10))
    capped = fingerprint_duplicate_groups(df, max_group_members=3).collect()[0]
    assert capped.doc_ids == [0, 1, 2]
    assert capped.n_docs == 10  # the count still reflects the group
    assert capped.keeper_id == 0


def test_contamination_prefilter_defaults_and_equivalence(spark):
    """hash_prefilter exists because the eval set is too large to
    broadcast as strings — so with it on, broadcast_index must default
    OFF (broadcasting the same strings in the verify join would defeat
    it); rows are identical across configurations."""
    from rental_data_pipeline_spark.operators.dedup import (
        contamination_report,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )

    def rows(**kw):
        return sorted(
            (r.doc_id, r.n_overlap)
            for r in contamination_report(train, hold, **kw).collect()
        )

    want = rows()
    assert want == rows(hash_prefilter=True)
    assert want == rows(hash_prefilter=True, prefilter_mod=1 << 16)
    assert want == rows(hash_prefilter=True, broadcast_index=True)


def test_kmeans_survives_antipodal_cell(spark):
    """A cell whose members are antipodal has a zero mean; the update
    must keep the previous centroid instead of handing the next
    assignment a zero-norm centroid (ANSI divide-by-zero)."""
    from rental_data_pipeline_spark.operators.similarity import (
        kmeans_train,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    centroids, assigned = kmeans_train(df, k=1, n_iter=3)
    assert any(x != 0.0 for x in centroids[0])
    assert assigned.count() == 2


def test_direct_rebuild_is_pending_guarded(spark, root):
    """A direct build_ann_index over a live index stages the shared
    pending marker: a crash mid-overwrite leaves probes refusing (not
    serving mixed-generation tables), regrow refuses to adopt it, and
    re-running the build finishes and clears it."""
    from rental_data_pipeline_spark.operators.ann_index import (
        build_ann_index,
        ivf_topk_persisted,
        read_meta,
        regrow_ann_index,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(1, 21)],
        "vec_id long, embedding array<double>",
    )
    idx = f"{root}/ann"
    build_ann_index(df, idx, n_cells=2, n_iter=1)
    assert not os.path.exists(f"{idx}/_meta.json.pending")  # fresh: none

    # simulate a crashed DIRECT rebuild: its staged marker survives
    with open(f"{idx}/_meta.json.pending", "w") as f:
        json.dump({"op": "rebuild", "n_cells": 2}, f)
    with pytest.raises(RuntimeError, match="migration in progress"):
        read_meta(idx)
    with pytest.raises(RuntimeError, match="build_ann_index"):
        regrow_ann_index(spark, idx, 2)

    # the documented resume: re-run the build — idempotent overwrites,
    # marker cleared, probes work again
    build_ann_index(df, idx, n_cells=2, n_iter=1)
    assert not os.path.exists(f"{idx}/_meta.json.pending")
    assert ivf_topk_persisted(spark, idx, [1], top_k=2).count() == 2
