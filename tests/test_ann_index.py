"""Persisted ANN index: probe(persisted) == the in-query composition.

``build_ann_index`` trains once and writes tables;
``ivf_topk_persisted`` / ``pq_topk_persisted`` must return byte-equal
results to ``ivf_topk_trained`` / ``pq_topk`` on the same parameters —
and the probe must read only the probed cell partitions (partition
pruning), which is the artifact's entire reason to exist.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.ann_index import (
    build_ann_index,
    ivf_topk_persisted,
    pq_topk_persisted,
    read_meta,
)
from rental_data_pipeline_spark.operators.similarity import (
    ivf_topk_trained,
    pq_topk,
)
from rental_data_pipeline_spark.sources.tables import load_table

QUERY_IDS = [1, 5, 9, 23, 42]


@pytest.fixture()
def index_dir():
    d = tempfile.mkdtemp(prefix="ann_index_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, r.sim, r.rank)
        for r in df.select("query_id", "vec_id", "sim", "rank").collect()
    )


def test_ivf_persisted_probe_equals_in_query_composition(
    spark, sf_dir, index_dir
):
    embs = load_table(spark, "embeddings", sf_dir)
    build_ann_index(embs, index_dir, n_cells=8, n_iter=3)
    want = _rows(ivf_topk_trained(embs, QUERY_IDS, top_k=5))
    got = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
    assert got == want and got
    # probe-many: a second probe against the same artifact (no retrain)
    # and a different parameterization still answers from the tables
    again = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
    assert again == want
    assert _rows(
        ivf_topk_persisted(spark, index_dir, QUERY_IDS[:2], nprobe=1, top_k=3)
    )


def test_ivf_probe_partition_prunes_to_nprobe_cells(spark, sf_dir, index_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    build_ann_index(embs, index_dir, n_cells=8, n_iter=1)
    out = ivf_topk_persisted(spark, index_dir, QUERY_IDS[:1], nprobe=2, top_k=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cell scan carries a cid partition filter → only nprobe of the
    # n_cells partitions are read; no full-corpus scan in the probe
    scans = [ln for ln in plan.splitlines() if "PartitionFilters: [" in ln]
    assert any("cid" in ln and " IN " in ln for ln in scans), scans


def test_pq_persisted_probe_equals_in_query_pq(spark, sf_dir, index_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    build_ann_index(embs, index_dir, n_cells=8, n_iter=1, pq=True, pq_iter=1)
    meta = read_meta(index_dir)
    assert meta["pq"] == {"m": 8, "k": 16, "n_iter": 1}
    want = _rows(pq_topk(embs, QUERY_IDS, top_k=5, shortlist=50, n_iter=1))
    got = _rows(
        pq_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5, shortlist=50)
    )
    assert got == want and got


def test_pq_probe_requires_pq_build(spark, sf_dir, index_dir):
    embs = load_table(spark, "embeddings", sf_dir)
    build_ann_index(embs, index_dir, n_cells=4, n_iter=1)  # no PQ artifact
    with pytest.raises(ValueError):
        pq_topk_persisted(spark, index_dir, QUERY_IDS)


def test_pq_persisted_skips_zero_norm_queries_like_in_query(
    spark, index_dir
):
    """Round-6 advisor (low): pq_topk_persisted divided by the raw
    query norm driver-side, so a zero-norm query embedding raised
    ZeroDivisionError while pq_topk silently dropped it (via
    _unit_corpus) — the 'byte-equal' paths diverged on degenerate
    input. Both must now drop it."""
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(1, 25)]
    rows.append((999, [0.0] * 8))  # zero-norm vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    build_ann_index(
        df, index_dir, n_cells=4, n_iter=1, pq=True, m=8, k=4, pq_iter=1
    )
    got = pq_topk_persisted(spark, index_dir, [1, 999], top_k=3, shortlist=10)
    want = pq_topk(df, [1, 999], top_k=3, shortlist=10, m=8, k=4, n_iter=1)
    assert {r.query_id for r in got.collect()} == {1}
    assert _rows(got) == _rows(want)


@pytest.fixture()
def index_dir2():
    d = tempfile.mkdtemp(prefix="ann_index_test2_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_append_then_probe_equals_rebuild_on_union(
    spark, sf_dir, index_dir, index_dir2
):
    """Incremental maintenance: build(A) + append(B) must be
    probe-for-probe byte-equal to build(A∪B) against the same frozen
    centroids/codebooks — new crawl batches accrete into the persisted
    index with no retrain and no rewrite of existing cells."""
    from rental_data_pipeline_spark.operators.ann_index import append_ann_index
    from rental_data_pipeline_spark.operators.similarity import (
        kmeans_train,
        pq_train,
    )

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    # the trained artifact is frozen on the initial corpus — the
    # standard IVF maintenance split (appends cheap, retrain offline)
    centroids, _ = kmeans_train(a, k=8, n_iter=2)
    codebooks = pq_train(a, m=8, k=16, n_iter=1)
    for d, corpus in ((index_dir, a), (index_dir2, embs)):
        build_ann_index(
            corpus, d, n_cells=8, pq=True,
            centroids=centroids, codebooks=codebooks,
        )
    append_ann_index(b, index_dir)

    got_ivf = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
    want_ivf = _rows(ivf_topk_persisted(spark, index_dir2, QUERY_IDS, top_k=5))
    assert got_ivf == want_ivf and got_ivf
    # appended ids are actually findable (B contains multiples of 3)
    assert any(v % 3 == 0 for _, v, _, _ in got_ivf)
    got_pq = _rows(
        pq_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5, shortlist=50)
    )
    want_pq = _rows(
        pq_topk_persisted(spark, index_dir2, QUERY_IDS, top_k=5, shortlist=50)
    )
    assert got_pq == want_pq and got_pq


def test_streamed_appends_equal_frozen_rebuild(spark, sf_dir, index_dir, index_dir2):
    """Streaming maintenance: build(A) + an embedding STREAM of B in
    three micro-batches must probe byte-equal (IVF and PQ) to a
    frozen-artifact build over A∪B — and a crashed half-written slice
    must heal on replay."""
    import glob
    import os

    from rental_data_pipeline_spark.operators.ann_index import append_ann_index
    from rental_data_pipeline_spark.operators.similarity import (
        kmeans_train,
        pq_train,
    )
    from rental_data_pipeline_spark.streaming.ann_stream import (
        incremental_ann_index_stream,
    )

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    centroids, _ = kmeans_train(a, k=8, n_iter=2)
    codebooks = pq_train(a, m=8, k=16, n_iter=1)
    for d, corpus in ((index_dir, a), (index_dir2, embs)):
        build_ann_index(
            corpus, d, n_cells=8, pq=True,
            centroids=centroids, codebooks=codebooks,
        )

    base = tempfile.mkdtemp(prefix="ann_stream_test_")
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    try:
        for c in range(3):
            b.where(F.pmod(F.col("vec_id"), F.lit(3 * 3)) == c * 3).coalesce(
                1
            ).write.mode("append").parquet(landing)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = incremental_ann_index_stream(stream, index_dir, ckpt)
        q.awaitTermination(180)

        for probe in (
            lambda d: ivf_topk_persisted(spark, d, QUERY_IDS, top_k=5),
            lambda d: pq_topk_persisted(spark, d, QUERY_IDS, top_k=5, shortlist=50),
        ):
            got, want = _rows(probe(index_dir)), _rows(probe(index_dir2))
            assert got == want and got

        # crash simulation: a slice with assignments written but no
        # codes commit is invisible and heals on an idempotent replay
        slices = sorted(glob.glob(f"{index_dir}/appends/b_*"))
        assert len(slices) == 3
        extra = b.limit(0)  # content irrelevant: committed replay no-ops
        append_ann_index(extra, index_dir, batch_id=2)  # no-op (committed)
        assert _rows(
            ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
        ) == _rows(ivf_topk_persisted(spark, index_dir2, QUERY_IDS, top_k=5))

        import shutil as _sh

        # what batch 2 actually carried (file->batch order is the
        # stream's choice), so the replay below is faithful
        b2_ids = [
            r.vec_id
            for r in spark.read.parquet(f"{slices[2]}/assignments")
            .select("vec_id")
            .collect()
        ]
        _sh.rmtree(f"{slices[2]}/codes", ignore_errors=True)  # half-commit
        # uncommitted slice is invisible to probes (no crash, fewer rows)
        assert ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5).count()
        # replay the batch: the slice is rewritten wholesale
        chunk2 = b.where(F.col("vec_id").isin(b2_ids))
        append_ann_index(chunk2, index_dir, batch_id=2)
        assert _rows(
            ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
        ) == _rows(ivf_topk_persisted(spark, index_dir2, QUERY_IDS, top_k=5))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_ann_appends_preserves_probes(spark, sf_dir, index_dir):
    """Append-slice compaction: one consolidated c_* slice replaces
    the per-batch b_* slices, probes unchanged; a crashed compaction
    (no manifest) stays invisible and its sources stay live."""
    import glob
    import os

    from rental_data_pipeline_spark.operators.ann_index import (
        append_ann_index,
        compact_ann_appends,
    )
    from rental_data_pipeline_spark.operators.similarity import (
        kmeans_train,
        pq_train,
    )

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    centroids, _ = kmeans_train(a, k=8, n_iter=1)
    codebooks = pq_train(a, m=8, k=16, n_iter=1)
    build_ann_index(
        a, index_dir, n_cells=8, pq=True,
        centroids=centroids, codebooks=codebooks,
    )
    for i, m in enumerate((0, 3, 6)):
        append_ann_index(
            b.where(F.pmod(F.col("vec_id"), F.lit(9)) == m),
            index_dir, batch_id=i,
        )
    want_ivf = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
    want_pq = _rows(
        pq_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5, shortlist=50)
    )

    assert compact_ann_appends(spark, index_dir)
    assert glob.glob(f"{index_dir}/appends/b_*") == []
    assert len(glob.glob(f"{index_dir}/appends/c_*")) == 1
    assert _rows(
        ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
    ) == want_ivf
    assert _rows(
        pq_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5, shortlist=50)
    ) == want_pq
    # below min_slices: no-op
    assert compact_ann_appends(spark, index_dir) is False

    # appends continue after compaction and compact again with the
    # covered c_* folded in
    append_ann_index(b.limit(0), index_dir, batch_id=10)
    assert compact_ann_appends(spark, index_dir)
    assert _rows(
        ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
    ) == want_ivf
    # crashed compaction: c_ dir without a manifest is invisible and
    # gets garbage-collected on the next run
    os.makedirs(f"{index_dir}/appends/c_000000099/assignments")
    assert _rows(
        ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
    ) == want_ivf
    compact_ann_appends(spark, index_dir)
    assert not os.path.exists(f"{index_dir}/appends/c_000000099")


def test_ann_stream_auto_compacts(spark, sf_dir, index_dir):
    """With compact_every=2 a 3-batch stream must leave the append
    layout compacted mid-stream while probes keep answering."""
    import glob

    from rental_data_pipeline_spark.operators.similarity import kmeans_train
    from rental_data_pipeline_spark.streaming.ann_stream import (
        incremental_ann_index_stream,
    )

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    centroids, _ = kmeans_train(a, k=8, n_iter=1)
    build_ann_index(a, index_dir, n_cells=8, centroids=centroids)

    base = tempfile.mkdtemp(prefix="ann_stream_compact_")
    ref = tempfile.mkdtemp(prefix="ann_ref_")
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    try:
        for c in range(3):
            b.where(F.pmod(F.col("vec_id"), F.lit(9)) == c * 3).coalesce(
                1
            ).write.mode("append").parquet(landing)
        q = incremental_ann_index_stream(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing),
            index_dir, ckpt, compact_every=2,
        )
        q.awaitTermination(180)
        # compaction ran at least once: fewer live b_* than batches
        assert len(glob.glob(f"{index_dir}/appends/c_*")) >= 1
        # the index still answers, with all of b visible
        build_ann_index(embs, ref, n_cells=8, centroids=centroids)
        got = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
        want = _rows(ivf_topk_persisted(spark, ref, QUERY_IDS, top_k=5))
        assert got == want and got
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


def test_append_auto_id_skips_compaction_covered_ids(spark, sf_dir, index_dir):
    """Regression (r7 ADVICE, medium): after compact_ann_appends the
    b_* dirs are gone but their ids stay claimed by the c_* manifest.
    An auto-id append must NOT reuse a covered id — reusing b_000000000
    writes a slice the live manifest already marks covered, so it would
    be permanently invisible to probes (silent data loss)."""
    import glob

    from rental_data_pipeline_spark.operators.ann_index import (
        append_ann_index,
        compact_ann_appends,
    )
    from rental_data_pipeline_spark.operators.similarity import kmeans_train

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    centroids, _ = kmeans_train(a, k=8, n_iter=1)
    build_ann_index(a, index_dir, n_cells=8, centroids=centroids)

    append_ann_index(b.where(F.pmod("vec_id", F.lit(9)) == 0), index_dir)
    append_ann_index(b.where(F.pmod("vec_id", F.lit(9)) == 3), index_dir)
    assert compact_ann_appends(spark, index_dir)
    assert glob.glob(f"{index_dir}/appends/b_*") == []

    # auto-id append AFTER compaction: must land at b_000000002, and
    # its vectors must be probe-visible
    tail = b.where(F.pmod("vec_id", F.lit(9)) == 6)
    append_ann_index(tail, index_dir)
    new = glob.glob(f"{index_dir}/appends/b_*")
    assert [b_.split("/")[-1] for b_ in new] == ["b_000000002"]

    ref = tempfile.mkdtemp(prefix="ann_ref_autoid_")
    try:
        build_ann_index(embs, ref, n_cells=8, centroids=centroids)
        got = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
        want = _rows(ivf_topk_persisted(spark, ref, QUERY_IDS, top_k=5))
        assert got == want and got
    finally:
        shutil.rmtree(ref, ignore_errors=True)


def test_probe_defaults_from_meta_and_recall(spark, sf_dir, index_dir):
    """The probe knobs' build-time defaults are frozen in _meta.json
    and used when the caller passes None; recall@5 at the default
    operating point is pinned against exact cosine top-5, and raising
    the knob to n_cells recovers the exact answer (recall 1.0)."""
    from rental_data_pipeline_spark.operators.similarity import cosine_topk

    embs = load_table(spark, "embeddings", sf_dir)
    build_ann_index(
        embs, index_dir, n_cells=8, n_iter=3, pq=True,
        default_nprobe=2, default_shortlist=50,
    )
    meta = read_meta(index_dir)
    assert meta["defaults"] == {"nprobe": 2, "shortlist": 50}

    qids = [r.vec_id for r in embs.select("vec_id").limit(10).collect()]

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    def recall(got, want):
        num = sum(len(got.get(q, set()) & want[q]) for q in want)
        return num / sum(len(want[q]) for q in want)

    truth = topk_sets(cosine_topk(embs, qids, top_k=5))
    # None → meta default: identical output to the explicit value
    by_default = ivf_topk_persisted(spark, index_dir, qids, top_k=5)
    explicit = ivf_topk_persisted(spark, index_dir, qids, nprobe=2, top_k=5)
    assert _rows(by_default) == _rows(explicit)
    assert recall(topk_sets(by_default), truth) >= 0.5
    # exhaustive probe = exact
    assert recall(
        topk_sets(ivf_topk_persisted(spark, index_dir, qids, nprobe=8, top_k=5)),
        truth,
    ) == 1.0
    # PQ: None → meta default, and a larger shortlist never hurts
    pq_default = pq_topk_persisted(spark, index_dir, qids, top_k=5)
    assert _rows(pq_default) == _rows(
        pq_topk_persisted(spark, index_dir, qids, top_k=5, shortlist=50)
    )
    r50 = recall(topk_sets(pq_default), truth)
    r200 = recall(
        topk_sets(
            pq_topk_persisted(spark, index_dir, qids, top_k=5, shortlist=200)
        ),
        truth,
    )
    assert 0.3 <= r50 <= r200


def test_compacted_append_id_replays_as_noop(spark, sf_dir, index_dir):
    """An append batch id folded then compacted away must no-op on
    replay — rewriting it would leave a permanently invisible slice."""
    import glob

    from rental_data_pipeline_spark.operators.ann_index import (
        append_ann_index,
        compact_ann_appends,
    )
    from rental_data_pipeline_spark.operators.similarity import kmeans_train

    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.where(F.col("vec_id") % 3 != 0)
    b = embs.where(F.col("vec_id") % 3 == 0)
    centroids, _ = kmeans_train(a, k=8, n_iter=1)
    build_ann_index(a, index_dir, n_cells=8, centroids=centroids)
    append_ann_index(b.where(F.pmod("vec_id", F.lit(9)) == 0), index_dir, 0)
    append_ann_index(b.where(F.pmod("vec_id", F.lit(9)) == 3), index_dir, 1)
    assert compact_ann_appends(spark, index_dir)
    want = _rows(ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5))
    # crash-window replay of batch 0 with (stream-contract) same id
    append_ann_index(b.where(F.pmod("vec_id", F.lit(9)) == 0), index_dir, 0)
    assert glob.glob(f"{index_dir}/appends/b_*") == []
    assert _rows(
        ivf_topk_persisted(spark, index_dir, QUERY_IDS, top_k=5)
    ) == want
