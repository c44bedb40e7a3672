"""End-to-end incremental corpus job: one foreachBatch folding every
artifact equals the batch corpus job over the full corpus — including
after a mid-batch crash + resume — and the monotonic-id contract is
enforced loudly.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.jobs.corpus_job import (
    CorpusConfig,
    build_training_corpus,
)
from rental_data_pipeline_spark.sources.tables import load_table
from rental_data_pipeline_spark.streaming.corpus_stream import (
    fold_corpus_batch,
    incremental_corpus_stream,
    read_incremental_corpus,
)

CFG = dict(
    languages=("en", "de", "fr", "es"), min_quality=0.0, min_tokens=1,
    max_contamination=0.5,
)
# three id-range chunks: the arrival-order contract (monotonic ids)
RANGES = [(0, 170), (170, 340), (340, 100000)]


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="corpus_stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _inputs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    embs = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    streamed = docs.join(embs, "doc_id", "left")
    holdout = docs.where(F.col("doc_id") % 5 == 0)
    return docs, streamed, holdout


def _ids(df, col="doc_id"):
    return {r[0] for r in df.select(col).collect()}


def test_streamed_corpus_equals_batch_job(spark, sf_dir, root):
    from rental_data_pipeline_spark.operators.ann_index import (
        build_ann_index,
        ivf_topk_persisted,
    )
    from rental_data_pipeline_spark.operators.similarity import kmeans_train
    from rental_data_pipeline_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from rental_data_pipeline_spark.operators.textstats import (
        tfidf_top_terms,
        tfidf_top_terms_from_vocab,
    )
    from rental_data_pipeline_spark.streaming.sketch_stream import (
        read_hll_estimate,
    )

    docs, streamed, holdout = _inputs(spark, sf_dir)
    cfg = CorpusConfig(**CFG)
    # centroids trained OFFLINE on the first chunk's embeddings — the
    # trained-centroid composition (round-7 verdict item #4)
    centroids, _ = kmeans_train(
        load_table(spark, "embeddings", sf_dir).where("vec_id < 170"),
        k=4, n_iter=2,
    )

    base = tempfile.mkdtemp(prefix="corpus_landing_")
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    try:
        for lo, hi in RANGES:
            streamed.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).coalesce(1).write.mode("append").parquet(landing)
        q = incremental_corpus_stream(
            spark.readStream.schema(streamed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing),
            root, ckpt, config=cfg, holdout=holdout,
            ann_centroids=centroids, vec_col="embedding",
            semantic_threshold=0.3, span_window=10,
            simhash_max_hamming=3,
        )
        q.awaitTermination(600)

        cfg_sem = CorpusConfig(**CFG, semantic_threshold=0.3)
        cents_frame = spark.createDataFrame(
            list(enumerate(centroids)), "cid int, cv array<double>"
        )
        want = build_training_corpus(
            docs, holdout, cfg_sem,
            embeddings=load_table(spark, "embeddings", sf_dir).select(
                "vec_id", "embedding"
            ),
            semantic_centroids=cents_frame,
        )
        got = read_incremental_corpus(spark, root, cfg)

        # incremental SemDeDup labels == the batch stage's drops
        assert _ids(got["semantic_dropped"]) == _ids(
            want["semantic_dropped"]
        ) and _ids(got["semantic_dropped"])

        # canonical corpus, keeper state, contaminated set
        assert _ids(got["corpus"]) == _ids(want["corpus"])
        assert _ids(got["curated"]) == _ids(want["curated"])
        assert _ids(got["contaminated"]) == _ids(want["contaminated"])
        # substring-span state == the batch operator over the keepers
        from rental_data_pipeline_spark.operators.dedup import (
            duplicated_spans,
        )

        def srows(df):
            return sorted(
                (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
                for r in df.collect()
            )

        got_spans = srows(got["duplicated_spans"])
        assert got_spans == srows(
            duplicated_spans(got["keepers"], window=10)
        ) and got_spans
        # streamed SimHash pairs == the batch operator over the keepers
        from rental_data_pipeline_spark.operators.dedup import (
            simhash_near_pairs,
        )

        def shrows(df):
            return sorted(
                (r.doc_a, r.doc_b, r.hamming) for r in df.collect()
            )

        got_sh = shrows(got["simhash_pairs"])
        assert got_sh == shrows(
            simhash_near_pairs(
                got["keepers"].select("doc_id", "text"), max_hamming=3
            )
        ) and got_sh
        # near-dup pairs with verified jaccard values
        def pset(df):
            return {
                (r.doc_a, r.doc_b, round(r.jaccard, 6))
                for r in df.select("doc_a", "doc_b", "jaccard").collect()
            }

        assert pset(got["pairs"]) == pset(want["pairs"])
        # split assignment: identical doc -> split map (leakage-safe
        # clustering hashed identically through the persisted labels)
        want_split = {r.doc_id: r.split for r in want["split"].collect()}
        got_split = {r.doc_id: r.split for r in got["split"].collect()}
        assert got_split == want_split and got_split
        # metrics roll-up
        assert got["metrics"]["n_raw"] == docs.count()
        assert got["metrics"]["n_keepers"] == want["metrics"]["n_curated"]
        assert got["metrics"]["n_batches"] == 3

        # TF-IDF: scoring the curated corpus from the streamed
        # vocabulary == the batch operator over the same docs
        survivors = docs.join(
            F.broadcast(got["curated"].select("doc_id")), "doc_id"
        )
        def trows(df):
            return sorted(
                (r.doc_id, r.term, r.tf, r.df, r.tfidf, r.rank)
                for r in df.collect()
            )

        assert trows(
            tfidf_top_terms_from_vocab(
                survivors, got["vocab"], got["corpus_size"]
            )
        ) == trows(tfidf_top_terms(survivors))
        assert got["corpus_size"] == survivors.count()

        # HLL: streamed register merge == batch registers over keepers
        def hrows(df):
            return sorted(
                (r.predicted_lang, r.hll_estimate) for r in df.collect()
            )

        batch_est = hll_estimate_from_registers(
            hll_registers(got["keepers"], ["predicted_lang"], "doc_id"),
            ["predicted_lang"],
        )
        streamed_est = read_hll_estimate(spark, f"{root}/hll")
        assert hrows(streamed_est) == hrows(batch_est) and hrows(streamed_est)

        # ANN: probing the streamed index == probing an index built
        # offline over the SAME keeper embeddings and centroids
        keeper_embs = got["keepers"].where(
            F.col("embedding").isNotNull()
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
        qids = sorted(_ids(keeper_embs, "vec_id"))[:5]
        ref = tempfile.mkdtemp(prefix="corpus_ann_ref_")
        try:
            build_ann_index(keeper_embs, ref, n_cells=4, centroids=centroids)
            def arows(df):
                return sorted(
                    (r.query_id, r.vec_id, r.sim, r.rank) for r in df.collect()
                )

            got_ann = arows(
                ivf_topk_persisted(spark, f"{root}/ann", qids, top_k=5)
            )
            assert got_ann == arows(
                ivf_topk_persisted(spark, ref, qids, top_k=5)
            ) and got_ann
        finally:
            shutil.rmtree(ref, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_crash_mid_batch_then_resume_heals(spark, sf_dir, root, monkeypatch):
    """A crash between sub-folds leaves the batch invisible to readers
    (metrics-gated) and is healed by replaying the same batch — the
    committed prefix no-ops, the suffix completes."""
    import os

    import rental_data_pipeline_spark.streaming.df_stream as df_stream

    docs, streamed, holdout = _inputs(spark, sf_dir)
    cfg = CorpusConfig(**CFG)
    chunks = [
        streamed.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).localCheckpoint(eager=True)
        for lo, hi in RANGES
    ]

    fold_corpus_batch(spark, root, chunks[0], 0, cfg, holdout=holdout,
                      span_window=10)

    real = df_stream.fold_docs_batch

    def boom(*a, **kw):
        raise RuntimeError("injected crash before the vocabulary fold")

    monkeypatch.setattr(df_stream, "fold_docs_batch", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        fold_corpus_batch(spark, root, chunks[1], 1, cfg, holdout=holdout,
                          span_window=10)
    monkeypatch.setattr(df_stream, "fold_docs_batch", real)

    # keepers/pairs of batch 1 are committed but the batch is NOT
    # (no metrics row): the read sees only batch 0
    assert os.path.exists(f"{root}/keepers/b_000000001/_SUCCESS")
    assert not os.path.exists(f"{root}/metrics/b_000000001/_SUCCESS")
    partial = read_incremental_corpus(spark, root, cfg)
    assert partial["metrics"]["n_batches"] == 1
    assert _ids(partial["keepers"]) <= {
        r.doc_id for r in chunks[0].collect()
    }

    # replay the crashed batch, then the rest
    fold_corpus_batch(spark, root, chunks[1], 1, cfg, holdout=holdout,
                      span_window=10)
    fold_corpus_batch(spark, root, chunks[2], 2, cfg, holdout=holdout,
                      span_window=10)
    # replay of a fully-committed batch is a no-op
    fold_corpus_batch(spark, root, chunks[2], 2, cfg, holdout=holdout,
                      span_window=10)

    want = build_training_corpus(docs, holdout, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert _ids(got["corpus"]) == _ids(want["corpus"])
    assert {r.doc_id: r.split for r in got["split"].collect()} == {
        r.doc_id: r.split for r in want["split"].collect()
    }
    assert got["metrics"]["n_batches"] == 3


def test_monotonic_id_contract_violation_raises(spark, root):
    cfg = CorpusConfig(
        languages=("en", "und"), min_quality=0.0, min_tokens=1
    )
    text = "the quick brown fox and the lazy dog of the meadow"
    b0 = spark.createDataFrame(
        [(100, text), (101, "another document with the words of note")],
        "doc_id long, text string",
    )
    fold_corpus_batch(spark, root, b0, 0, cfg)
    # same content hash, LOWER id than the stored keeper: must raise,
    # not silently diverge from the batch operator's min-id keeper
    b1 = spark.createDataFrame([(50, text)], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="arrival-order contract"):
        fold_corpus_batch(spark, root, b1, 1, cfg)
    # a same-hash HIGHER id is an ordinary cross-batch exact dup
    b2 = spark.createDataFrame([(200, text)], "doc_id long, text string")
    fold_corpus_batch(spark, root, b2, 1, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert _ids(got["keepers"]) == {100, 101}
    assert got["metrics"]["n_exact_dups"] == 1


def test_rebucket_corpus_migrates_all_tables(spark, sf_dir, root):
    """One offline call migrates every bucketed table under the corpus
    root; reads are identical across the migration and folds continue
    under the new layouts."""
    import json
    import os

    from rental_data_pipeline_spark.streaming.corpus_stream import (
        rebucket_corpus,
    )

    docs, streamed, holdout = _inputs(spark, sf_dir)
    cfg = CorpusConfig(**CFG)
    chunks = [
        streamed.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).localCheckpoint(eager=True)
        for lo, hi in RANGES
    ]
    for i in range(2):
        fold_corpus_batch(spark, root, chunks[i], i, cfg, holdout=holdout,
                          span_window=10, simhash_max_hamming=3)
    before = read_incremental_corpus(spark, root, cfg)
    want_corpus = _ids(before["corpus"])
    want_vocab = {(r.term, r.df) for r in before["vocab"].collect()}
    want_spans = {
        (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in before["duplicated_spans"].collect()
    }
    want_sh = {
        (r.doc_a, r.doc_b) for r in before["simhash_pairs"].collect()
    }

    ran = rebucket_corpus(
        spark, root,
        state_n_buckets=64, index_n_buckets=8,
        labels_n_buckets=8, vocab_n_buckets=8, spans_n_buckets=32,
        simhash_n_buckets=8,
    )
    assert ran == {
        "curation_state": True, "spans": True, "index": True,
        "labels": True, "vocab": True, "simhash": True,
    }
    for table, key in (
        ("curation_state", "n_buckets"), ("index", "n_buckets"),
        ("labels", "n_buckets"), ("vocab", "n_buckets"),
        ("spans", "n_buckets"), ("simhash", "n_buckets"),
    ):
        meta = json.load(open(f"{root}/{table}/_meta.json"))
        assert meta[key] in (64, 32, 8), (table, meta)
        assert not os.path.exists(f"{root}/{table}/_meta.json.pending")

    mid = read_incremental_corpus(spark, root, cfg)
    assert _ids(mid["corpus"]) == want_corpus
    assert {(r.term, r.df) for r in mid["vocab"].collect()} == want_vocab
    assert {
        (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in mid["duplicated_spans"].collect()
    } == want_spans
    assert {
        (r.doc_a, r.doc_b) for r in mid["simhash_pairs"].collect()
    } == want_sh

    # folds continue under the new layouts; final == batch over all
    fold_corpus_batch(spark, root, chunks[2], 2, cfg, holdout=holdout,
                      span_window=10, simhash_max_hamming=3)
    want = build_training_corpus(docs, holdout, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert _ids(got["corpus"]) == _ids(want["corpus"])
    assert {r.doc_id: r.split for r in got["split"].collect()} == {
        r.doc_id: r.split for r in want["split"].collect()
    }
    # streamed span state survives migration + new fold == batch op
    from rental_data_pipeline_spark.operators.dedup import duplicated_spans

    got_spans = {
        (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in got["duplicated_spans"].collect()
    }
    assert got_spans == {
        (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in duplicated_spans(got["keepers"], window=10).collect()
    }
    # same-count re-run: all no-ops
    assert rebucket_corpus(spark, root) == {
        "curation_state": False, "spans": False, "index": False,
        "labels": False, "vocab": False, "simhash": False,
    }


def test_rejected_and_empty_batches_fold_cleanly(spark, root):
    """Batches that contribute nothing (all docs gate-rejected, or
    zero rows) still commit: every artifact stays readable and later
    batches fold normally."""
    cfg = CorpusConfig(
        languages=("en",), min_quality=0.0, min_tokens=3,
        expectations={"has_text": F.col("text").isNotNull()},
    )
    # batch 0: one null-text row (expectation quarantine) + one
    # too-short row (gate rejection) -> zero keepers
    b0 = spark.createDataFrame(
        [(1, None), (2, "the cat")], "doc_id long, text string"
    )
    fold_corpus_batch(spark, root, b0, 0, cfg)
    # batch 1: zero rows
    b1 = spark.createDataFrame([], "doc_id long, text string")
    fold_corpus_batch(spark, root, b1, 1, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert got["metrics"] == {
        "n_batches": 2, "n_raw": 2, "n_quarantined": 1,
        "n_gate_rejected": 1, "n_exact_dups": 0, "n_keepers": 0,
    }
    assert got["corpus"].count() == 0
    assert got["split"].count() == 0
    # batch 2: a real doc folds normally after the empty prefix
    b2 = spark.createDataFrame(
        [(3, "the cat sat on the mat")], "doc_id long, text string"
    )
    fold_corpus_batch(spark, root, b2, 2, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert _ids(got["corpus"]) == {3}
    assert got["metrics"]["n_keepers"] == 1


def test_empty_batches_fold_cleanly_without_expectations(spark, root):
    """Sibling of the zero-keeper case: an expectations-FREE config
    takes a different code path (no quarantine slice, no obs_q), and
    the obs_raw/obs_scored hazards must hold there too — a zero-row
    batch and an all-gate-rejected batch both commit cleanly."""
    cfg = CorpusConfig(languages=("en",), min_quality=0.0, min_tokens=3)
    b0 = spark.createDataFrame([], "doc_id long, text string")
    fold_corpus_batch(spark, root, b0, 0, cfg)
    # too short for min_tokens=3 -> gate-rejected, zero keepers
    b1 = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    fold_corpus_batch(spark, root, b1, 1, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert got["metrics"] == {
        "n_batches": 2, "n_raw": 1, "n_quarantined": 0,
        "n_gate_rejected": 1, "n_exact_dups": 0, "n_keepers": 0,
    }
    assert got["corpus"].count() == 0
    b2 = spark.createDataFrame(
        [(2, "the cat sat on the mat")], "doc_id long, text string"
    )
    fold_corpus_batch(spark, root, b2, 2, cfg)
    got = read_incremental_corpus(spark, root, cfg)
    assert _ids(got["corpus"]) == {2}
    assert got["metrics"]["n_keepers"] == 1


def test_as_of_batch_time_travel(spark, sf_dir, root):
    """read_incremental_corpus(as_of_batch=N) reconstructs the corpus
    exactly as it stood after batch N committed — the keeper/pair/
    semantic/contaminated slices are a durable event log, so history
    needs no retained versions."""
    from rental_data_pipeline_spark.operators.similarity import kmeans_train

    docs, streamed, holdout = _inputs(spark, sf_dir)
    cfg = CorpusConfig(**CFG)
    centroids, _ = kmeans_train(
        load_table(spark, "embeddings", sf_dir).where("vec_id < 170"),
        k=4, n_iter=2,
    )
    chunks = [
        streamed.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).localCheckpoint(eager=True)
        for lo, hi in RANGES
    ]

    def snap(r):
        return {
            "corpus": _ids(r["corpus"]),
            "split": {x.doc_id: x.split for x in r["split"].collect()},
            "curated": _ids(r["curated"]),
            "vocab": {(x.term, x.df) for x in r["vocab"].collect()},
            "size": r["corpus_size"],
            "sem": _ids(r["semantic_dropped"]),
            "contaminated": _ids(r["contaminated"]),
            "metrics": r["metrics"],
            # live = streamed span state; as-of = batch operator over
            # keepers ≤ N: equality per prefix proves the span fold
            "spans": sorted(
                (x.span_hash, x.keeper_id, x.n_copies, x.n_docs)
                for x in r["duplicated_spans"].collect()
            ),
        }

    live = []
    for i in range(3):
        fold_corpus_batch(
            spark, root, chunks[i], i, cfg, holdout=holdout,
            ann_centroids=centroids, vec_col="embedding",
            semantic_threshold=0.3, span_window=10,
        )
        live.append(snap(read_incremental_corpus(spark, root, cfg)))

    for i in range(3):
        got = snap(
            read_incremental_corpus(spark, root, cfg, as_of_batch=i)
        )
        assert got == live[i], f"as_of_batch={i} diverges"
    # growth really happened (the snapshots differ)
    assert live[0]["corpus"] < live[2]["corpus"]
