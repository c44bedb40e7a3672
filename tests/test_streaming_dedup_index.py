"""Incremental MinHash/LSH index == batch LSH over the full corpus.

The maintainer folds a chunked document stream; the union of pairs it
emits must equal ``minhash_lsh_pairs`` run once over everything — the
property that makes "check each crawl batch against the whole corpus
without recomputing the index" trustworthy.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
from rental_data_pipeline_spark.sources.tables import load_table
from rental_data_pipeline_spark.streaming.dedup_index import (
    incremental_minhash_index_stream,
    read_emitted_pairs,
    read_index_bands,
    read_index_shingles,
)


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="dedup_index_test_")
    yield f"{d}/landing", f"{d}/index", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # guaranteed near-dups: exact twins at +100000; 100000 % 3 == 1, so
    # a twin always lands in a DIFFERENT chunk than its original — every
    # twin pair must be found by the new-vs-old probe, not new-vs-new
    twins = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return docs.unionByName(twins)


def test_incremental_index_equals_batch_lsh(spark, sf_dir, tmpdirs):
    landing, index, ckpt = tmpdirs
    corpus = _corpus(spark, sf_dir)
    for c in range(3):
        corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == c).coalesce(
            1
        ).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = incremental_minhash_index_stream(stream, index, ckpt, threshold=0.8)
    q.awaitTermination(180)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_emitted_pairs(spark, index).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(corpus, threshold=0.8).collect()
    }
    assert got == want
    # the twin pairs guarantee non-triviality and cross-chunk coverage
    twin_pairs = {(a, b) for a, b, _ in want if b - a == 100000}
    assert twin_pairs and twin_pairs <= {(a, b) for a, b, _ in got}

    # each emitted pair appears exactly once (no batch re-emits)
    all_rows = read_emitted_pairs(spark, index).groupBy("doc_a", "doc_b").count()
    assert all_rows.where(F.col("count") > 1).count() == 0

    # the accumulated index covers the whole corpus
    n_docs = corpus.count()
    assert read_index_shingles(spark, index).count() == n_docs
    assert read_index_bands(spark, index).select("doc").distinct().count() == n_docs


def test_incremental_index_new_batch_only_touches_index_reads(spark, sf_dir, tmpdirs):
    """A later fold must APPEND a batch slice, never rewrite prior
    commits — the O(|batch|) maintenance property."""
    import glob
    import os

    landing, index, ckpt = tmpdirs
    corpus = _corpus(spark, sf_dir)
    corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == 0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = incremental_minhash_index_stream(stream, index, ckpt, threshold=0.8)
        q.awaitTermination(180)

    run()
    first = sorted(glob.glob(f"{index}/bands/b_*"))
    assert len(first) == 1
    mtimes = {p: os.path.getmtime(p + "/_SUCCESS") for p in first}

    corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run()
    second = sorted(glob.glob(f"{index}/bands/b_*"))
    assert len(second) == 2
    for p in first:  # prior commits untouched byte-for-byte
        assert os.path.getmtime(p + "/_SUCCESS") == mtimes[p]
