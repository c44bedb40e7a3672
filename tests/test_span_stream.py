"""Incremental substring-span dedup: chunked folds equal the batch
operator, singletons become duplicates across batches, replay no-ops,
and the frozen window refuses mismatched fingerprints."""

import shutil
import tempfile

import pytest

from rental_data_pipeline_spark.operators.dedup import duplicated_spans
from rental_data_pipeline_spark.streaming.span_stream import (
    fold_spans_batch,
    read_duplicated_spans,
    read_span_window,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="span_stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _srows(df):
    return sorted(
        (r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in df.collect()
    )


def test_cross_batch_spans_equal_batch_operator(spark, root):
    run = " ".join(f"t{i}" for i in range(1, 11))
    other = " ".join(f"u{i}" for i in range(1, 11))
    b0 = spark.createDataFrame(
        [(1, run), (2, f"x y {other}")], "doc_id long, text string"
    )
    # doc 3 duplicates batch 0's span (singleton state row must have
    # entered the state to be promotable); doc 4 repeats it internally
    b1 = spark.createDataFrame(
        [(3, f"pad {run}"), (4, f"{other} mid {other}")],
        "doc_id long, text string",
    )
    fold_spans_batch(spark, root, b0, 0, window=10)
    fold_spans_batch(spark, root, b1, 1, window=10)

    want = _srows(
        duplicated_spans(b0.unionByName(b1), window=10, min_docs=2)
    )
    got = _srows(read_duplicated_spans(spark, root))
    assert got == want
    assert len(got) == 2  # both runs became cross-doc duplicates

    # replaying a committed batch is a no-op (LSM replay contract)
    fold_spans_batch(spark, root, b1, 1, window=10)
    assert _srows(read_duplicated_spans(spark, root)) == want


def test_window_is_frozen_at_first_fold(spark, root):
    b = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 15)))],
        "doc_id long, text string",
    )
    fold_spans_batch(spark, root, b, 0, window=10)
    assert read_span_window(root) == 10
    with pytest.raises(ValueError, match="window=10"):
        fold_spans_batch(spark, root, b, 1, window=5)
