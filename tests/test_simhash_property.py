"""Property test: the incremental SimHash index emits exactly the
batch operator's pairs for ANY corpus and ANY monotonic chunking —
the exactly-once emission claim (each pair surfaces at the later
doc's batch, never again) exercised through the real slice-commit
machinery, with Hypothesis shrinking any divergence."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.dedup import simhash_near_pairs
from rental_data_pipeline_spark.streaming.simhash_stream import (
    fold_simhash_batch,
    read_simhash_pairs,
)

# tiny token pool → many low-Hamming signature collisions, including
# exact twins (Hamming 0) and near-twins across chunk boundaries
WORDS = ["a", "b", "c", "d", "e"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=5),
    min_size=1,
    max_size=12,
).map(lambda texts: [(i, " ".join(t)) for i, t in enumerate(texts)])

cuts_strategy = st.lists(st.integers(0, 11), max_size=2)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, cuts=cuts_strategy)
def test_streamed_simhash_pairs_equal_batch(spark, docs, cuts):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }

    bounds = sorted({0, *cuts, len(docs)})
    root = tempfile.mkdtemp(prefix="simhash_prop_")
    try:
        for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            fold_simhash_batch(
                spark,
                root,
                df.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                b,
            )
        streamed = read_simhash_pairs(spark, root)
        rows = streamed.collect() if streamed is not None else []
        got = {(r.doc_a, r.doc_b, r.hamming) for r in rows}
        assert got == want
        # exactly-once: no pair is re-emitted by a later batch
        assert len(rows) == len(got)
    finally:
        shutil.rmtree(root, ignore_errors=True)
