"""Property test: the incremental span-hash fold equals the
multi-window batch operator over the concatenated corpus, for ANY
corpus, ANY monotonic chunking, and ANY compaction cadence — the
keyed-merge associativity claim of ``streaming/span_stream.py``
(min-keeper / sum-occurrences / sum-distinct-docs over disjoint doc
sets), exercised through the real size-tiered slice machinery
(delta slices, merge-on-read, cascading compactions, single-slice
fast path) including the binary128 key round-trip on arbitrary
(non-ASCII) tokens.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny window (3) + a small token pool → frequent cross-batch span
# promotion, internal repeats, and sub-window docs; non-ASCII words
# exercise the unhex/hex state-key round-trip
WORDS = ["в", "alpha", "β", "gamma", "δδ"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=8),
    min_size=1,
    max_size=12,
).map(lambda texts: [(i, " ".join(t)) for i, t in enumerate(texts)])

cuts_strategy = st.lists(st.integers(0, 11), max_size=2)

# compact_every=1 compacts after EVERY fold (cascades through levels,
# and reads hit the single-slice fast path); 2 mixes mid-stream
# compactions with multi-slice merge-on-read; 1000 never compacts
compaction_strategy = st.tuples(
    st.sampled_from([1, 2, 1000]), st.sampled_from([2, 8])
)

WINDOWS = [3, 5]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, cuts=cuts_strategy, compaction=compaction_strategy)
def test_chunked_span_fold_equals_batch_sweep(spark, docs, cuts, compaction):
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.dedup import (
        multi_window_duplicated_spans,
    )
    from rental_data_pipeline_spark.streaming.span_stream import (
        fold_spans_batch,
        read_duplicated_spans,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = sorted(
        (r.window, r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
        for r in multi_window_duplicated_spans(
            df, windows=WINDOWS, min_docs=1
        ).collect()
    )

    bounds = sorted({c for c in cuts if 0 < c < len(docs)}) + [10**9]
    root = tempfile.mkdtemp(prefix="span_prop_")
    try:
        lo = 0
        for b, hi in enumerate(bounds):
            fold_spans_batch(
                spark, root,
                df.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                b, window=WINDOWS, n_state_buckets=4,
                compact_every=compaction[0], fanin=compaction[1],
            )
            lo = hi
        got_df = read_duplicated_spans(spark, root, min_docs=1)
        got = (
            []
            if got_df is None
            else sorted(
                (r.window, r.span_hash, r.keeper_id, r.n_copies, r.n_docs)
                for r in got_df.collect()
            )
        )
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
