"""Property test: the cross-batch curation fold (per-batch scoring +
insert-if-absent against the bucketed content-hash state) equals batch
``curate_corpus`` over the concatenated corpus, for ANY corpus and ANY
monotonic chunking — the keyed-min-fold associativity claim of
``textstats.curation_dedup``, exercised through the real LSM state
machinery the corpus stream uses.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small token pool → frequent cross-batch exact dups (the interesting
# case); words carry an English stopword so the language gate passes
WORDS = ["the", "alpha", "beta", "gamma", "delta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=4),
    min_size=1,
    max_size=14,
).map(lambda texts: [(i, " ".join(t)) for i, t in enumerate(texts)])

cuts_strategy = st.lists(st.integers(0, 13), max_size=2)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, cuts=cuts_strategy)
def test_streamed_curation_state_equals_batch(spark, docs, cuts):
    from rental_data_pipeline_spark.jobs.corpus_job import CorpusConfig
    from rental_data_pipeline_spark.operators.textstats import curate_corpus
    from rental_data_pipeline_spark.streaming.corpus_stream import (
        fold_corpus_batch,
        read_incremental_corpus,
    )

    cfg = CorpusConfig(
        languages=("en", "und"), min_tokens=1, min_quality=0.0
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (r.doc_id, r.content_hash)
        for r in curate_corpus(
            df, languages=cfg.languages, min_tokens=1, min_quality=0.0
        ).collect()
    }

    # chunk by id at the (sorted, deduped) cut points — monotonic ids
    bounds = sorted({c for c in cuts if 0 < c < len(docs)}) + [10**9]
    root = tempfile.mkdtemp(prefix="curation_prop_")
    try:
        lo = 0
        for i, hi in enumerate(bounds):
            fold_corpus_batch(
                spark,
                root,
                df.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
                i,
                cfg,
                hll_group_cols=[],  # curation fold under test, skip hll
            )
            lo = hi
        got = read_incremental_corpus(spark, root, cfg)
        assert {
            (r.doc_id, r.content_hash) for r in got["curated"].collect()
        } == want
        assert got["metrics"]["n_keepers"] == len(want)
    finally:
        shutil.rmtree(root, ignore_errors=True)
