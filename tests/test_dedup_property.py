"""Property-based equivalence: the hash-prefilter decontamination path
must equal the exact-broadcast path on ARBITRARY corpora — any train /
holdout split, any shingle overlap structure, tiny prefilter moduli
that force hash collisions. Extends the fixed-fixture test in
test_training_ops with Hypothesis shrinking."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rental_data_pipeline_spark.operators.dedup import contamination_report

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@given(train=_corpus, hold=_corpus, mod=st.sampled_from([1, 2, 7, 64]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefilter_equals_exact_on_random_corpora(sparkmod, train, hold, mod):
    spark = sparkmod
    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id long, text string"
    )
    hdf = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(hold)], "doc_id long, text string"
    )
    exact = {tuple(r) for r in contamination_report(tdf, hdf).collect()}
    pref = {
        tuple(r)
        for r in contamination_report(
            tdf, hdf, broadcast_index=False, hash_prefilter=True,
            prefilter_mod=mod,
        ).collect()
    }
    assert pref == exact
