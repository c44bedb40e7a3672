"""Property-based check of the substring-dedup family against a pure-
Python reference on ARBITRARY corpora: duplicated spans, maximal
extents, coverage, and the cut rewrite must all agree with a direct
O(n²) model — Hypothesis shrinks any divergence to a minimal corpus."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rental_data_pipeline_spark.operators.dedup import (
    cross_doc_span_coverage,
    cut_duplicated_spans,
    duplicated_span_extents,
    duplicated_spans,
)

# tiny vocabulary + short window so random corpora actually collide
WORDS = ["a", "b", "c", "d"]
W = 3

_doc = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _model(texts):
    """Pure-Python reference: spans, per-doc cut positions, extents."""
    toks = {i: t.split() if t.strip() else [""] for i, t in enumerate(texts)}
    # NB: "".split() == [] but split(trim, \s+) of "" is [""] in Spark;
    # model the engine's tokenization exactly
    occ = {}  # span -> list[(doc, pos)]
    for d, ts in toks.items():
        for p in range(len(ts) - W + 1):
            occ.setdefault(tuple(ts[p:p + W]), []).append((d, p + 1))
    dup = {s: o for s, o in occ.items() if len({d for d, _ in o}) >= 2}
    spans = {
        hashlib.md5(" ".join(s).encode()).hexdigest(): (
            min(d for d, _ in o), len(o), len({d for d, _ in o})
        )
        for s, o in dup.items()
    }
    cutpos = {}  # doc -> set of 1-based cut token positions
    dup_pos = {}  # doc -> set of duplicated window start positions
    for s, o in dup.items():
        keeper = min(d for d, _ in o)
        for d, p in o:
            dup_pos.setdefault(d, set()).add(p)
            if d != keeper:
                cutpos.setdefault(d, set()).update(range(p, p + W))
    extents = {}  # doc -> set[(start, end)] merged maximal intervals
    for d, ps in dup_pos.items():
        ivs = []
        for p in sorted(ps):
            if ivs and p - ivs[-1][1] <= W:
                ivs[-1] = (ivs[-1][0], p)
            else:
                ivs.append((p, p))
        extents[d] = {(s, e + W - 1) for s, e in ivs}
    return toks, spans, cutpos, extents


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@given(corpus=_corpus)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_family_matches_python_model(sparkmod, corpus):
    spark = sparkmod
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    toks, spans, cutpos, extents = _model(corpus)

    got_spans = {
        r.span_hash: (r.keeper_id, r.n_copies, r.n_docs)
        for r in duplicated_spans(df, window=W).collect()
    }
    assert got_spans == spans

    got_ext = {}
    for r in duplicated_span_extents(df, window=W).collect():
        got_ext.setdefault(r.doc_id, set()).add((r.span_start, r.span_end))
    assert got_ext == extents

    cov = {
        r.doc_id: r.dup_span_tokens
        for r in cross_doc_span_coverage(df, window=W).collect()
    }
    want_cov = {
        d: sum(e - s + 1 for s, e in extents.get(d, set()))
        for d in toks
    }
    assert cov == want_cov

    cut = {
        r.doc_id: r.text
        for r in cut_duplicated_spans(df, window=W).collect()
    }
    want_cut = {
        d: " ".join(
            tk for i, tk in enumerate(ts, start=1)
            if i not in cutpos.get(d, set())
        )
        for d, ts in toks.items()
    }
    assert cut == want_cut
