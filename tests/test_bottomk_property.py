"""Hypothesis differential for the bottom-k quantile sketch: the
Spark two-level operator vs a pure-Python model of its contract, plus
the merge fold, over random frames with NULL groups, NULL keys,
duplicate keys, and NULL payloads.

The model is ~15 lines of the sketch's SPEC (filter null keys, order
by (md5('sq'||key), key, value nulls-last), take k per group, carry
the true count) — an independent implementation, so a divergence
means the distributed plan broke the contract, not that two copies of
the same code agree."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rental_data_pipeline_spark.operators.sketch import (
    bottomk_sample_state,
    merge_bottomk_states,
)

_K = 4

_row = st.tuples(
    st.sampled_from(["g0", "g1", None]),            # group (nullable)
    st.one_of(st.none(), st.integers(0, 50)),       # value (nullable)
    st.one_of(st.none(), st.sampled_from([f"k{i}" for i in range(12)])),
)


def _model(rows, k=_K):
    """The sketch contract, independently: per non-null-key row,
    h = md5('sq'+key); per group keep the k smallest (h, key,
    value-nulls-last) rows; every kept row carries the group's
    non-null-key count."""
    kept = [(g, v, key) for g, v, key in rows if key is not None]

    def order(r):
        g, v, key = r
        h = hashlib.md5(("sq" + key).encode()).hexdigest()
        return (h, key, (v is None, v if v is not None else 0))

    out = []
    groups = {g for g, _, _ in kept}
    for grp in groups:
        mine = sorted((r for r in kept if r[0] == grp), key=order)
        n = len(mine)
        h_of = lambda key: hashlib.md5(("sq" + key).encode()).hexdigest()
        out += [(g, v, key, h_of(key), n) for g, v, key in mine[:k]]
    return sorted(out, key=lambda t: tuple((x is None, x) for x in t))


def _norm(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=40))
def test_bottomk_state_matches_model_and_merge(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long, key string")
    want = _model(rows)
    state = bottomk_sample_state(df, ["g"], "v", "key", k=_K, n_shards=3)
    assert _norm(state) == want
    # merge fold over a disjoint split == whole, same model
    with_id = list(enumerate(rows))
    a = [r for i, r in with_id if i % 2 == 0]
    b = [r for i, r in with_id if i % 2 == 1]
    if a and b:
        sa = bottomk_sample_state(
            spark.createDataFrame(a, "g string, v long, key string"),
            ["g"], "v", "key", k=_K,
        )
        sb = bottomk_sample_state(
            spark.createDataFrame(b, "g string, v long, key string"),
            ["g"], "v", "key", k=_K,
        )
        merged = merge_bottomk_states(sa, sb, ["g"], "key", k=_K)
        assert _norm(merged) == want
