"""Property-based differential: `asof_join` vs DuckDB's native ASOF
JOIN over Hypothesis-generated tables — both directions, both join
modes, null keys and null times on both sides.

The oracle encodes the engine's null contract explicitly (null
keys/times match nothing; null-time left rows stay unmatched under
``how='left'``): DuckDB's own ASOF implementation *matches* on a NULL
left probe time (measured — its sort-based probe does not evaluate the
inequality three-valued), so the nullable rows are split out before
the ASOF and re-attached after, which is itself a statement of the
contract under test. Right-side (k, t) pairs are generated unique so
neither engine's tie choice among simultaneous right rows is in play
(the deterministic-tiebreak behavior is pinned separately in
test_asof.py / test_operator_hardening5.py).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rental_data_pipeline_spark.operators.asof import asof_join

_key = st.one_of(st.none(), st.integers(1, 3))
_time = st.one_of(st.none(), st.integers(0, 6))

_left = st.lists(st.tuples(_key, _time), min_size=1, max_size=6)
# dict keyed by (k, t) -> unique right rows, no simultaneous ties
_right = st.dictionaries(
    st.tuples(_key, _time), st.integers(0, 99), max_size=8
)


def _vals(rows, cols):
    if not rows:
        nulls = ", ".join(["NULL"] * len(cols))
        return (
            f"(SELECT * FROM (VALUES ({nulls})) t({', '.join(cols)}) "
            "WHERE 1=0)"
        )
    body = ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in r) + ")"
        for r in rows
    )
    return f"(VALUES {body}) t({', '.join(cols)})"


@pytest.mark.parametrize("direction,how", [
    ("backward", "left"), ("backward", "inner"),
    ("forward", "left"), ("forward", "inner"),
])
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_left, right=_right)
def test_asof_join_matches_duckdb(spark, direction, how, left, right):
    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, v) for (k, t), v in right.items()]
    ldf = spark.createDataFrame(lrows, "id long, k long, t long")
    rdf = (
        spark.createDataFrame(rrows, "k long, t long, v long")
        if rrows
        else spark.createDataFrame([], "k long, t long, v long")
    )
    out = asof_join(
        ldf, rdf, key="k", time_col="t",
        right_payload=["v"], direction=direction, how=how,
    )
    got = {r.id: r.asof_v for r in out.collect()}

    op = "<=" if direction == "backward" else ">="
    sql = f"""
    WITH l AS (SELECT CAST(id AS BIGINT) id, CAST(k AS BIGINT) k,
                      CAST(t AS BIGINT) t FROM {_vals(lrows, ["id", "k", "t"])}),
         r AS (SELECT CAST(k AS BIGINT) k, CAST(t AS BIGINT) t,
                      CAST(v AS BIGINT) v FROM {_vals(rrows, ["k", "t", "v"])}
               WHERE k IS NOT NULL AND t IS NOT NULL),
         lm AS (SELECT id, k, t FROM l WHERE k IS NOT NULL AND t IS NOT NULL),
         m AS (SELECT lm.id, r.v
               FROM lm ASOF LEFT JOIN r ON lm.k = r.k AND r.t {op} lm.t)
    SELECT l.id, m.v FROM l LEFT JOIN m USING (id)
    """
    want = {row[0]: row[1] for row in duckdb.connect().execute(sql).fetchall()}
    if how == "inner":
        want = {i: v for i, v in want.items() if v is not None}
    assert got == want
