from __future__ import annotations

import datetime as dt

from rental_data_pipeline_spark.operators.asof import asof_join_backward


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_backward_basic_and_simultaneous(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(5)), (2, _ts(3))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(9), 200.0), (2, _ts(4), 300.0)],
        "k int, ts timestamp, v double",
    )
    out = {
        (r.k, r.ts): (r.asof_v, r.asof_ts)
        for r in asof_join_backward(
            left, right, key="k", time_col="ts", right_payload=["v", "ts"]
        ).collect()
    }
    assert out[(1, _ts(10))] == (200.0, _ts(9))
    # exactly-simultaneous right row IS visible (<=, not <)
    assert out[(1, _ts(5))] == (100.0, _ts(5))
    # no right row at-or-before -> nulls
    assert out[(2, _ts(3))] == (None, None)


def test_asof_null_payload_not_inherited_from_older_row(spark):
    """A matched right row with a NULL payload field must yield NULL for
    that field — not silently inherit it from an older right row while
    sibling fields come from the newer one (all payload columns must
    come from the SAME matched row)."""
    left = spark.createDataFrame([(1, _ts(10))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), 111.0, "old"), (1, _ts(8), None, "new")],
        "k int, ts timestamp, v double, tag string",
    )
    row = asof_join_backward(
        left, right, key="k", time_col="ts", right_payload=["v", "tag", "ts"]
    ).collect()[0]
    assert row.asof_tag == "new"
    assert row.asof_ts == _ts(8)
    assert row.asof_v is None  # NOT 111.0 from the older row


def test_asof_forward_and_inner(spark):
    from rental_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(5)), (2, _ts(30))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(12), 200.0), (2, _ts(4), 300.0)],
        "k int, ts timestamp, v double",
    )
    fwd = {
        (r.k, r.ts): (r.asof_v, r.asof_ts)
        for r in asof_join(
            left, right, key="k", time_col="ts", right_payload=["v", "ts"],
            direction="forward", how="left",
        ).collect()
    }
    # nearest right row at-or-after: ts 10 -> 12; simultaneous visible
    assert fwd[(1, _ts(10))] == (200.0, _ts(12))
    assert fwd[(1, _ts(5))] == (100.0, _ts(5))
    # no right row at-or-after -> nulls under how='left'
    assert fwd[(2, _ts(30))] == (None, None)
    # ...and dropped entirely under how='inner'
    inner = asof_join(
        left, right, key="k", time_col="ts", right_payload=["v", "ts"],
        direction="forward", how="inner",
    ).collect()
    assert {(r.k, r.ts) for r in inner} == {(1, _ts(10)), (1, _ts(5))}


def test_asof_randomized_against_bruteforce(spark):
    """Seeded randomized differential test: both directions and both
    how-modes against a brute-force python reference, including
    simultaneous timestamps and keys with no right rows."""
    import random

    from rental_data_pipeline_spark.operators.asof import asof_join

    rng = random.Random(42)
    left = [(k, _ts(rng.randrange(0, 60))) for k in range(6) for _ in range(8)]
    right = [
        (k, _ts(rng.randrange(0, 60)), float(rng.randrange(100)))
        for k in range(5)  # key 5 has no right rows
        for _ in range(5)
    ]
    # dedupe right on (k, ts): keep max v so the expected pick is unambiguous
    rmap: dict = {}
    for k, ts, v in right:
        rmap[(k, ts)] = max(v, rmap.get((k, ts), -1.0))
    right = [(k, ts, v) for (k, ts), v in rmap.items()]

    ldf = spark.createDataFrame(left, "k int, ts timestamp")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, v double")

    def brute(direction, how):
        out = []
        for k, ts in left:
            if direction == "backward":
                cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
                pick = max(cands) if cands else None
            else:
                cands = [(rts, v) for rk, rts, v in right if rk == k and rts >= ts]
                pick = min(cands) if cands else None
            if pick is None:
                if how == "left":
                    out.append((k, ts, None, None))
            else:
                out.append((k, ts, pick[1], pick[0]))
        return sorted(out, key=lambda r: (r[0], r[1], str(r[2])))

    for direction in ("backward", "forward"):
        for how in ("left", "inner"):
            got = sorted(
                ((r.k, r.ts, r.asof_v, r.asof_ts)
                 for r in asof_join(
                     ldf, rdf, key="k", time_col="ts",
                     right_payload=["v", "ts"],
                     direction=direction, how=how,
                 ).collect()),
                key=lambda r: (r[0], r[1], str(r[2])),
            )
            assert got == brute(direction, how), (direction, how)
