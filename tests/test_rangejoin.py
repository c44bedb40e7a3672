"""Range join + gap-fill unit tests (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators import rangejoin as RJ
from rental_data_pipeline_spark.operators import textstats as TS


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_point_in_interval_numeric_axis(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 25.0)], "p_id long, x double")
    iv = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 8.0, 30.0)], "iv_id long, lo double, hi double"
    )
    got = {
        (r.p_id, r.iv_id)
        for r in RJ.point_in_interval_join(pts, iv, "x", "lo", "hi", F.lit(7.0)).collect()
    }
    # hi exclusive: x=10 not in [0,10); spanning interval catches both
    assert got == {(1, 100), (2, 200), (3, 200)}


def test_point_in_interval_timestamp_spanning_bins(spark):
    # interval longer than bin_width must match points in every covered bin
    pts = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 0{i}:30:00")) for i in range(4)], "p_id long, t timestamp"
    )
    iv = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00"))],
        "iv_id long, lo timestamp, hi timestamp",
    )
    out = RJ.point_in_interval_join(
        pts, iv, "t", "lo", "hi", F.expr("INTERVAL 1 HOUR")
    ).collect()
    assert sorted(r.p_id for r in out) == [0, 1, 2]  # 03:30 excluded
    # no duplicate pairs from the bin explosion
    assert len(out) == len({(r.p_id, r.iv_id) for r in out})


def test_point_in_interval_left_outer_restores_unmatched(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 99.0)], "p_id long, x double")
    iv = spark.createDataFrame([(7, 0.0, 10.0)], "iv_id long, lo double, hi double")
    out = RJ.point_in_interval_join(
        pts, iv, "x", "lo", "hi", F.lit(10.0), how="left_outer"
    ).collect()
    rows = {r.p_id: r for r in out}
    assert len(out) == 2 and rows[1].iv_id == 7 and rows[2].iv_id is None


def test_gapfill_locf_inherits_and_bucket_last_wins(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 10.0),
            (1, _ts("2024-01-01 17:00:00"), 20.0),  # same bucket, later → wins
            (1, _ts("2024-01-04 00:00:00"), 40.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = RJ.gapfill_locf(df, "k", "ts", ["v"], step=F.expr("INTERVAL 1 DAY"))
    by_tick = {r.tick.day: r.v for r in out.collect()}
    # 4 ticks: Jan 1 (bucket-last 20), Jan 2-3 inherit, Jan 4 = 40
    assert by_tick == {1: 20.0, 2: 20.0, 3: 20.0, 4: 40.0}


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in TS.char_entropy(df).collect()}
    assert rows[1].char_entropy_bits == 0.0  # uniform single symbol
    assert rows[2].char_entropy_bits == 1.0  # fair coin
    assert rows[3].char_entropy_bits == 2.0  # 4 equiprobable symbols
    assert rows[3].n_chars_counted == 4
