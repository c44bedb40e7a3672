"""SCD2 intervals: gaps-and-islands over snapshot history."""

from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.scd import scd2_intervals


def _snaps(spark):
    rows = [
        # key 1: price 100 (two snapshots), then 120, then back to 100
        (1, "2024-01-01", 100.0, "active"),
        (1, "2024-01-02", 100.0, "active"),
        (1, "2024-01-03", 120.0, "active"),
        (1, "2024-01-05", 100.0, "active"),
        # key 2: null price then a value (null-safe change detection)
        (2, "2024-01-01", None, "active"),
        (2, "2024-01-02", None, "active"),
        (2, "2024-01-04", 55.0, "non active"),
    ]
    return spark.createDataFrame(
        rows, "k long, ts string, price double, status string"
    ).withColumn("ts", F.to_date("ts"))


def test_scd2_collapses_runs_and_closes_intervals(spark):
    out = scd2_intervals(_snaps(spark), "k", "ts", ["price", "status"])
    rows = sorted(
        ((r.k, str(r.valid_from), str(r.valid_to), r.price) for r in out.collect())
    )
    assert rows == [
        (1, "2024-01-01", "2024-01-03", 100.0),
        (1, "2024-01-03", "2024-01-05", 120.0),
        (1, "2024-01-05", "None", 100.0),   # value RETURNS: a new interval
        (2, "2024-01-01", "2024-01-04", None),  # null run collapses
        (2, "2024-01-04", "None", 55.0),
    ]


def test_scd2_as_of_lookup(spark):
    out = scd2_intervals(_snaps(spark), "k", "ts", ["price", "status"])
    as_of = out.where(
        (F.col("valid_from") <= F.lit("2024-01-04"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit("2024-01-04")))
    )
    got = {r.k: r.price for r in as_of.collect()}
    assert got == {1: 120.0, 2: 55.0}  # the record as of Jan 4


def test_scd2_partition_invariant(spark):
    a = scd2_intervals(_snaps(spark), "k", "ts", ["price", "status"]).collect()
    b = scd2_intervals(
        _snaps(spark).repartition(7), "k", "ts", ["price", "status"]
    ).collect()
    key = lambda r: tuple(map(str, r))  # noqa: E731 — None-safe sort
    assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key)
