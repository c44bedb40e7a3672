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


def test_scd2_property_vs_python_fold(spark):
    """Hypothesis: random snapshot histories through the Spark
    gaps-and-islands vs a straightforward Python fold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    days = [f"2024-01-{d:02d}" for d in range(1, 10)]
    _snap = st.tuples(
        st.sampled_from([1, 2]),
        st.sampled_from(days),
        st.sampled_from([None, 10.0, 20.0]),
    )
    _hist = st.lists(_snap, min_size=1, max_size=12, unique_by=lambda t: (t[0], t[1]))

    def python_fold(rows):
        out = []
        for k in sorted({r[0] for r in rows}):
            hist = sorted(
                ((ts, p) for kk, ts, p in rows if kk == k),
                key=lambda t: (t[0], (t[1] is None, t[1])),
            )
            runs = []
            for ts, p in hist:
                if not runs or runs[-1][1] != p:
                    runs.append((ts, p))
            for i, (ts, p) in enumerate(runs):
                vt = runs[i + 1][0] if i + 1 < len(runs) else None
                out.append((k, p, ts, vt))
        return sorted(out, key=lambda t: tuple(map(str, t)))

    @given(rows=_hist)
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(rows):
        df = spark.createDataFrame(rows, "k long, ts string, price double").withColumn(
            "ts", F.to_date("ts")
        )
        got = sorted(
            (
                (r.k, r.price, str(r.valid_from), str(r.valid_to) if r.valid_to else None)
                for r in scd2_intervals(df, "k", "ts", ["price"]).collect()
            ),
            key=lambda t: tuple(map(str, t)),
        )
        want = python_fold(rows)
        assert got == want, (rows, got, want)

    run()


def test_scd2_plan_bounded_shuffles(spark):
    import re

    out = scd2_intervals(_snaps(spark), "k", "ts", ["price", "status"])
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange\b", plan)) <= 2
    assert "EvalPython" not in plan and "MapInPandas" not in plan
