"""Data-quality expectations: one-pass tagging, split, metrics."""

import re

from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.expectations import (
    VIOLATIONS_COL,
    expectation_metrics,
    quarantine_invalid,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("1", 100.0, "active"),
            ("2", -5.0, "active"),       # bad price
            (None, 70.0, "active"),      # bad key
            ("4", None, "unknown"),      # null price (strict fail) + bad status
            ("5", 80.0, "non active"),
        ],
        "offer_id string, price_value double, status string",
    )


def _rules():
    return {
        "positive_price": F.col("price_value") > 0,
        "key_present": F.col("offer_id").isNotNull(),
        "known_status": F.col("status").isin("active", "non active"),
    }


def test_validate_tags_and_split(spark):
    clean, bad = quarantine_invalid(_df(spark), _rules())
    assert {r.offer_id for r in clean.collect()} == {"1", "5"}
    tags = {r.offer_id: list(r[VIOLATIONS_COL]) for r in bad.collect()}
    assert tags["2"] == ["positive_price"]
    assert tags[None] == ["key_present"]
    assert tags["4"] == ["known_status", "positive_price"]  # null price = fail
    assert VIOLATIONS_COL not in clean.columns


def test_metrics_one_pass(spark):
    m = expectation_metrics(_df(spark), _rules())
    assert m == {
        "_rows": 5, "positive_price": 2, "key_present": 1, "known_status": 1
    }


def test_validate_is_map_side(spark):
    tagged = validate(_df(spark), _rules())
    tagged.write.format("noop").mode("overwrite").save()
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert not re.search(r"EvalPython|MapInPandas", plan)


def test_null_strictness_opt_out(spark):
    rules = {
        "positive_price": F.coalesce(F.col("price_value") > 0, F.lit(True)),
    }
    clean, bad = quarantine_invalid(_df(spark), rules)
    assert {r.offer_id for r in bad.collect()} == {"2"}  # null price passes


def test_metrics_on_empty_frame(spark):
    m = expectation_metrics(_df(spark).limit(0), _rules())
    assert m == {
        "_rows": 0, "positive_price": 0, "key_present": 0, "known_status": 0
    }


def test_expectations_property_vs_pandas(spark):
    """Hypothesis: random rows through the one-pass tagger vs a plain
    per-row Python evaluation of the same rules (strict nulls)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _row = st.tuples(
        st.one_of(st.none(), st.sampled_from(["1", "2"])),
        st.one_of(st.none(), st.sampled_from([-5.0, 0.0, 100.0])),
        st.one_of(st.none(), st.sampled_from(["active", "weird"])),
    )

    def py_violations(offer_id, price, status):
        out = []
        if not (status in ("active", "non active")):
            out.append("known_status")
        if offer_id is None:
            out.append("key_present")
        if not (price is not None and price > 0):
            out.append("positive_price")
        return sorted(out)

    @given(rows=st.lists(_row, min_size=0, max_size=8))
    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(rows):
        df = spark.createDataFrame(
            rows, "offer_id string, price_value double, status string"
        )
        got = [
            (r.offer_id, r.price_value, list(r[VIOLATIONS_COL]))
            for r in validate(df, _rules()).collect()
        ]
        want = sorted(
            [(oid, p, py_violations(oid, p, s)) for oid, p, s in rows],
            key=lambda t: tuple(map(str, t)),
        )
        assert sorted(got, key=lambda t: tuple(map(str, t))) == want
        m = expectation_metrics(df, _rules())
        assert m["_rows"] == len(rows)
        per_row = [py_violations(oid, p, s) for oid, p, s in rows]
        for rule in ("positive_price", "key_present", "known_status"):
            assert m[rule] == sum(rule in v for v in per_row)

    run()
