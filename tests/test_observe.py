"""SafeObservation: ride-along metrics that survive empty-plan collapse.

The round-10 postmortem: an all-rejected micro-batch collapsed the
observed plan so the ``CollectMetrics`` node never executed and a bare
``Observation.get`` crashed the corpus stream. These tests pin (a) the
fast path on normal plans, (b) the fallback when the metrics row is
unavailable, and (c) zero-row inputs through every Observation-bearing
operator surface reporting zeros instead of crashing.
"""

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.observe import SafeObservation


def test_fast_path_counts(spark):
    obs = SafeObservation("m")
    df = obs.on(
        spark.range(100),
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("id"), F.lit(0)).alias("s"),
    )
    assert df.count() == 100
    got = obs.get
    assert got["n"] == 100 and got["s"] == 4950


def test_fallback_when_metrics_row_unavailable(spark, monkeypatch):
    """When the inner Observation cannot produce its row (the collapsed
    empty-plan case), .get re-runs the same aggregates as one explicit
    job and returns the true values."""
    obs = SafeObservation()
    df = obs.on(
        spark.range(10).where(F.col("id") < 3),
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("id"), F.lit(0)).alias("s"),
    )
    df.count()

    class _Boom:
        @property
        def get(self):
            raise RuntimeError("toPyRow assertion (simulated collapse)")

    monkeypatch.setattr(obs, "_obs", _Boom())
    got = obs.get
    assert got["n"] == 3 and got["s"] == 3


def test_unrelated_get_failure_reraises(spark, monkeypatch):
    """A .get failure that does NOT match the missing-metrics-row
    signatures (interrupted job, dead gateway, real bridge bug) must
    re-raise, not silently recompute — the recomputed value could
    differ from what the completed action actually observed."""
    obs = SafeObservation()
    df = obs.on(spark.range(3), F.count(F.lit(1)).alias("n"))
    df.count()

    class _Unrelated:
        @property
        def get(self):
            raise ConnectionError("py4j gateway connection refused")

    monkeypatch.setattr(obs, "_obs", _Unrelated())
    with pytest.raises(ConnectionError, match="gateway"):
        obs.get


def test_zero_row_observed_plans_report_zero(spark):
    """Filter-to-empty frames (plain, checkpointed, post-scoring) report
    n=0 via whichever path survives — never a crash. This is the generic
    gate the round-10 bug showed was missing: any operator that attaches
    an Observation must tolerate an input that optimizes to an empty
    LocalRelation."""
    from rental_data_pipeline_spark.operators.textstats import (
        curation_dedup,
        curation_scored,
    )

    # plain empty-after-filter
    o1 = SafeObservation()
    d1 = o1.on(spark.range(5).where("id < 0"), F.count(F.lit(1)).alias("n"))
    d1.groupBy().count().collect()
    assert o1.get["n"] == 0

    # eager localCheckpoint of an empty frame (the corpus-stream obs_raw shape)
    o2 = SafeObservation()
    d2 = o2.on(
        spark.createDataFrame([], "doc_id long, text string"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    d2.count()
    assert o2.get["n"] == 0

    # curation scoring over an empty checkpointed batch (the obs_scored
    # shape that crashed fold_corpus_batch in round 10)
    empty = (
        spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
        .where(F.length("text") > 1000)
        .localCheckpoint(eager=True)
    )
    o3 = SafeObservation()
    scored = o3.on(
        curation_scored(
            empty, text_col="text", id_col="doc_id", languages=("en",),
            min_tokens=3, max_tokens=100, min_quality=0.0,
        ),
        F.count(F.lit(1)).alias("n"),
    )
    curation_dedup(scored, "doc_id").collect()
    assert o3.get["n"] == 0


def test_observed_quarantine_zero_rows(spark):
    """The shared ingest gate reports _rows=0 and zero per-rule
    violations on an empty ingest instead of crashing after the fact."""
    from rental_data_pipeline_spark.operators.expectations import (
        observed_quarantine,
    )

    df = spark.createDataFrame([], "id long, text string")
    clean, bad, obs = observed_quarantine(
        df, {"has_text": F.col("text").isNotNull()}
    )
    assert clean.count() == 0 and bad.count() == 0
    got = obs.get
    assert got["_rows"] == 0 and got["has_text"] == 0


def test_attach_contract(spark):
    obs = SafeObservation()
    with pytest.raises(RuntimeError, match="never attached"):
        obs.get
    df = obs.on(spark.range(1), F.count(F.lit(1)).alias("n"))
    with pytest.raises(RuntimeError, match="only be attached once"):
        obs.on(spark.range(1), F.count(F.lit(1)).alias("n"))
    with pytest.raises(ValueError):
        SafeObservation().on(df)
