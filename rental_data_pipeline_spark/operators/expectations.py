"""Data-quality expectations — declarative row gates for ingest.

A training-data pipeline fronts every merge with row-level contracts
("price is positive", "key is present", "status is a known value").
The scale-correct shape is the same one the extraction path uses for
error pages: evaluate ALL rules in one map-side projection, tag each
row with the names of the rules it fails, and split clean/quarantined
from that single column — never a pass per rule, never a driver loop.

Rules are plain ``name -> Column`` boolean expressions, so Catalyst
folds them into the scan and pushdown-eligible rules prune at the
source. A NULL rule result counts as a violation (unknown is not
valid) — the strict reading a quality gate wants; wrap a rule in
``coalesce(rule, lit(True))`` to opt a column out of null-strictness.

Beyond-reference capability (the reference validates imperatively
per record in the scraper); pytest-proven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Tag every row with the (sorted) names of the rules it fails —
    one map-side projection, zero shuffles, all rules in one pass."""
    checks = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in sorted(rules.items())
    ]
    tags = F.array_compact(F.array(*checks)) if checks else F.array().cast(
        "array<string>"
    )
    return df.withColumn(VIOLATIONS_COL, tags)


def quarantine_invalid(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows pass every rule and drop the
    tag column; quarantined rows keep ``_violations`` for triage —
    the same split contract as ``extract.quarantine_split`` and
    ``tables.read_json_state_quarantined``."""
    tagged = validate(df, rules)
    clean = tagged.where(F.size(F.col(VIOLATIONS_COL)) == 0).drop(VIOLATIONS_COL)
    bad = tagged.where(F.size(F.col(VIOLATIONS_COL)) > 0)
    return clean, bad


def observed_quarantine(
    df: DataFrame, rules: dict[str, Column], name: str = "expectations"
):
    """(clean, quarantined, observation): ONE tagging pass whose
    per-rule violation counts ride a ``CollectMetrics`` node on the
    same computation the caller consumes — zero extra scans (filters
    are not pushed through the metrics node, so the counts cover every
    raw row). ``observation.get`` yields ``_rows`` plus one count per
    rule after the first action over either split — the gate shape
    ``jobs/pipeline.py`` pioneered, shared here so every ingest
    surface pays one scan, not two. The observation is a
    ``SafeObservation``: a zero-row ingest collapses the tagged plan
    and would otherwise crash ``.get`` instead of reporting zeros."""
    from rental_data_pipeline_spark.observe import SafeObservation

    obs = SafeObservation(name)
    tagged = obs.on(
        validate(df, rules),
        F.count(F.lit(1)).alias("_rows"),
        *[
            F.coalesce(
                F.sum(F.array_contains(F.col(VIOLATIONS_COL), n).cast("long")),
                F.lit(0),
            ).alias(n)
            for n in sorted(rules)
        ],
    )
    clean = tagged.where(F.size(F.col(VIOLATIONS_COL)) == 0).drop(VIOLATIONS_COL)
    bad = tagged.where(F.size(F.col(VIOLATIONS_COL)) > 0)
    return clean, bad, obs


def expectation_metrics(df: DataFrame, rules: dict[str, Column]) -> dict[str, int]:
    """Violation count per rule plus ``_rows`` total — ONE aggregation
    pass over the tagged frame (map-side partials, single-row result),
    the report you attach to an ingest run. Driver-side result is
    |rules|+1 scalars."""
    tagged = validate(df, rules)
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        # coalesce: sum over ZERO rows is NULL, and an empty ingest is
        # exactly when the report must say 0, not crash
        F.coalesce(
            F.sum(F.array_contains(F.col(VIOLATIONS_COL), name).cast("long")),
            F.lit(0),
        ).alias(name)
        for name in sorted(rules)
    ]
    row = tagged.agg(*aggs).collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}
