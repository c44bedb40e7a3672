"""Table sources: parquet-backed testdata + persistent state tables.

The reference keeps its state as one JSON array file reloaded and
rewritten each run (``parse_data.py:131-132,217-223``); here state is a
partitioned parquet table (columnar, splittable, predicate-pushdown).
The JSON source/sink survive as tolerant readers/writers (SURVEY §2.1
S1/K1) for compatibility.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table. Parquet scan → full pushdown/pruning.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a long and
    is converted here to a micros timestamp via integer division
    (``div`` — float division would lose precision past 2^53 ns).
    """
    # Runtime-settable: a caller-supplied vanilla session must be able to
    # read TIMESTAMP(NANOS) parquet without builder-time config.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_json_state(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1: tolerant JSON state source (ref ``parse_data.py:206-211``).

    Missing/corrupt file → empty DataFrame with the given schema, the
    Spark analog of the reference's ``None`` → ``[]`` fallback.
    """
    try:
        df = spark.read.schema(schema).json(path)
        df.head(1)
        return df
    except Exception:
        return spark.createDataFrame([], schema)


def read_json_state_quarantined(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """S1 with corrupt-record quarantine: ``(clean, quarantined)``.

    :func:`read_json_state` silently turns a damaged LINE (truncated
    write, encoding damage, log interleaving) into an all-null row —
    at crawl scale that is data loss you never see. PERMISSIVE mode
    with ``columnNameOfCorruptRecord`` keeps the raw unparseable line;
    clean rows drop the marker column, quarantined rows carry it as
    ``raw`` for replay/debugging. Missing path → both frames empty
    (the reference's ``None`` → ``[]`` fallback, ref
    ``parse_data.py:206-211``)."""
    corrupt = "_corrupt_record"
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt, T.StringType())])
    try:
        # one eager materialization of the full-row scan: Spark forbids
        # a scan whose referenced columns are ONLY the corrupt-record
        # marker (the quarantine side would be exactly that after column
        # pruning), and state files are modest — both splits then read
        # executor-resident blocks instead of re-parsing
        df = spark.read.schema(full).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt
        ).json(path).localCheckpoint(eager=True)
    except Exception:
        empty = spark.createDataFrame([], schema)
        return empty, empty.select(F.lit(None).cast("string").alias("raw"))
    clean = df.where(F.col(corrupt).isNull()).drop(corrupt)
    bad = df.where(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw")
    )
    return clean, bad


def write_json_state(df: DataFrame, path: str) -> None:
    """K1: JSON sink with NaN scrub (ref ``parse_data.py:187-204``).

    The reference recursively converts NaN → null before writing;
    delegates to the ONE scrub-and-write implementation
    (``operators.sinks.write_state_json``) so the two JSON writers
    cannot drift.
    """
    from rental_data_pipeline_spark.operators.sinks import (
        write_state_json,
    )

    write_state_json(df, path)


def read_state(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Persistent merged-state table (parquet). Empty-DF fallback on first run."""
    try:
        df = spark.read.parquet(path)
        df.head(1)
        return df
    except Exception:
        return spark.createDataFrame([], schema)


def write_state(df: DataFrame, path: str) -> None:
    """Overwrite the state table — same load-all/rewrite-all semantics as
    the reference, but columnar. At 100 TB this would be a Delta/Iceberg
    MERGE; with plain parquet we rewrite (the state table is small
    relative to the scan volume, and the rewrite is partition-parallel).
    """
    df.write.mode("overwrite").parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """K2/K3: CSV snapshot sink (ref ``parse_data.py:470-471,476-492``)."""
    df.write.mode("overwrite").option("header", True).csv(path)
