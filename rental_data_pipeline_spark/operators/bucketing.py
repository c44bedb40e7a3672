"""Bucketed tables — co-located big×big joins without a shuffle.

Broadcast handles small×big; SALTING handles skew; but a recurring
big×big equi-join (fact×fact, state×changelog) at 100 TB wants BOTH
sides pre-hashed into the same bucket layout so the join reads
co-located buckets and skips the exchange entirely. Spark implements
this through ``bucketBy`` metastore tables: the writer hash-partitions
rows into a fixed bucket count per file, the reader reports the
bucketing as its output partitioning, and Catalyst elides the
Exchange under a sort-merge join (and the Sort too, with
``sortBy``).

This is write-time cost traded for every-read savings — the right
call for tables joined repeatedly on the same key (the CDC state
table's hash-bucket directory layout in ``streaming/incremental.py``
is the same idea expressed for file-level pruning; bucketBy is the
metastore-native variant the optimizer can SEE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) metastore
    table: subsequent equi-joins or aggregations on ``keys`` between
    tables sharing this layout run exchange-free (sort-free too when
    sorted). Bucket count must match on both sides of a co-located
    join — fix it once per subject area, like a schema decision.

    Repartitions on the bucket keys first: bucketBy splits each TASK's
    rows into n_buckets files, so an unrepartitioned corpus-scale
    frame (thousands of upstream tasks) would write tasks x n_buckets
    small files — and Spark only elides the reader-side sort when a
    bucket is a single file."""
    writer = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.mode(mode)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata live (a
    plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)
