"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC-merge query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (registry in ``rental_data_pipeline_spark.queries``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rental_data_pipeline_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the full five-step pipeline
    job (SURVEY §3.1) — extraction, tombstoning, CDC merges, geo
    enrichment — over rendered fixtures; driver checks rows>0."""
    return _registry.QUERIES["pipeline_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check)."""
    return _registry.oracles()
