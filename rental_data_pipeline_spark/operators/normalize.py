"""X3/X4/X5 batch normalization (SURVEY §2.7, ref normalize.py:94-163).

Applies the numeric parse to the 21 numeric fields, the Russian-date
parse to the 6 date fields, derives ``status``, and drops temp
columns — all as one ``select`` so Catalyst fuses everything into a
single projection over the scan.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rental_data_pipeline_spark.functions.dates import parse_russian_date
from rental_data_pipeline_spark.functions.numeric import parse_numeric_value
from rental_data_pipeline_spark.functions.text import derive_status
from rental_data_pipeline_spark.operators.flatten import drop_temp_columns
from rental_data_pipeline_spark.schema import DATE_FIELDS, NUMERIC_FIELDS

# Fields whose reference values are integral counts — kept LongType in
# the typed schema (SURVEY §7.4#3: int-if-integral handled by types).
_INT_FIELDS = frozenset(
    {
        "total_floors",
        "floor",
        "room_count",
        "total_views",
        "today_views",
        "unique_views",
        "sleeping_places",
        "rooms_for_rent",
        "rooms_in_apartment",
        "price_change_value",
    }
)


def normalize_listings(
    df: DataFrame,
    now: _dt.datetime | str | None = None,
    drop_temps: bool = True,
) -> DataFrame:
    """Ref ``normalize_listings`` re-expressed as column expressions.

    ``now`` is injected (replaces the reference's per-record
    ``datetime.now()`` — SURVEY §7.4#2).
    """
    exprs: dict[str, F.Column] = {}
    for f in NUMERIC_FIELDS:
        if f in df.columns:
            parsed = parse_numeric_value(F.col(f))
            # try_cast: an overflow-scale double from a dirty digit run
            # nulls the field per-row instead of crashing the whole
            # batch under ANSI (CAST_OVERFLOW)
            exprs[f] = parsed.try_cast("long") if f in _INT_FIELDS else parsed
    for f in DATE_FIELDS:
        if f in df.columns:
            exprs[f] = parse_russian_date(F.col(f), now)
    exprs["status"] = derive_status(
        F.col("is_unpublished") if "is_unpublished" in df.columns else F.lit(False)
    )
    out = df.withColumns(exprs)
    if drop_temps:
        out = drop_temp_columns(out)
    return out
