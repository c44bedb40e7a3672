"""P1/P2: rename projection + temp-column drop (SURVEY §2.3).

The reference renames ~55 RU/alias keys to EN and passes unknown keys
through (``data_process/flatten.py:57-71``); temp columns are dropped
post-normalize (``data_process/normalize.py:148-159``). Both are pure
projections — Catalyst collapses them into the scan (column pruning),
so they cost nothing at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rental_data_pipeline_spark.schema import FIELD_MAPPINGS, TEMP_COLUMNS


def flatten_listings(df: DataFrame, mappings: dict[str, str] | None = None) -> DataFrame:
    """P1: rename known RU/alias columns to EN; unknown columns pass
    through unchanged (ref flatten.py:63 ``get(key, key)``).

    When several source columns map to the same EN name (Комиссии and
    Комиссия → commission), they coalesce in source-column order —
    the dict-comprehension in the reference keeps the *last* present
    value per record, which for column data is ``coalesce`` reversed;
    we coalesce in reverse declaration order to match last-wins.
    """
    # `is not None`, not truthiness: an explicit empty dict means
    # "no renames", not "use the default map"
    mapping = dict(mappings if mappings is not None else FIELD_MAPPINGS)
    present = [c for c in df.columns]
    # group source columns by target name, preserving declaration order
    grouped: dict[str, list[str]] = {}
    out_cols = []
    for c in present:
        tgt = mapping.get(c, c)
        grouped.setdefault(tgt, []).append(c)
    for tgt, srcs in grouped.items():
        if len(srcs) == 1:
            out_cols.append(F.col(f"`{srcs[0]}`").alias(tgt))
        else:
            # last-wins per record → coalesce in reverse order
            out_cols.append(F.coalesce(*[F.col(f"`{s}`") for s in reversed(srcs)]).alias(tgt))
    return df.select(*out_cols)


def flatten_map_column(df: DataFrame, map_col: str, keys: list[str],
                       mappings: dict[str, str] | None = None) -> DataFrame:
    """P1 for open-ended label bags (SURVEY §1.3): pull known keys out
    of a ``MapType(string,string)`` column into top-level columns.

    ``keys`` are the RU labels to extract; each lands under its mapped
    EN name. Native ``element_at`` — no explode/pivot shuffle.
    """
    mapping = dict(mappings if mappings is not None else FIELD_MAPPINGS)
    # group by TARGET name: both RU variants of a label map to one EN
    # column (Комиссии and Комиссия -> commission), and a plain
    # withColumn-per-key would let the LAST key's (possibly absent ->
    # null) value overwrite a present one. Coalesce in reverse
    # declaration order — last-present-wins, flatten_listings'
    # documented rule for the identical collision.
    grouped: dict[str, list[str]] = {}
    for k in keys:
        grouped.setdefault(mapping.get(k, k), []).append(k)
    out = df
    for tgt, srcs in grouped.items():
        out = out.withColumn(
            tgt,
            F.coalesce(
                *[F.col(map_col).getItem(k) for k in reversed(srcs)]
            )
            if len(srcs) > 1
            else F.col(map_col).getItem(srcs[0]),
        )
    return out


def drop_temp_columns(df: DataFrame, temp_cols: tuple[str, ...] = TEMP_COLUMNS) -> DataFrame:
    """P2: drop scratch columns (ref normalize.py:148-159)."""
    return df.drop(*[c for c in temp_cols if c in df.columns])
