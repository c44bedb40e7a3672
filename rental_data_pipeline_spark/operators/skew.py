"""Skew mitigation utilities (scale path; no reference analog — the
reference's dict-indexed merge never sees partition skew, but a 100 TB
shuffle does).

Two tools:

- **AQE first**: the session enables
  ``spark.sql.adaptive.skewJoin.enabled`` — sort-merge joins get
  runtime-split automatically. Use explicit salting only where AQE
  can't help: broadcast-ineligible joins against a *hot-key* build
  side, or aggregations materializing large per-key state
  (collect_list / exact distinct).
- **``salted_join``**: replicate the small side ``salt_n`` ways and
  scatter the big side's hot keys uniformly across the replicas, so
  one hot key occupies ``salt_n`` tasks instead of one straggler.
- **``two_phase_agg``**: pre-aggregate on (key, salt) then finish on
  key — bounds per-task state for high-cardinality-value aggs where
  map-side partial aggregation alone is not enough.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _stable_salt(
    df: DataFrame, salt_n: int, salt_cols: list[str] | None = None
) -> Column:
    """Uniform salt derived from ROW CONTENT, not partition layout:
    ``pmod(hash(salt_cols or all hashable columns), salt_n)``. The
    assignment is identical across runs, retries, and repartitionings —
    a partial recompute under a task retry lands every row on the same
    salt, so no partial aggregate can double-count. (The earlier
    ``hash(monotonically_increasing_id())`` variant was uniform but
    layout-dependent, which silently voided that guarantee.)

    Rows with identical content share a salt by construction — a hot
    key whose rows are FULL duplicates would collapse onto one salt and
    silently void the mitigation. When the frame carries a unique or
    high-cardinality column (event id, offset, timestamp), name it in
    ``salt_cols`` to guarantee the spread."""
    cols = salt_cols or [
        f.name for f in df.schema.fields
        if "map<" not in f.dataType.simpleString()
    ]
    src = F.hash(*[F.col(n) for n in cols]) if cols else F.lit(0)
    return F.pmod(src, F.lit(salt_n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: ``small`` is replicated
    ``salt_n``× (explode over the salt range) and each big-side row
    picks a uniform content-derived salt (:func:`_stable_salt`;
    ``salt_cols`` names the distinguishing columns when hot-key rows
    may be full duplicates), splitting every hot key across ``salt_n``
    tasks. Correct for any ``how`` where the replicated side is the
    non-preserved side of the join."""
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    salted_big = big.withColumn(_SALT, _stable_salt(big, salt_n, salt_cols))
    out = salted_big.join(salted_small, [key, _SALT], how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: Callable[[DataFrame], list[Column]],
    finish: Callable[[DataFrame], list[Column]],
    salt_n: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregation with bounded per-task state: phase 1 groups by
    (key, salt) — each task sees ≤ 1/salt_n of a hot key's rows —
    phase 2 merges the partials per key.

    ``aggs(df)`` returns the phase-1 aggregate columns; ``finish(df)``
    merges them per key (e.g. sum of partial counts). The salt is
    content-derived (:func:`_stable_salt`; pass ``salt_cols`` when
    hot-key rows may be full duplicates), so a task retry recomputes
    the same (key, salt) partials — layout-dependent salting here could
    double-count under retry with a non-deterministic upstream."""
    salted = df.withColumn(_SALT, _stable_salt(df, salt_n, salt_cols))
    partial = salted.groupBy(key, _SALT).agg(*aggs(salted))
    return partial.groupBy(key).agg(*finish(partial))
