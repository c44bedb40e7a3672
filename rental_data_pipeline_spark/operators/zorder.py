"""Z-order (Morton) clustered writes — multi-column file skipping.

A 100 TB table is pruned at scan time by parquet min/max statistics:
a file whose [min, max] range excludes the predicate is never read.
Sorting the write by ONE column makes that column's ranges selective
but leaves every other column's ranges spanning the whole domain; a
Z-order sort interleaves the bits of several columns' rank buckets so
file ranges stay NARROW on every participating column at once —
range predicates on any subset of them skip most files.

All expression-level (no UDF): one agg for per-column domains, a
map-side Morton key, one range repartition + in-partition sort (the
same shuffle a plain sorted write costs). The skipping claim is
pinned by a pytest that reads the written parquet footers and counts
row groups whose statistics survive a 2-D predicate box — Z-order
must beat a single-column sort on the combined filter.

Beyond-reference capability (the reference has no columnar layout
control); standard technique from the database literature (Morton
1966; used by most lakehouse table formats).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 10


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear rank bucket in [0, 2^bits): map-side, driver-free.
    Degenerate domains (hi == lo) and un-rankable values (NULL after
    the caller's finite-guard) collapse to bucket 0 — least() would
    otherwise SKIP the null and return the top bucket."""
    span = hi - lo
    frac = F.when(span == 0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo) / span
    )
    top = F.lit((1 << bits) - 1)
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(
        F.least(F.floor(frac * (1 << bits)).cast("long"), top)
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """The Morton key column: per-column linear buckets (domains from
    ONE tiny agg, attached as a broadcast literal-free single row so
    the key stays a pure projection), bits interleaved round-robin.

    Bit interleaving is unrolled driver-side into a fixed O(bits·k)
    expression — static per (cols, bits), so whole-stage codegen
    compiles it once.
    """
    if bits * len(cols) > 63:
        # the interleave packs bits*k bit positions into one signed
        # long; beyond 63 Spark's shiftleft wraps the distance mod 64
        # and the additive interleave carries into real positions —
        # silently garbage keys. Cap bits so the key always fits.
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError(
                f"zorder_key: {len(cols)} columns cannot share a "
                "63-bit key"
            )
    # NaN/Infinity-proof domains: F.min/F.max PROPAGATE NaN, and a
    # single NaN row would make span=NaN -> every row's bucket 0,
    # silently degenerating the whole clustering; bound the domain
    # over finite values only and clamp non-finite rows to bucket 0
    def _finite(c):
        col = F.col(c).cast("double")
        return F.when(
            col.isNotNull() & ~F.isnan(col) & (col != F.lit(float("inf")))
            & (col != F.lit(float("-inf"))),
            col,
        )

    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(_finite(c)).alias(f"__lo_{c}"),
                F.max(_finite(c)).alias(f"__hi_{c}"),
            )
        ]
    ).collect()[0]

    def _b(v):
        v = float(v) if v is not None else 0.0
        return v if math.isfinite(v) else 0.0

    buckets = [
        # non-finite rows (NULL bucket via _finite) clamp to bucket 0:
        # they can't be ranked, and a NULL would otherwise null the
        # whole interleaved key
        F.coalesce(
            _bucket(
                _finite(c),
                F.lit(_b(bounds[f"__lo_{c}"])),
                F.lit(_b(bounds[f"__hi_{c}"])),
                bits,
            ),
            F.lit(0).cast("long"),
        )
        for c in cols
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            out_pos = i * len(buckets) + j
            key = key + (
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), out_pos
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: range
    repartition on the Morton key (contiguous key spans per file) +
    in-partition sort (tight row-group statistics within each file).
    Same I/O as any sorted write — the clustering is free at write
    time and pays on every future scan."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_surviving(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """(surviving, total) parquet row groups whose min/max statistics
    intersect the predicate ``box`` (col -> (lo, hi)) — the exact
    skipping arithmetic a scan performs, read from the footers with
    pyarrow. Test/diagnostic helper (driver-side, metadata only)."""
    import glob

    import pyarrow.parquet as pq

    total = survive = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                stats = md.row_group(rg).column(schema_names.index(col)).statistics
                if stats is None:
                    continue  # no stats -> cannot skip
                if stats.max < lo or stats.min > hi:
                    ok = False
                    break
            survive += ok
    return survive, total
