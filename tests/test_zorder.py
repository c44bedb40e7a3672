"""Z-order clustered writes: multi-column min/max skipping, measured
from the written parquet footers (host-independent structural proof).
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.zorder import (
    rowgroups_surviving,
    write_zordered,
    zorder_key,
)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="zorder_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _grid(spark, n=64):
    # n x n uniform grid: the adversarial case for single-column sorts
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_beats_single_column_sort_on_2d_box(spark, outdir):
    df = _grid(spark)
    n_files = 16
    # baseline: sorted by x only — y ranges span the whole domain
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(f"{outdir}/by_x")
    )
    write_zordered(df, f"{outdir}/zorder", ["x", "y"], n_files=n_files)

    # a 2-D box touching ~1/16 of the domain
    box = {"x": (0, 15), "y": (0, 15)}
    zx, ztot = rowgroups_surviving(f"{outdir}/zorder", box)
    bx, btot = rowgroups_surviving(f"{outdir}/by_x", box)
    assert ztot == btot > 0
    # x-sort prunes on x but every surviving file spans all of y;
    # z-order prunes on BOTH axes
    assert zx < bx, (zx, ztot, bx, btot)
    assert zx <= ztot // 4, "z-order should skip the large majority"

    # single-axis predicates still prune on the z-ordered layout
    zy, _ = rowgroups_surviving(f"{outdir}/zorder", {"y": (0, 15)})
    assert zy < ztot

    # clustering never changes the DATA
    back = spark.read.parquet(f"{outdir}/zorder")
    assert back.count() == df.count()
    assert back.agg(F.sum("payload")).collect()[0][0] == df.agg(
        F.sum("payload")
    ).collect()[0][0]


def test_zorder_key_is_deterministic_and_interleaves(spark):
    # 2-bit toy: key(x=1,y=0) = 0b01, key(x=0,y=1) = 0b10,
    # key(x=1,y=1) = 0b11 at bits=1 with domains {0,1}
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.k
        for r in df.withColumn("k", zorder_key(df, ["x", "y"], bits=1)).collect()
    }
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_degenerate_constant_column_collapses_to_zero(spark, outdir):
    df = spark.range(100).select(
        F.col("id").alias("x"), F.lit(7).alias("y")
    )
    write_zordered(df, f"{outdir}/z", ["x", "y"], n_files=4)
    assert spark.read.parquet(f"{outdir}/z").count() == 100
