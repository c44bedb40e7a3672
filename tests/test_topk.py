"""Sharded two-level top-k == the single-window form, for any shard
count and any partitioning (operators/topk.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.topk import topk_per_group


def _naive(df, group_cols, order_cols, k, rank_name=None):
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    rk = rank_name or "__rk"
    out = df.withColumn(rk, F.row_number().over(w)).where(F.col(rk) <= k)
    return out if rank_name else out.drop(rk)


def test_topk_matches_single_window_any_shards(spark):
    # skewed: group g0 holds ~80% of the rows; distinct (g, v) pairs
    # with a deterministic total order (cnt desc, v asc)
    df = (
        spark.range(4000)
        .select(
            F.when(F.col("id") % 5 < 4, F.lit("g0"))
            .otherwise(F.concat(F.lit("g"), (F.col("id") % 5).cast("string")))
            .alias("g"),
            (F.col("id") % 131).alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = [F.col("cnt").desc(), F.col("v")]
    want = sorted(
        map(tuple, _naive(df, ["g"], order, 7, rank_name="rank").collect())
    )
    for variant in (
        topk_per_group(df, ["g"], order, 7, F.xxhash64("v"), rank_name="rank"),
        topk_per_group(
            df, ["g"], order, 7, F.xxhash64("v"), n_shards=3, rank_name="rank"
        ),
        topk_per_group(
            df.repartition(11), ["g"], order, 7, F.xxhash64("v"),
            n_shards=64, rank_name="rank",
        ),
    ):
        assert sorted(map(tuple, variant.collect())) == want
    # k larger than every group: everything survives, ranks intact
    all_rows = topk_per_group(
        df, ["g"], order, 10_000, F.xxhash64("v"), rank_name="rank"
    )
    assert all_rows.count() == df.count()
    # without rank_name the bookkeeping columns are gone
    bare = topk_per_group(df, ["g"], order, 7, F.xxhash64("v"))
    assert bare.columns == df.columns


def test_topk_plan_is_sharded(spark):
    """No task sorts a whole group: the first rank exchange must
    partition on the shard column."""
    import re

    df = spark.range(500).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    out = topk_per_group(df, ["g"], [F.col("v")], 5, F.xxhash64("v"))
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)", plan)
    assert any("__tk_shard" in p for p in parts)
    assert len(re.findall(r"\bExchange\b", plan)) == 2


def test_topk_auto_shards_collapse_and_match(spark):
    """n_shards='auto' collapses to the single-window rank on few
    upstream partitions (no __tk_shard exchange) and returns exactly
    the sharded plan's rows (the result is n_shards-invariant)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 5000, 1, 4).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v")
    )
    order = [F.col("v").desc()]
    auto = topk_per_group(df, ["g"], order, 5, F.xxhash64("v"), n_shards="auto")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "__tk_shard" not in plan
    sharded = topk_per_group(df, ["g"], order, 5, F.xxhash64("v"), n_shards=8)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, sharded.collect())
    )
