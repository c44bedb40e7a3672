"""Bucketed co-located join: the Exchange must disappear."""

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.bucketing import bucketed, write_bucketed
from rental_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    yield "bktest"
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_bucketed_join_is_exchange_free(spark, sf_dir, bucket_db):
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    write_bucketed(orders, f"{bucket_db}.orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{bucket_db}.lineitem_b", ["o_orderkey"], n_buckets=8,
    )
    # bucketing targets the BIG x BIG case; at test SF the small side
    # would broadcast (the right call when one side fits) — disable
    # auto-broadcast to exercise the 100 TB plan shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, f"{bucket_db}.orders_b").join(
            bucketed(spark, f"{bucket_db}.lineitem_b"), "o_orderkey"
        ).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: the join AND the aggregation reuse the
        # written bucketing — zero shuffles end-to-end, and sortBy
        # metadata elides the merge-join's Sort on both sides
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        n_joined = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # correctness: equals the plain (shuffling) join
    want = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).groupBy("o_orderkey").count().count()
    assert n_joined == want
