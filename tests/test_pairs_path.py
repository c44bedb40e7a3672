"""Cluster-safe pair materialization: ``pairs_path=`` writes the pair
set as a parquet table (recoverable on executor loss — a parquet read
has a recompute path, a localCheckpoint block does not) and must be
byte-identical to the default in-memory path, leaving zero net cache
entries either way."""

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from rental_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def pairs_dir():
    d = tempfile.mkdtemp(prefix="pairs_path_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    twins = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return docs.unionByName(twins)


def test_pairs_path_equals_default_and_leaves_no_cache(
    spark, sf_dir, pairs_dir
):
    corpus = _corpus(spark, sf_dir)
    spark.catalog.clearCache()

    for name, fn in (
        ("jaccard", lambda **kw: jaccard_pairs(corpus, threshold=0.8, **kw)),
        ("minhash", lambda **kw: minhash_lsh_pairs(corpus, threshold=0.8, **kw)),
        ("simhash", lambda **kw: simhash_near_pairs(corpus, **kw)),
    ):
        path = f"{pairs_dir}/{name}"
        want = sorted(map(tuple, fn().collect()))
        got_df = fn(pairs_path=path)
        assert sorted(map(tuple, got_df.collect())) == want
        assert want, name  # twins guarantee non-trivial pair sets
        # the written table is a real committed parquet dataset …
        assert glob.glob(f"{path}/_SUCCESS") and glob.glob(f"{path}/part-*")
        # … and the returned frame answers FROM it (survives sessions/
        # executors, unlike checkpoint blocks)
        reread = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert reread == want
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
            f"{name} left persisted frames in the CacheManager"
        )
