from __future__ import annotations

from rental_data_pipeline_spark.jobs.pipeline import (
    SearchConfig,
    compile_search_urls,
    construct_search_url,
)
from rental_data_pipeline_spark.operators.sampling import (
    deterministic_sample,
    stratified_deterministic_sample,
)


def test_deterministic_sample_stable_across_partitionings(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    a = {r.k for r in deterministic_sample(df.repartition(1), "k", 0.3).collect()}
    b = {r.k for r in deterministic_sample(df.repartition(13), "k", 0.3).collect()}
    assert a == b
    assert 0.2 < len(a) / 1000 < 0.4


def test_deterministic_sample_salt_draws_independent_set(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    a = {r.k for r in deterministic_sample(df, "k", 0.3, salt="train").collect()}
    b = {r.k for r in deterministic_sample(df, "k", 0.3, salt="eval").collect()}
    assert a != b


def test_stratified_sample_respects_fractions(spark):
    rows = [(i, "en" if i % 2 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, lang string")
    out = stratified_deterministic_sample(
        df, "k", "lang", {"en": 0.1, "fr": 1.0}
    ).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    assert counts["fr"] == 1000  # keep-all stratum intact
    assert 50 < counts["en"] < 200  # ~10% of 1000
    # absent stratum dropped entirely
    df2 = df.withColumn("lang", df.lang)
    out2 = stratified_deterministic_sample(df2, "k", "lang", {"en": 0.1}).collect()
    assert all(r.lang == "en" for r in out2)


def test_compile_search_urls_matches_driver_compiler(spark):
    cfgs = [
        SearchConfig(maxprice=150000, districts=[12, 13], metros=[1, 2, 3], rooms=[1, 2]),
        SearchConfig(),
        SearchConfig(maxprice=90000, districts=[5]),
    ]
    rows = [
        (i, c.maxprice, c.districts, c.metros, c.rooms, page)
        for i, (c, page) in enumerate([(cfgs[0], 2), (cfgs[1], None), (cfgs[2], 1)])
    ]
    df = spark.createDataFrame(
        rows,
        "id int, maxprice int, districts array<int>, metros array<int>, "
        "rooms array<int>, page int",
    )
    got = {r.id: r.url for r in compile_search_urls(df).collect()}
    assert got[0] == construct_search_url(cfgs[0], page=2)
    assert got[1] == construct_search_url(cfgs[1])
    assert got[2] == construct_search_url(cfgs[2], page=1)
