"""Distinct-count sketches and deterministic sampling invariants.

The oracle gate proves cross-engine value equality; these tests prove
the *semantic* properties a user relies on: sketch accuracy bounds,
partition-invariance (the determinism claim), stratified fraction
behavior, and split stability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.sampling import (
    deterministic_sample,
    sample_bucket,
    stratified_deterministic_sample,
)
from rental_data_pipeline_spark.operators.sketch import (
    hll_distinct,
    theta_distinct,
)
from rental_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, "events", sf_dir).cache()


def test_hll_estimate_within_error_bound(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in hll_distinct(events, ["event_type"], "user_id").collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # p=8 → 256 registers → theoretical RSE ≈ 1.04/sqrt(256) ≈ 6.5%;
        # allow 3 sigma.
        assert abs(est[k] - n) <= max(3 * 0.065 * n, 3), (k, est[k], n)


def test_hll_is_partition_invariant(events):
    a = hll_distinct(events, ["event_type"], "user_id").collect()
    b = hll_distinct(events.repartition(7), ["event_type"], "user_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_theta_scales_survivor_count(events):
    rate = 16
    est = {
        r["event_type"]: r["theta_estimate"]
        for r in theta_distinct(events, ["event_type"], "user_id", rate=rate).collect()
    }
    for v in est.values():
        assert v % rate == 0  # survivors × rate by construction
    # union-mergeability: the estimate over a union of disjoint halves
    # equals the estimate over the whole (survivor sets just union)
    h1 = events.where(F.col("event_id") % 2 == 0)
    h2 = events.where(F.col("event_id") % 2 == 1)
    whole = theta_distinct(events, [], "user_id", rate=rate).collect()[0][0]
    combined = theta_distinct(h1.union(h2), [], "user_id", rate=rate).collect()[0][0]
    assert whole == combined


def test_deterministic_sample_is_stable_and_sized(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    s1 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(9), "doc_id", 0.2).collect()
    }
    assert s1 == s2, "sample membership must not depend on partitioning"
    n = docs.count()
    assert 0.1 * n <= len(s1) <= 0.3 * n  # ~20% with small-sample slack


def test_stratified_fractions_and_drop(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    fractions = {"en": 0.5, "de": 1.0}
    kept = stratified_deterministic_sample(docs, "doc_id", "lang", fractions)
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) <= {"en", "de"}, "strata without a fraction must drop"
    assert counts["de"] == totals["de"], "fraction 1.0 keeps the whole stratum"
    assert 0.25 * totals["en"] <= counts.get("en", 0) <= 0.75 * totals["en"]


def test_salted_buckets_are_independent(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    b = docs.select(
        sample_bucket("doc_id").alias("b0"),
        sample_bucket("doc_id", "split").alias("b1"),
    )
    same = b.where(F.col("b0") == F.col("b1")).count()
    # 10000 buckets → expected collision fraction 1e-4; anything near
    # full correlation means the salt is ignored.
    assert same < 0.05 * docs.count()


def test_countmin_never_undercounts_and_merges(spark):
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.sketch import (
        countmin_lookup,
        countmin_sketch,
    )

    df = spark.createDataFrame(
        [("a", f"u{i % 7}") for i in range(700)] + [("a", "hot")] * 300,
        "g string, u string",
    )
    items = df.select("g", "u").distinct().unionByName(
        spark.createDataFrame([("a", "never-inserted")], "g string, u string")
    )
    est = {
        r.u: r.cm_estimate
        for r in countmin_lookup(
            countmin_sketch(df, ["g"], "u"), items, ["g"], "u"
        ).collect()
    }
    exact = {r.u: r["count"] for r in df.groupBy("u").count().collect()}
    assert all(est[k] >= exact[k] for k in exact)  # one-sided error
    # an item whose d counters were never all incremented reads 0 (a
    # zero counter proves count 0) instead of vanishing or inflating
    assert est["never-inserted"] == 0
    # mergeable: sketch(half1) + sketch(half2) summed bucket-wise equals
    # sketch(whole) — counter addition is the union
    ids = df.withColumn("i", F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    h1 = ids.where(F.col("i") % 2 == 0).drop("i")
    h2 = ids.where(F.col("i") % 2 == 1).drop("i")
    merged = (
        countmin_sketch(h1, ["g"], "u")
        .unionByName(countmin_sketch(h2, ["g"], "u"))
        .groupBy("g", "__d", "__bucket")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    whole = countmin_sketch(df, ["g"], "u")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_leakage_safe_split_keeps_near_dups_together(spark, sf_dir):
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from rental_data_pipeline_spark.operators.sampling import leakage_safe_split
    from rental_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # plant twins so the corpus has guaranteed cross-doc near-dups
    twins = docs.where(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(twins)
    pairs = minhash_lsh_pairs(corpus, threshold=0.8)
    assert pairs.count() > 0

    out = leakage_safe_split(
        corpus, pairs, {"train": 0.7, "val": 0.2, "test": 0.1}
    )
    split_of = {r.doc_id: r.split for r in out.collect()}
    # no near-dup pair straddles two splits — the leakage property
    for r in pairs.collect():
        assert split_of[r.doc_a] == split_of[r.doc_b], (r.doc_a, r.doc_b)
    # every split is populated and fractions are roughly honored
    from collections import Counter

    c = Counter(split_of.values())
    n = sum(c.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.55 < c["train"] / n < 0.85
    # deterministic: a second run assigns identically
    again = {
        r.doc_id: r.split
        for r in leakage_safe_split(
            corpus, pairs, {"train": 0.7, "val": 0.2, "test": 0.1}
        ).collect()
    }
    assert again == split_of


def test_exact_k_sample_properties(spark, sf_dir):
    from rental_data_pipeline_spark.operators.sampling import exact_k_sample

    docs = load_table(spark, "documents", sf_dir)
    s = exact_k_sample(docs, "doc_id", 25)
    assert s.count() == 25
    # deterministic + partition-invariant
    a = {r.doc_id for r in s.collect()}
    b = {r.doc_id for r in exact_k_sample(docs.repartition(9), "doc_id", 25).collect()}
    assert a == b
    # per-group: exactly k per language (or the whole group if smaller)
    per = exact_k_sample(docs, "doc_id", 10, group_cols=["lang"])
    counts = {r.lang: r.n for r in per.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(10, totals[lang])
    # a different salt draws a different sample
    c = {r.doc_id for r in exact_k_sample(docs, "doc_id", 25, salt="other").collect()}
    assert a != c


def test_mix_corpora_quotas_and_determinism(spark, sf_dir):
    from rental_data_pipeline_spark.operators.sampling import mix_corpora

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    web = docs.where(F.col("doc_id") % 2 == 0)
    books = docs.where(F.col("doc_id") % 2 == 1)
    tiny = docs.where(F.col("doc_id") < 4)  # smaller than its quota
    mixed = mix_corpora(
        {"web": web, "books": books, "tiny": tiny},
        {"web": 0.6, "books": 0.3, "tiny": 0.1},
        total_rows=100,
    )
    counts = {r.source: r.n for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["web"] == 60 and counts["books"] == 30
    assert counts["tiny"] == tiny.count()  # shortfall visible, not rebalanced
    again = mix_corpora(
        {"web": web, "books": books, "tiny": tiny},
        {"web": 0.6, "books": 0.3, "tiny": 0.1},
        total_rows=100,
    )
    assert sorted((r.source, r.doc_id) for r in mixed.collect()) == sorted(
        (r.source, r.doc_id) for r in again.collect()
    )


def test_heavy_hitters_misra_gries_bounds(spark):
    """MG guarantees, checked against exact counts under two different
    partitionings (the summaries are mergeable, so the bound may not
    depend on the merge tree): est <= true, true - est <= n/(k+1),
    and every item with freq > n/(k+1) is present."""
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.sketch import heavy_hitters

    # skewed: value v = id % 97, plus two planted heavies
    base = spark.range(6000).select((F.col("id") % 97).alias("v"))
    heavy = spark.range(3000).select(
        F.when(F.col("id") % 2 == 0, F.lit(1000)).otherwise(F.lit(2000)).alias("v")
    )
    df = base.unionByName(heavy)
    n = df.count()
    k = 16
    true = {r.v: r.c for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()}
    eps_n = n / (k + 1)

    for parts in (1, 8):
        got = {
            r.v: r.est_count
            for r in heavy_hitters(df.repartition(parts, "v"), "v", k=k).collect()
        }
        assert len(got) <= k
        for v, est in got.items():
            assert est <= true[v], (v, est, true[v])
            assert true[v] - est <= eps_n, (v, est, true[v], eps_n)
        # guaranteed heavy hitters (freq > n/(k+1)) always surface
        for v, c in true.items():
            if c > eps_n:
                assert v in got, (v, c, eps_n)
        assert 1000 in got and 2000 in got


def test_certified_heavy_hitters_deterministic_exact(spark):
    """Two-pass MG→exact-recount: output == GROUP BY HAVING over the
    full data (a pure function of the data, unlike raw MG estimates),
    for any partitioning."""
    import random

    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.sketch import (
        certified_heavy_hitters,
    )

    rng = random.Random(7)
    # zipf-ish: a few hot values + a long tail
    vals = (
        ["hot_a"] * 400 + ["hot_b"] * 250 + ["warm"] * 60
        + [f"tail_{rng.randrange(5000)}" for _ in range(1290)]
    )
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    n, k = len(vals), 15
    want = {
        (r.v, r.freq)
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") > n / (k + 1))
        .collect()
    }
    assert {v for v, _ in want} >= {"hot_a", "hot_b"}
    for parts in (1, 7, 32):
        got = {
            (r.v, r.freq)
            for r in certified_heavy_hitters(
                df.repartition(parts, "v"), "v", k=k
            ).collect()
        }
        assert got == want


def test_bottomk_quantile_sketch_merges_like_a_sketch(spark, sf_dir):
    """The bottom-k quantile state is a real mergeable summary:
    fold(state(A), state(B)) over a disjoint split == state(A ∪ B),
    and the estimates are a pure function of the data (identical
    across partitionings). Sampled estimates land near exact."""
    from rental_data_pipeline_spark.operators.sketch import (
        bottomk_sample_state,
        merge_bottomk_states,
        quantiles_from_bottomk,
        sampled_quantiles,
    )
    from rental_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "n_chars"
    )
    qs = [0.5, 0.9]
    whole = sampled_quantiles(docs, ["lang"], "n_chars", "doc_id", qs, k=64)
    want = {r.lang: (r.n_rows, r.q_0_5, r.q_0_9) for r in whole.collect()}
    assert want

    # disjoint split -> per-part states -> merge == whole
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    sa = bottomk_sample_state(a, ["lang"], "n_chars", "doc_id", k=64)
    sb = bottomk_sample_state(b, ["lang"], "n_chars", "doc_id", k=64)
    merged = merge_bottomk_states(sa, sb, ["lang"], "doc_id", k=64)
    got = {
        r.lang: (r.n_rows, r.q_0_5, r.q_0_9)
        for r in quantiles_from_bottomk(
            merged, ["lang"], "n_chars", qs
        ).collect()
    }
    assert got == want

    # partition-independence of the whole-frame estimate
    re = sampled_quantiles(
        docs.repartition(13), ["lang"], "n_chars", "doc_id", qs, k=64
    )
    assert {r.lang: (r.n_rows, r.q_0_5, r.q_0_9) for r in re.collect()} == want

    # sanity: the k=64 sample's median lands near the exact median
    exact = {
        r.lang: r.m
        for r in docs.groupBy("lang")
        .agg(F.percentile("n_chars", F.lit(0.5)).alias("m"))
        .collect()
    }
    for lang, (_, q50, _) in want.items():
        assert abs(q50 - exact[lang]) / max(exact[lang], 1) < 0.35


def test_bottomk_state_null_groups_nulls_keys_dup_keys(spark):
    """The r12-ADVICE edge set, all on one tiny frame:

    - a NULL group value must survive the merge's totals join (a plain
      equi-join on group_cols silently drops it);
    - NULL keys are excluded from the sketch entirely — sample AND
      count (no hash, engine-divergent sort position);
    - duplicate keys are deterministic: the rank order tiebreaks on
      the value column, so the kept rows are a pure function of the
      data for any partitioning and any n_shards.
    """
    from rental_data_pipeline_spark.operators.sketch import (
        bottomk_sample_state,
        merge_bottomk_states,
        quantiles_from_bottomk,
    )

    rows = []
    for i in range(40):
        rows.append(("g1", i * 10, f"k{i}"))
        rows.append((None, i * 10 + 1, f"n{i}"))        # null GROUP
    rows += [("g1", 5, None), (None, 7, None)]           # null KEYS
    rows += [("g1", 100 + j, "dup") for j in range(6)]   # duplicate key
    df = spark.createDataFrame(rows, "lang string, n_chars long, doc_id string")

    def norm(frame):
        return sorted(
            map(tuple, frame.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    state = bottomk_sample_state(df, ["lang"], "n_chars", "doc_id", k=8)
    got = norm(state)
    # null keys never sampled and never counted
    assert all(t[2] is not None for t in got)
    n_by_group = {t[0]: t[4] for t in got}
    assert n_by_group["g1"] == 46 and n_by_group[None] == 40
    # deterministic under repartitioning AND a different shard count,
    # duplicate 'dup' keys included
    for variant in (
        bottomk_sample_state(df.repartition(7), ["lang"], "n_chars", "doc_id", k=8),
        bottomk_sample_state(df, ["lang"], "n_chars", "doc_id", k=8, n_shards=3),
    ):
        assert norm(variant) == got

    # merged == batch over the concatenation, null group included
    a = df.where("n_chars % 2 = 0")
    b = df.where("n_chars % 2 = 1")
    sa = bottomk_sample_state(a, ["lang"], "n_chars", "doc_id", k=8)
    sb = bottomk_sample_state(b, ["lang"], "n_chars", "doc_id", k=8)
    merged = merge_bottomk_states(sa, sb, ["lang"], "doc_id", k=8)
    assert norm(merged) == got
    # and the quantile fold sees both groups with the right counts
    q = {
        r.lang: r.n_rows
        for r in quantiles_from_bottomk(merged, ["lang"], "n_chars", [0.5]).collect()
    }
    assert q == {"g1": 46, None: 40}


def test_bottomk_global_no_groups(spark):
    """group_cols=[] — the GLOBAL sketch: stage 2 is a bounded
    single-task merge of <= k*n_shards survivors, the merge fold's
    totals attach via cross join (one totals row), and merged ==
    batch over the concatenation."""
    from rental_data_pipeline_spark.operators.sketch import (
        bottomk_sample_state,
        merge_bottomk_states,
        quantiles_from_bottomk,
    )

    df = spark.createDataFrame(
        [(i * 7 % 101, f"k{i}") for i in range(200)], "v long, key string"
    )
    whole = bottomk_sample_state(df, [], "v", "key", k=16)
    got = sorted(map(tuple, whole.collect()))
    assert len(got) == 16 and all(t[3] == 200 for t in got)
    a = df.where("v % 2 = 0")
    b = df.where("v % 2 = 1")
    merged = merge_bottomk_states(
        bottomk_sample_state(a, [], "v", "key", k=16),
        bottomk_sample_state(b, [], "v", "key", k=16),
        [], "key", k=16,
    )
    assert sorted(map(tuple, merged.collect())) == got
    q = quantiles_from_bottomk(merged, [], "v", [0.5]).collect()[0]
    assert q.n_rows == 200


def test_bottomk_payload_tiebreak_matches_duckdb(spark):
    """Duplicate keys with NULL and NaN payload values: the rank-k cut
    must pick the SAME survivor rows on both engines. Spark's default
    asc is NULLS FIRST while DuckDB's is NULLS LAST — the sketch
    orders its payload tiebreak asc_nulls_last explicitly, the one
    spelling both engines agree on (NaN sorts above every number in
    both)."""
    import math

    import duckdb

    from rental_data_pipeline_spark.operators.sketch import (
        bottomk_sample_state,
    )

    rows = []
    for i in range(30):
        # key "dupN" appears 3x with payloads {value, NULL, NaN}
        rows.append((f"g{i % 2}", float(i), f"dup{i % 5}"))
        rows.append((f"g{i % 2}", None, f"dup{i % 5}"))
        rows.append((f"g{i % 2}", float("nan"), f"dup{i % 5}"))
    df = spark.createDataFrame(rows, "g string, v double, key string")
    k = 7

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return f"{float(v):.6f}"

    got = sorted(
        (r["g"], norm(r["v"]), r["key"], r["__n"])
        for r in bottomk_sample_state(df, ["g"], "v", "key", k=k).collect()
    )
    con = duckdb.connect()
    # build the table NATIVELY: a pandas registration collapses NaN
    # into NULL (float64 can't carry both), which is a harness
    # artifact — parquet (the driver's oracle path) and native tables
    # keep them distinct, and both engines then agree on
    # numbers < NaN < NULL under NULLS LAST
    con.execute("CREATE TABLE t(g VARCHAR, v DOUBLE, key VARCHAR)")
    vals = ", ".join(
        "('%s', %s, '%s')"
        % (g, "NULL" if v is None else ("'NaN'::DOUBLE" if math.isnan(v) else repr(v)), key)
        for g, v, key in rows
    )
    con.execute(f"INSERT INTO t VALUES {vals}")
    want = sorted(
        (g, norm(v), key, n)
        for g, v, key, n in con.execute(f"""
            SELECT g, v, key, n FROM (
              SELECT g, v, key,
                     count(*) OVER (PARTITION BY g) AS n,
                     row_number() OVER (
                       PARTITION BY g
                       ORDER BY md5('sq' || CAST(key AS VARCHAR)),
                                key, v NULLS LAST) AS rk
              FROM t WHERE key IS NOT NULL)
            WHERE rk <= {k}
        """).fetchall()
    )
    assert got == want
