"""Round-11 hardening: the four driver-ADVICE edge cases.

- sign_lsh_bucket on NULL embeddings (null-in/null-out, not job abort)
- asof_join with a tiebreak typed differently on the two sides
- bucketed_keyed_fold's non-deleting merge_fn contract raising loudly
  instead of silently resurrecting deleted rows
- _cap_hot_shingles falling back to a shuffle anti-join when the
  over-cap shingle set exceeds the broadcast cap
"""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="hardening5_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sign_lsh_bucket_null_vector_is_null(spark):
    """A missing embedding buckets to NULL; a too-short one still
    raises. (F.size(NULL) >= bits is NULL — without the explicit null
    arm the raise_error branch fired on benign null rows.)"""
    from rental_data_pipeline_spark.operators.similarity import (
        sign_lsh_bucket,
    )

    df = spark.createDataFrame(
        [(1, [1.0] * 16), (2, None)],
        "id long, v array<double>",
    )
    rows = {
        r.id: r.b
        for r in df.select(
            "id", sign_lsh_bucket(F.col("v"), bits=16).alias("b")
        ).collect()
    }
    assert rows[1] == (1 << 16) - 1
    assert rows[2] is None

    short = spark.createDataFrame([(3, [1.0, 2.0])], "id long, v array<double>")
    with pytest.raises(Exception, match="sign_lsh_bucket"):
        short.select(sign_lsh_bucket(F.col("v"), bits=16)).collect()


def test_asof_tiebreak_typed_differently_on_both_sides(spark):
    """Left types the tiebreak int, right types it long (routine across
    ingest surfaces): the carried right value is cast to the left type
    so the union neither fails nor silently widens, and the largest
    simultaneous right row still wins backward."""
    from rental_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, 7)], "k long, t long, seq int"
    )
    right = spark.createDataFrame(
        [(1, 100, 1, "lo"), (1, 100, 2, "hi")],
        "k long, t long, seq long, tag string",
    )
    out = asof_join(
        left, right, key="k", time_col="t",
        right_payload=["tag"], tiebreak="seq",
    )
    assert dict(out.dtypes)["seq"] == "int"
    row = out.collect()[0]
    assert row.asof_tag == "hi" and row.seq == 7  # left keeps ITS seq

    # the internal union widens (never narrows): a right seq beyond
    # int range must keep its true sort order, not wrap — the larger
    # value wins the backward tiebreak
    wide_r = spark.createDataFrame(
        [(1, 100, 2147483647, "old"), (1, 100, 2147483648, "new")],
        "k long, t long, seq long, tag string",
    )
    wrow = asof_join(
        left, wide_r, key="k", time_col="t",
        right_payload=["tag"], tiebreak="seq",
    ).collect()[0]
    assert wrow.asof_tag == "new"

    # incomparable tiebreak types raise at plan time, loudly
    str_r = spark.createDataFrame(
        [(1, 100, "a", "x")], "k long, t long, seq string, tag string"
    )
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(
            left, str_r, key="k", time_col="t",
            right_payload=["tag"], tiebreak="seq",
        )


def test_asof_tiebreak_long_vs_float_no_value_corruption(spark):
    """A long<->float tiebreak mix must NOT round-trip the left column
    through float: |seq| > 2^24 is unrepresentable in float, so the old
    widen-and-cast-back plan silently corrupted the emitted value
    (16777217 -> 16777216). Ordering now runs on a double shadow column
    and the left value passes through exactly."""
    from rental_data_pipeline_spark.operators.asof import asof_join

    big = 2**24 + 1  # 16777217: first long a float cannot hold
    left = spark.createDataFrame(
        [(1, 100, big)], "k long, t long, seq long"
    )
    right = spark.createDataFrame(
        [(1, 100, 1.5, "lo"), (1, 100, 2.5, "hi")],
        "k long, t long, seq float, tag string",
    )
    out = asof_join(
        left, right, key="k", time_col="t",
        right_payload=["tag"], tiebreak="seq",
    )
    # left schema preserved exactly — type AND value
    assert dict(out.dtypes)["seq"] == "bigint"
    assert "__tb_sort" not in out.columns
    row = out.collect()[0]
    assert row.seq == big          # the corruption the shadow prevents
    assert row.asof_tag == "hi"    # larger float still wins backward

    # int<->float mix: distinct int sort keys past 2^24 must not
    # collapse in the ORDER either — double holds every int exactly
    left2 = spark.createDataFrame([(1, 100, 0)], "k long, t long, seq int")
    right2 = spark.createDataFrame(
        [(1, 100, 16777216.0, "lo"), (1, 100, 16777218.0, "hi")],
        "k long, t long, seq float, tag string",
    )
    r2 = asof_join(
        left2, right2, key="k", time_col="t",
        right_payload=["tag"], tiebreak="seq",
    ).collect()[0]
    assert r2.asof_tag == "hi" and r2.seq == 0


def test_bucketed_fold_deleting_merge_fn_raises(spark, outdir):
    """A merge_fn that empties non-empty touched buckets violates the
    non-deleting contract: the delta layout cannot commit an emptied
    bucket, so the fold must raise rather than drop the commit and
    resurrect the rows on the next read."""
    from rental_data_pipeline_spark.streaming.incremental import (
        bucketed_keyed_fold,
        read_state_or_legacy,
    )

    state = f"{outdir}/state"
    upsert = lambda t, b: (
        b if t is None
        else t.unionByName(b).groupBy("k").agg(F.max("v").alias("v"))
    )
    bucketed_keyed_fold(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        0, state, key="k", merge_fn=upsert,
    )
    # deleting merge: drops every stored key of the touched buckets
    with pytest.raises(RuntimeError, match="non-deleting"):
        bucketed_keyed_fold(
            spark.createDataFrame([(1, 99)], "k long, v long"),
            1, state, key="k",
            merge_fn=lambda t, b: b.where(F.lit(False)),
        )
    # the keyless/no-prior-state empty delta is still a clean no-op
    empty_state = f"{outdir}/state2"
    bucketed_keyed_fold(
        spark.createDataFrame([(None, 5)], "k long, v long"),
        0, empty_state, key="k",
        merge_fn=lambda t, b: b.where(F.col("k").isNotNull()),
    )
    assert read_state_or_legacy(spark, state).count() == 2

    # the guard must hold on FULL commits too (compaction cadence):
    # an empty full snapshot would silently truncate the whole state
    state3 = f"{outdir}/state3"
    bucketed_keyed_fold(
        spark.createDataFrame([(1, 10)], "k long, v long"),
        0, state3, key="k", merge_fn=upsert, compact_every=1,
    )
    with pytest.raises(RuntimeError, match="non-deleting"):
        bucketed_keyed_fold(
            spark.createDataFrame([(2, 20)], "k long, v long"),
            1, state3, key="k", compact_every=1,  # full commit
            merge_fn=lambda t, b: b.where(F.lit(False)),
        )
    # the refused commit left no wedged part-file-less version behind
    assert read_state_or_legacy(spark, state3).count() == 1


def test_hot_shingle_cap_shuffle_fallback(spark, monkeypatch):
    """With the broadcast cap forced to 0 every over-cap set takes the
    salted shuffle anti-join path; pair results are identical to the
    broadcast path's."""
    from rental_data_pipeline_spark.operators import dedup

    rows = [
        (1, "the cat sat on the mat today"),
        (2, "the cat sat on the mat tonight"),
        (3, "an entirely different document body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.2, k=2, max_doc_freq=2)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.jaccard_pairs(df, **kw).collect()
    }
    monkeypatch.setattr(dedup, "HOT_SHINGLE_BROADCAST_CAP", 0)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.jaccard_pairs(df, **kw).collect()
    }
    assert got == want and want  # non-trivial: pair(1,2) survives


def test_hot_shingle_fallback_stratifies_by_doc_frequency(spark, monkeypatch):
    """The fallback's skew defusal is df-stratification (with salting
    as the last resort), not AQE: OptimizeSkewedJoin only matches SMJ
    children that are bare ENSURE_REQUIREMENTS shuffles directly under
    Sort, and the fallback's right side is a persisted aggregate — so
    the guard must route ULTRA-hot shingles through a broadcast
    (map-side drop, pre-shuffle), bound the warm tier's per-key volume
    by ULTRA_DF, and salt only when even the ultra tier outgrows the
    broadcast cap."""
    from pyspark.sql import functions as F2

    from rental_data_pipeline_spark.operators import dedup

    # two hot data-dependent shingles (one ultra, one warm) + a tail
    exploded = spark.range(6000).select(
        F2.col("id").alias("doc"),
        F2.concat(
            F2.lit("s"),
            F2.when(F2.col("id") % 6 < 4, F2.lit(0))        # df=4000
            .when(F2.col("id") % 6 == 4, F2.lit(1))          # df=1000
            .otherwise(F2.col("id") % 500 + 10)              # df~2
            .cast("string"),
        ).alias("shingle"),
    )

    def run():
        out = dedup._cap_hot_shingles(exploded, max_doc_freq=100)
        kept = out.collect()
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        return kept, plan

    # reference: the broadcast path (default caps)
    want = sorted((r.doc, r.shingle) for r in run()[0])
    assert len(want) == 1000 and all(s not in ("s0", "s1") for _, s in want)

    # WARM tier: hot set over the cap but every df under ULTRA_DF —
    # plain shuffle anti-join, per-key volume bounded, no salt column
    monkeypatch.setattr(dedup, "HOT_SHINGLE_BROADCAST_CAP", 0)
    kept, plan = run()
    assert sorted((r.doc, r.shingle) for r in kept) == want
    assert "__salt" not in plan and "LeftAnti" in plan

    # ULTRA tier: cap=1 rejects the 2-shingle hot set, but s0
    # (df=4000) alone crosses the lowered ULTRA_DF and broadcasts
    # (map-side drop); s1 stays in the warm anti-join
    monkeypatch.setattr(dedup, "HOT_SHINGLE_BROADCAST_CAP", 1)
    monkeypatch.setattr(dedup, "HOT_SHINGLE_ULTRA_DF", 2000)
    kept, plan = run()
    assert sorted((r.doc, r.shingle) for r in kept) == want
    assert "__salt" not in plan

    # LAST RESORT: the ultra tier itself exceeds the broadcast cap —
    # the salted join keys on (shingle, salt)
    monkeypatch.setattr(dedup, "HOT_SHINGLE_BROADCAST_CAP", 0)
    monkeypatch.setattr(dedup, "HOT_SHINGLE_ULTRA_DF", 0)
    kept, plan = run()
    assert sorted((r.doc, r.shingle) for r in kept) == want
    assert "__salt" in plan and "LeftAnti" in plan
    # the salt genuinely fans the hot key out across distinct values
    n_salts = (
        exploded.where("shingle = 's0'")
        .select(
            F2.pmod(F2.xxhash64("doc"), F2.lit(dedup.HOT_SHINGLE_SALTS))
        )
        .distinct()
        .count()
    )
    assert n_salts == dedup.HOT_SHINGLE_SALTS


def test_hll_and_countmin_ignore_nulls_and_oracles_agree(spark):
    """COUNT-DISTINCT semantics ignore NULLs on BOTH engines: the HLL
    oracle SQL must filter NULL values like hll_registers does (it
    didn't — one NULL row read 3.02 against Spark's 2.01), and
    countmin_sketch must not mint NULL-bucket junk counters."""
    import duckdb

    from rental_data_pipeline_spark.operators.sketch import (
        countmin_lookup,
        countmin_sketch,
        hll_distinct,
        hll_oracle_sql,
    )

    rows = [("a", "u1"), ("a", "u2"), ("a", None), ("a", "u1")]
    df = spark.createDataFrame(rows, "g string, v string")
    got = hll_distinct(df, ["g"], "v", p=8).collect()[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(g VARCHAR, v VARCHAR); "
        "INSERT INTO t VALUES ('a','u1'),('a','u2'),('a',NULL),('a','u1')"
    )
    want = con.execute(hll_oracle_sql("t", ["g"], "v", p=8)).fetchone()
    assert got.hll_estimate == pytest.approx(want[1]), (got, want)

    sk = countmin_sketch(df, ["g"], "v", depth=4, width=64)
    assert sk.where(F.col("__bucket").isNull()).count() == 0
    items = spark.createDataFrame([("a", "u1")], "g string, v string")
    est = countmin_lookup(sk, items, ["g"], "v", depth=4, width=64)
    assert est.collect()[0].cm_estimate >= 2  # never undercounts


def test_bucket_threshold_rounds(spark):
    """int() truncation turned 0.57 into 5699/10000 — a silently lost
    bucket every independent consumer disagrees on."""
    from rental_data_pipeline_spark.operators.sampling import (
        bucket_threshold,
        deterministic_sample,
    )

    assert bucket_threshold(0.57) == 5700
    assert bucket_threshold(0.2) == 2000
    # the sample itself uses the rounded cutoff: a key whose bucket is
    # exactly 5699 survives fraction=0.57
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    kept = deterministic_sample(df, "k", 0.57).count()
    assert abs(kept / 2000 - 0.57) < 0.05


def test_exact_k_sample_deterministic_on_nonunique_key(spark):
    """With a non-unique key, same-key rows tie on (hash, key): the
    row-content tiebreak makes the surviving physical rows a pure
    function of the data, not the partition layout."""
    from rental_data_pipeline_spark.operators.sampling import exact_k_sample

    rows = [(i % 7, f"payload_{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "k long, p string").repartition(8, "p")
    b = spark.createDataFrame(list(reversed(rows)), "k long, p string").coalesce(1)
    pick = lambda df: sorted((r.k, r.p) for r in exact_k_sample(df, "k", 3, group_cols=["k"]).collect())
    assert pick(a) == pick(b)
    glob = lambda df: sorted((r.k, r.p) for r in exact_k_sample(df, "k", 10).collect())
    assert glob(a) == glob(b)


def test_gapfill_locf_duplicate_ts_deterministic(spark):
    """Two observations with IDENTICAL (key, ts) but different values:
    the value tiebreak picks one deterministically regardless of input
    order or partitioning."""
    from rental_data_pipeline_spark.operators.rangejoin import gapfill_locf

    rows = [
        (1, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 10:00:00", 9.0),
    ]
    mk = lambda rs, parts: spark.createDataFrame(rs, "k long, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    ).repartition(parts)
    step = F.expr("INTERVAL 1 DAY")
    out1 = gapfill_locf(mk(rows, 1), "k", "ts", ["v"], step).collect()
    out2 = gapfill_locf(mk(list(reversed(rows)), 4), "k", "ts", ["v"], step).collect()
    assert len(out1) == 1 and len(out2) == 1
    assert out1[0].v == out2[0].v == 9.0  # largest value wins the tie


def test_exact_k_sample_nested_map_and_all_map_schemas(spark):
    """xxhash64 rejects MapType at ANY nesting depth: a struct or array
    containing a map must be excluded from the row-content tiebreak
    (previously a plan-time AnalysisException), and a schema whose only
    non-key columns are maps must not call xxhash64() with zero args."""
    from rental_data_pipeline_spark.operators.sampling import exact_k_sample

    # map nested inside a struct and inside an array
    df = spark.createDataFrame(
        [(i % 3, {"m": {"a": i}}, [{"b": i}]) for i in range(20)],
        "k long, s struct<m:map<string,long>>, a array<map<string,long>>",
    )
    out = exact_k_sample(df, "k", 2, group_cols=["k"])
    assert out.count() == 6  # 2 per group, plans and runs cleanly
    assert exact_k_sample(df, "k", 5).count() == 5

    # key + only-map payload: nothing hashable remains
    df2 = spark.createDataFrame(
        [({"a": i}, {"b": i}) for i in range(10)],
        "k map<string,long>, v map<string,long>",
    )
    assert exact_k_sample(df2.withColumn("k2", F.lit(1)), "k2", 3).count() == 3


def test_gapfill_locf_unorderable_value_column(spark):
    """A map-typed value column used to join the window's sort struct
    and raise at plan time; it is now excluded from the tiebreak while
    still being carried (LOCF payload intact)."""
    from rental_data_pipeline_spark.operators.rangejoin import gapfill_locf

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0, {"src": "a"}),
            (1, "2024-01-03 10:00:00", 7.0, {"src": "b"}),
        ],
        "k long, ts string, v double, meta map<string,string>",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v", "meta")
    out = gapfill_locf(
        df, "k", "ts", ["v", "meta"], F.expr("INTERVAL 1 DAY")
    ).orderBy("tick").collect()
    assert [r.v for r in out] == [5.0, 5.0, 7.0]  # day-2 gap inherits
    assert out[0].meta == {"src": "a"} and out[2].meta == {"src": "b"}

    # all-unorderable value set: the tiebreak is skipped entirely
    out2 = gapfill_locf(
        df, "k", "ts", ["meta"], F.expr("INTERVAL 1 DAY")
    ).orderBy("tick").collect()
    assert [r.meta["src"] for r in out2] == ["a", "a", "b"]
