"""Fifth review pass regression pins: time-series/sketch/sampling/
text operators on dirty inputs (nulls, ties, whitespace), session-tz
independence, and single-task plan shapes."""

import pytest
from pyspark.sql import functions as F


def test_asof_tiebreak_is_deterministic_across_row_order(spark):
    """Simultaneous right rows must resolve by the tiebreak COLUMN'S
    VALUES (carried from the right side), not input order — nulling
    them made the matched payload depend on partitioning."""
    from rental_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long")
    rows = [(1, 10, 1, 100.0), (1, 10, 2, 200.0)]
    for order in (rows, rows[::-1]):
        right = spark.createDataFrame(
            order, "k long, t long, seq long, price double"
        ).coalesce(1)
        got = asof_join(
            left, right, "k", "t", ["price"], tiebreak="seq"
        ).collect()
        assert [r.asof_price for r in got] == [200.0], order


def test_asof_ignores_null_keys_and_times(spark):
    """ASOF semantics: null keys match nothing, a null right time is
    un-orderable (it used to match every left row as time=-infinity),
    and a null left time stays unmatched in BOTH directions."""
    from rental_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 5, 1), ("a", 5, 2), ("a", None, 3)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [(None, 3, 42.0), ("a", None, 43.0), ("a", 4, 44.0)],
        "k string, t long, price double",
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.asof_price
            for r in asof_join(
                left, right, "k", "t", ["price"], direction=direction
            ).collect()
        }
        assert got[1] is None, direction  # null left key
        assert got[3] is None, direction  # null left time
        if direction == "backward":
            assert got[2] == 44.0  # matches t=4, NOT the null-time row
        else:
            assert got[2] is None  # no right row at t >= 5


def test_point_in_interval_left_outer_with_null_point_attrs(spark):
    """A matched point carrying a NULL attribute must not be re-emitted
    as a spurious unmatched row (the restore anti-join needs null-safe
    equality)."""
    from rental_data_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    points = spark.createDataFrame(
        [(1, 5.0, None), (2, 50.0, "x")], "pid long, p double, note string"
    )
    intervals = spark.createDataFrame(
        [(100, 0.0, 10.0)], "iid long, lo double, hi double"
    )
    got = point_in_interval_join(
        points, intervals, "p", "lo", "hi", F.lit(10.0), how="left_outer"
    ).collect()
    assert len(got) == 2
    by_pid = {r.pid: r for r in got}
    assert by_pid[1].iid == 100
    assert by_pid[2].iid is None


def test_point_in_interval_bins_are_timezone_independent(spark):
    """The timestamp bin divisor must be the WIDTH in micros; baking
    the session tz's 1970 offset in made a +01:00 session with 1-hour
    bins divide by ZERO."""
    from rental_data_pipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")
        points = spark.createDataFrame(
            [(1, "2024-03-01 10:30:00")], "pid long, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        intervals = spark.createDataFrame(
            [(9, "2024-03-01 10:00:00", "2024-03-01 11:00:00")],
            "iid long, lo string, hi string",
        ).withColumn("lo", F.to_timestamp("lo")).withColumn(
            "hi", F.to_timestamp("hi")
        )
        got = point_in_interval_join(
            points, intervals, "ts", "lo", "hi",
            F.expr("INTERVAL 1 HOUR"),
        ).collect()
        assert [r.iid for r in got] == [9]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_gapfill_drops_null_timestamp_observations(spark):
    """A null-ts observation cannot sit on the spine; it used to
    masquerade as a spine row and leak a phantom (key, tick=NULL)
    output row."""
    from rental_data_pipeline_spark.operators.rangejoin import (
        gapfill_locf,
    )

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 1.0),
            ("k", None, 9.0),
            ("k", "2024-01-03 00:00:00", 3.0),
        ],
        "key string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = gapfill_locf(
        df, "key", "ts", ["v"], F.expr("INTERVAL 1 DAY")
    ).collect()
    assert len(got) == 3  # a 3-day spine, no phantom tick
    assert all(r.tick is not None for r in got)
    assert sorted(r.v for r in got) == [1.0, 1.0, 3.0]  # 9.0 never leaks


def test_hll_ignores_null_values(spark):
    """COUNT DISTINCT ignores NULLs; a null register row used to push
    the present-register count past m and inflate the estimate 2.5x."""
    from rental_data_pipeline_spark.operators.sketch import (
        hll_distinct,
    )

    base = spark.range(100).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    with_null = base.unionByName(
        spark.createDataFrame([("g", None)], "grp string, v string")
    )
    e0 = hll_distinct(base, ["grp"], "v").collect()[0]
    e1 = hll_distinct(with_null, ["grp"], "v").collect()[0]
    assert e0 == e1


def test_countmin_duplicate_probes_keep_zero_proof(spark):
    """A probe duplicated in `items` must not defeat the hits<depth
    zero-counter proof (it used to multiply the hit count and return a
    positive estimate for a provably-absent item)."""
    from rental_data_pipeline_spark.operators.sketch import (
        countmin_lookup,
        countmin_sketch,
    )

    data = spark.createDataFrame(
        [("g", f"v{i}") for i in range(50)], "grp string, v string"
    )
    sketch = countmin_sketch(data, ["grp"], "v", depth=4, width=4)
    absent = spark.createDataFrame(
        [("g", "zz-absent"), ("g", "zz-absent")], "grp string, v string"
    )
    got = countmin_lookup(
        sketch, absent, ["grp"], "v", depth=4, width=4
    ).collect()
    # whatever the collisions, the duplicate probe must not raise the
    # estimate above the single-probe answer
    single = countmin_lookup(
        sketch, absent.limit(1), ["grp"], "v", depth=4, width=4
    ).collect()[0].cm_estimate
    assert len(got) == 1 and got[0].cm_estimate == single


def test_exact_k_sample_global_path_avoids_single_task_window(spark):
    """The ungrouped path must plan as a distributed TakeOrdered, not
    an unpartitioned window that funnels the corpus through one task;
    rows must stay the deterministic hash-ranked top-k."""
    from rental_data_pipeline_spark.operators.sampling import (
        exact_k_sample,
    )

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = exact_k_sample(df, "doc_id", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    assert "Window" not in plan
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in exact_k_sample(df.repartition(7), "doc_id", 10).collect())
    assert len(a) == 10 and a == b  # partitioning-independent


def test_mix_corpora_on_documents_schema(spark):
    """mix_corpora must work on the canonical documents table (which
    already has a 'source' column) and validate its weights."""
    from rental_data_pipeline_spark.operators.sampling import (
        mix_corpora,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "web") for i in range(20)],
        "doc_id long, text string, source string",
    )
    out = mix_corpora(
        {"a": docs, "b": docs}, {"a": 1.0, "b": 1.0}, total_rows=10
    )
    assert out.where(F.col("source") == "a").count() == 5
    assert out.where(F.col("source") == "b").count() == 5
    with pytest.raises(ValueError, match="missing a weight"):
        mix_corpora({"a": docs}, {}, total_rows=10)
    with pytest.raises(ValueError, match="no sources"):
        mix_corpora({}, {}, total_rows=10)


def test_scd2_null_ts_predecessor_does_not_split_runs(spark):
    """A predecessor with a NULL timestamp used to flag every
    successor as a run start, emitting duplicate (even doubly-current)
    intervals for one unchanged attribute run."""
    from rental_data_pipeline_spark.operators.scd import scd2_intervals

    df = spark.createDataFrame(
        [(1, None, "a"), (1, None, "a"), (1, 10, "a")],
        "k long, ts long, attr string",
    )
    got = scd2_intervals(df, "k", "ts", ["attr"]).collect()
    assert len(got) == 1  # one attribute run -> one interval
    assert got[0].valid_to is None


def test_pack_sequences_dirty_ids_and_duplicate_ids(spark):
    """Null ids drop (they have no place in the id-ordered packing —
    they used to crash the driver-side offset sort); null text packs
    as 0 tokens; duplicate ids must not double-count via the RANGE
    frame."""
    from rental_data_pipeline_spark.operators.textstats import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [("a", "x y z"), (None, "p q"), ("b", None), ("c", "w " * 4)],
        "doc_id string, text string",
    )
    out = pack_sequences(df, token_budget=5)
    rows = out.collect()
    assert sum(r.n_docs for r in rows) == 3  # null id dropped
    assert sum(r.total_tokens for r in rows) == 3 + 0 + 4

    dup = spark.createDataFrame(
        [("a", "t " * 3)] * 2 + [("b", "t " * 3)],
        "doc_id string, text string",
    )
    packed = pack_sequences(dup, token_budget=6)
    assert sum(r.total_tokens for r in packed.collect()) == 9
    # 9 tokens over budget 6 -> bins 0 and 1; RANGE peers would have
    # put the two duplicate 'a' docs at the same (double-counted) start
    assert {r.bin_id for r in packed.collect()} == {0, 1}


def test_chunk_documents_rejects_negative_overlap(spark):
    from rental_data_pipeline_spark.operators.textstats import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, overlap=-5)


def test_multimodal_null_payload_survives(spark):
    """Null and undecodable payloads yield ok=false rows with null
    features — one bad row must not kill an hours-long stage."""
    from rental_data_pipeline_spark.operators.multimodal import (
        decode_features,
        encode_bmp,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"abcdefgh"), (2, None), (3, encode_bmp(4, 2, (9, 8, 7)))],
        "doc_id long, payload binary",
    )
    feats = {r.doc_id: r for r in decode_features(df).collect()}
    assert not feats[1].ok and feats[1].n_bytes is None  # not a BMP
    assert not feats[2].ok and feats[2].width is None    # null payload
    assert feats[3].ok and (feats[3].width, feats[3].height) == (4, 2)
    assert (feats[3].mean_r, feats[3].mean_g, feats[3].mean_b) == (9, 8, 7)
    frames = sample_frames(df, stride=4).groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in frames}[2] == 1  # null: 1 frame


def test_tokens_strip_full_whitespace(spark):
    """Newline-terminated docs must not grow phantom empty tokens."""
    from rental_data_pipeline_spark.operators.textstats import token_stats

    df = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\tx\n")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tokens for r in token_stats(df).collect()}
    assert got == {1: 2, 2: 1}
