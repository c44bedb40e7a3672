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
    shuffle anti-join path; pair results are identical to the
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
