"""Crash/scale hardening of the shared state machinery (review
findings): zero-row commits must not wedge a table, pruning must not
erase the fold's replay record, layout guards refuse the wrong store,
corrupt legacy state fails loudly instead of silently restarting, and
the J5 full-merge gate keys on batch CONTENT, not schema."""

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.streaming.incremental import (
    bucketed_keyed_fold,
    read_state,
    read_state_or_legacy,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="state_hardening_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long")


def _max_merge(target, batch):
    if target is not None:
        batch = target.select("k", "v").unionByName(batch)
    return batch.groupBy("k").agg(F.max("v").alias("v"))


def test_empty_merge_output_does_not_wedge_state(spark, root):
    """A fold whose merge output is ZERO rows (reachable: a first
    batch of keyless-unmatched rows drops entirely under J5) used to
    commit a parquet-less _SUCCESS version that wedged every later
    read and fold with 'Unable to infer schema'."""
    state = f"{root}/state"

    def drop_all(target, batch):
        return _max_merge(target, batch).where(F.lit(False))

    bucketed_keyed_fold(
        _rows(spark, [(1, 10)]), 0, state, key="k", merge_fn=drop_all
    )
    st = read_state(spark, state)  # must not raise
    assert st is None or st.count() == 0

    # the table keeps working: a real fold lands and reads back
    bucketed_keyed_fold(
        _rows(spark, [(2, 20)]), 1, state, key="k", merge_fn=_max_merge
    )
    assert {(r.k, r.v) for r in read_state(spark, state).collect()} == {
        (2, 20)
    }

    # an empty DELTA (state exists, batch merges to nothing new but
    # the merge drops its rows) skips the commit instead of wedging
    bucketed_keyed_fold(
        _rows(spark, [(3, 30)]), 2, state, key="k", merge_fn=drop_all
    )
    assert {(r.k, r.v) for r in read_state(spark, state).collect()} == {
        (2, 20)
    }


def test_pruned_batch_replay_stays_noop(spark, root):
    """The v_*_b{id} dir name is the fold's replay record; pruning it
    (two newer full commits while a crashed stream is down) must not
    make the restarted stream double-fold the batch — the pruned id
    outlives in _pruned_bids.json."""
    state = f"{root}/state"
    bucketed_keyed_fold(  # v0: first commit = full
        _rows(spark, [(1, 10)]), 0, state, key="k", merge_fn=_max_merge,
        keep_versions=1,
    )
    bucketed_keyed_fold(  # v1: delta for batch 1
        _rows(spark, [(2, 20)]), 1, state, key="k", merge_fn=_max_merge,
        keep_versions=1,
    )
    for bid in (2, 3):  # two full commits shadow and prune v1
        bucketed_keyed_fold(
            _rows(spark, [(3, 30 + bid)]), bid, state, key="k",
            merge_fn=_max_merge, keep_versions=1,
            needs_full=lambda b: True,
        )
    assert not any(
        v.endswith("_b000000001") for v in glob.glob(f"{state}/v_*")
    )  # the dir record is gone...
    assert 1 in set(json.load(open(f"{state}/_pruned_bids.json")))

    want = {(r.k, r.v) for r in read_state(spark, state).collect()}
    # ...but replaying batch 1 (same id, crashed-stream redelivery)
    # is still a no-op, even with different row content
    bucketed_keyed_fold(
        _rows(spark, [(2, 999)]), 1, state, key="k", merge_fn=_max_merge,
        keep_versions=1,
    )
    assert {(r.k, r.v) for r in read_state(spark, state).collect()} == want


def test_rebucket_tiered_refuses_merge_on_write_table(spark, root):
    """Pointing rebucket_tiered at a v_* (merge-on-write) table used
    to silently swap n_buckets in _meta.json without rewriting any
    data — corrupting every later bucket-pruned fold."""
    from rental_data_pipeline_spark.streaming.tiered import (
        rebucket_tiered,
    )

    state = f"{root}/state"
    bucketed_keyed_fold(
        _rows(spark, [(1, 10)]), 0, state, key="k", merge_fn=_max_merge
    )
    with pytest.raises(ValueError, match="merge-on-write"):
        rebucket_tiered(spark, state, 256, lambda df: df)
    assert json.load(open(f"{state}/_meta.json"))["n_buckets"] != 256


def test_corrupt_legacy_state_raises_not_restarts(spark, root):
    """A legacy flat state with a torn part file must fail LOUDLY:
    swallowing the read error reported 'no state' and silently
    restarted the table from empty (and once a version chain existed,
    the flat root was never consulted again)."""
    state = f"{root}/state"
    os.makedirs(state)
    open(f"{state}/part-00000.parquet", "w").close()  # zero-byte: torn
    with pytest.raises(Exception):
        df = read_state_or_legacy(spark, state)
        if df is not None:  # reads are lazy: force the failure
            df.collect()
        else:  # old behavior: silent None
            raise AssertionError("corrupt legacy state read as None")


def test_needs_full_gates_on_adoptable_rows_not_schema(spark, root):
    """The CDC url-adoption (J5) full-merge gate must key on whether
    the batch CONTAINS a keyless row with a url — gating on column
    PRESENCE made every url-bearing stream pay an O(state) full merge
    and _FULL snapshot per micro-batch."""
    from rental_data_pipeline_spark.streaming.incremental import (
        incremental_merge_stream,
    )

    landing, state, ckpt = f"{root}/landing", f"{root}/state", f"{root}/ckpt"
    schema = (
        "offer_id long, updated_date string, price_value double, "
        "is_unpublished boolean, event_id long, offer_url string"
    )

    def land(rows):
        spark.createDataFrame(rows, schema).withColumn(
            "updated_date", F.to_timestamp("updated_date")
        ).coalesce(1).write.mode("append").parquet(landing)

    # batch 1 seeds the state (first commit is always full); batch 2
    # is keyed-only — it must fold as a DELTA despite the url column
    land([(1, "2024-01-01 10:00:00", 100.0, False, 1, "http://a/1")])
    land([(2, "2024-01-02 10:00:00", 55.0, False, 2, "http://a/2")])
    # batch 3 carries a keyless row whose url matches key 1's — THIS
    # one needs (and gets) the full-state merge so adoption works
    land([(None, "2024-01-03 10:00:00", 120.0, False, 3, "http://a/1")])

    stream = (
        spark.readStream.schema(schema.replace(
            "updated_date string", "updated_date timestamp"
        ))
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = incremental_merge_stream(stream, state, ckpt, n_buckets=8)
    q.awaitTermination(120)

    # v0 (first commit, full) gets pruned once batch 3's full commit
    # shadows it; the survivors prove the gate: batch 2 (keyed-only,
    # url column present) folded as a DELTA, batch 3 (keyless row) as
    # a full merge
    versions = sorted(glob.glob(f"{state}/v_*"))
    assert [os.path.basename(v)[-2:] for v in versions] == ["01", "02"]
    fulls = [os.path.exists(f"{v}/_FULL") for v in versions]
    assert fulls == [False, True], versions
    got = {r.offer_id: r for r in read_state(spark, state).collect()}
    assert got[1].price_value == 120.0  # the keyless row adopted key 1
    assert got[2].price_value == 55.0


def test_tiered_parameter_validation(spark, root):
    """fanin=1 would cascade-compact forever inside the stream fold;
    an empty window set would freeze windows=[] and wedge the table."""
    from rental_data_pipeline_spark.streaming.span_stream import (
        fold_spans_batch,
    )
    from rental_data_pipeline_spark.streaming.tiered import (
        maybe_compact,
    )

    with pytest.raises(ValueError, match="fanin"):
        maybe_compact(spark, f"{root}/t", lambda df: df, fanin=1)
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        fold_spans_batch(spark, f"{root}/spans", docs, 0, window=[])
    assert not os.path.exists(f"{root}/spans/_span_window.json")


def test_multi_slice_poll_answers_from_footers_under_threshold(
    spark, root, monkeypatch
):
    """With several live slices, the footer sum is an upper bound on
    the true row count; when even the bound is under the watermark the
    poll must answer without scanning the state."""
    import rental_data_pipeline_spark.streaming.tiered as tiered_mod
    from rental_data_pipeline_spark.streaming.span_stream import (
        _reduce_span_stats,
        fold_spans_batch,
    )
    from rental_data_pipeline_spark.streaming.tiered import (
        suggest_rebucket_tiered,
    )

    run = " ".join(f"t{i}" for i in range(10))
    for b in range(2):
        docs = spark.createDataFrame(
            [(2 * b + i, f"{run} u{2 * b + i}") for i in range(2)],
            "doc_id long, text string",
        )
        fold_spans_batch(spark, root, docs, b, window=10)
    assert len(glob.glob(f"{root}/b_*")) == 2  # two live slices

    def bomb(*a, **k):
        raise AssertionError("poll scanned the state")

    monkeypatch.setattr(tiered_mod, "read_tiered", bomb)
    rep = suggest_rebucket_tiered(
        spark, root, _reduce_span_stats, target_rows_per_bucket=100_000
    )
    assert rep["due"] is False
    assert rep["live_slices"] == 2
