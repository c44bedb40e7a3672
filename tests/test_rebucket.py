"""State-table rebucket migration: a table created at the local
default bucket count must be movable to a production count offline,
with reads identical across the migration and folds continuing under
the new layout."""

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators.merge import merge_snapshots
from rental_data_pipeline_spark.streaming import (
    incremental_merge_stream,
    read_state,
    read_snapshot_stream,
)
from rental_data_pipeline_spark.streaming.incremental import (
    SNAPSHOT_SCHEMA,
    StateVersionUnavailable,
    rebucket_state,
    state_version_log,
)


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="rebucket_test_")
    yield f"{d}/landing", f"{d}/state", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def _snapshots(spark, n_keys=50):
    rows = []
    for k in range(1, n_keys + 1):
        rows.append((k, f"2024-01-01 10:{k % 60:02d}:00", 100.0 + k, False, k))
        rows.append(
            (k, f"2024-01-02 10:{k % 60:02d}:00", 120.0 + k, False, n_keys + k)
        )
        rows.append(
            (k, f"2024-01-03 10:{k % 60:02d}:00", 120.0 + k, k % 5 == 0, 2 * n_keys + k)
        )
    df = spark.createDataFrame(
        rows,
        "offer_id long, updated_date string, price_value double, "
        "is_unpublished boolean, event_id long",
    )
    return df.withColumn("updated_date", F.to_timestamp("updated_date"))


def _run_stream(spark, landing, state, ckpt):
    stream = read_snapshot_stream(spark, landing, SNAPSHOT_SCHEMA, 1)
    q = incremental_merge_stream(stream, state, ckpt)
    q.awaitTermination(120)


def _state_rows(spark, state):
    return {
        r.offer_id: (r.price_value, r.is_unpublished, r.total_price_changes)
        for r in read_state(spark, state).collect()
    }


def test_rebucket_preserves_reads_and_folds_continue(spark, tmpdirs):
    landing, state, ckpt = tmpdirs
    snaps = _snapshots(spark)
    for day in (1, 2):
        snaps.where(F.dayofmonth("updated_date") == day).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    _run_stream(spark, landing, state, ckpt)
    before = _state_rows(spark, state)
    pre_migration_version = state_version_log(state)[-1]["version"]

    assert rebucket_state(spark, state, 64)
    meta = json.load(open(f"{state}/_meta.json"))
    assert meta["n_buckets"] == 64 and "migrated_at_version" in meta
    # reads identical across the migration
    assert _state_rows(spark, state) == before
    # the migration snapshot is FULL and bucketed under the new count:
    # with 50 keys some bucket id must exceed the old count of 16
    log = state_version_log(state)
    assert log[-1]["full"] and max(log[-1]["buckets"]) >= 16
    # no-op when already at the target
    assert rebucket_state(spark, state, 64) is False

    # folds continue under the new layout (meta wins over the caller's
    # n_buckets parameter) and pruned reads use the new bucket count
    snaps.where(F.dayofmonth("updated_date") == 3).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run_stream(spark, landing, state, ckpt)
    want = {
        r.offer_id: (r.price_value, r.is_unpublished, r.total_price_changes)
        for r in merge_snapshots(
            snaps, key="offer_id", order_cols=["updated_date", "event_id"]
        ).collect()
    }
    assert _state_rows(spark, state) == want
    post = state_version_log(state)[-1]
    assert post["buckets"] is not None and max(post["buckets"]) >= 16

    # time travel below the migration raises by documented design
    with pytest.raises(StateVersionUnavailable):
        read_state(spark, state, as_of_version=pre_migration_version)
    # at/after the migration it reads
    mig = meta["migrated_at_version"]
    assert read_state(spark, state, as_of_version=mig).count() == len(before)


def test_interrupted_rebucket_blocks_and_resumes(spark, tmpdirs):
    landing, state, ckpt = tmpdirs
    snaps = _snapshots(spark, n_keys=10)
    snaps.where(F.dayofmonth("updated_date") == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run_stream(spark, landing, state, ckpt)
    before = _state_rows(spark, state)

    # simulate a crash mid-migration: staged meta on disk
    with open(f"{state}/_meta.json.pending", "w") as f:
        json.dump({"n_buckets": 64, "key": "offer_id"}, f)
    with pytest.raises(RuntimeError, match="interrupted rebucket"):
        read_state(spark, state)
    # re-running the migration finishes it; reads come back identical
    assert rebucket_state(spark, state, 64)
    assert not os.path.exists(f"{state}/_meta.json.pending")
    assert _state_rows(spark, state) == before
    assert json.load(open(f"{state}/_meta.json"))["n_buckets"] == 64
