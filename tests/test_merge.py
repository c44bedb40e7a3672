"""CDC merge semantics (SURVEY §2.4 J1-J5/J12, §2.6 W1-W4, §2.5 A4-A6).

Hand-built scenarios from FIXTURES.md §1, plus a differential test
against the reference's pure-Python ``merge_listings`` when the
read-only reference tree is available.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import types as T

from rental_data_pipeline_spark.operators.merge import merge_listings, merge_snapshots

STATE_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.StringType()),
        T.StructField("offer_url", T.StringType()),
        T.StructField("price_value", T.DoubleType()),
        T.StructField("is_unpublished", T.BooleanType()),
        T.StructField("description", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("image_urls", T.ArrayType(T.StringType())),
        T.StructField("publication_date", T.TimestampType()),
        T.StructField("last_active", T.TimestampType()),
        T.StructField("unpublished_date", T.TimestampType()),
        T.StructField("price_change_value", T.LongType()),
        T.StructField("price_change_date", T.TimestampType()),
        T.StructField("total_price_changes", T.LongType()),
        T.StructField("price_changes", T.StringType()),
        T.StructField("price_changes_dates", T.StringType()),
    ]
)

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.StringType()),
        T.StructField("offer_url", T.StringType()),
        T.StructField("price_value", T.DoubleType()),
        T.StructField("is_unpublished", T.BooleanType()),
        T.StructField("description", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("image_urls", T.ArrayType(T.StringType())),
        T.StructField("updated_date", T.TimestampType()),
        T.StructField("seq", T.LongType()),
    ]
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def state_row(offer_id, **kw):
    base = {f.name: None for f in STATE_SCHEMA.fields}
    base["offer_id"] = offer_id
    base.update(kw)
    return base


def batch_row(offer_id, seq, **kw):
    base = {f.name: None for f in BATCH_SCHEMA.fields}
    base["offer_id"] = offer_id
    base["seq"] = seq
    base.update(kw)
    return base


def run_merge(spark, state_rows, batch_rows, **kwargs):
    target = spark.createDataFrame(
        [tuple(r[f.name] for f in STATE_SCHEMA.fields) for r in state_rows],
        STATE_SCHEMA,
    )
    source = spark.createDataFrame(
        [tuple(r[f.name] for f in BATCH_SCHEMA.fields) for r in batch_rows],
        BATCH_SCHEMA,
    )
    out = merge_listings(target, source, order_cols=["seq"], **kwargs)
    return {r["offer_id"]: r.asDict() for r in out.collect()}


def test_same_price_no_cdc(spark):
    """(a) same price re-observed → no change row, last_active bumps."""
    state = [state_row("1", price_value=100.0, is_unpublished=False,
                       last_active=ts("2026-01-01T10:00:00"))]
    batch = [batch_row("1", 1, price_value=100.0, updated_date=ts("2026-01-02T10:00:00"))]
    out = run_merge(spark, state, batch)
    r = out["1"]
    assert r["total_price_changes"] is None
    assert r["price_changes"] is None
    assert r["last_active"] == ts("2026-01-02T10:00:00")


def test_price_change_history_accumulates(spark):
    """(b) >=3 changes: diff/count/history accumulate in event order."""
    state = [state_row("1", price_value=100.0, is_unpublished=False)]
    batch = [
        batch_row("1", 1, price_value=110.0, updated_date=ts("2026-01-02T10:00:00")),
        batch_row("1", 2, price_value=90.0, updated_date=ts("2026-01-03T10:00:00")),
        batch_row("1", 3, price_value=95.0, updated_date=ts("2026-01-04T10:00:00")),
    ]
    out = run_merge(spark, state, batch)
    r = out["1"]
    assert r["total_price_changes"] == 3
    assert r["price_changes"] == "10, -20, 5"
    assert r["price_change_value"] == 5
    assert r["price_change_date"] == ts("2026-01-04T10:00:00")
    assert r["price_changes_dates"] == (
        "2026-01-02 10:00:00, 2026-01-03 10:00:00, 2026-01-04 10:00:00"
    )
    assert r["price_value"] == 95.0


def test_history_continues_prior_string(spark):
    state = [state_row("1", price_value=100.0, total_price_changes=2,
                       price_changes="5, -5", price_changes_dates="a, b")]
    batch = [batch_row("1", 1, price_value=120.0, updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["total_price_changes"] == 3
    assert r["price_changes"] == "5, -5, 20"
    assert r["price_changes_dates"] == "a, b, 2026-01-02 10:00:00"


def test_new_key_publication_date(spark):
    """(c) new key → publication_date = last_active = updated_date."""
    batch = [batch_row("9", 1, price_value=50.0, updated_date=ts("2026-01-05T08:00:00"),
                       timestamp="t0", image_urls=["u1"])]
    r = run_merge(spark, [], batch)["9"]
    assert r["publication_date"] == ts("2026-01-05T08:00:00")
    assert r["last_active"] == ts("2026-01-05T08:00:00")
    assert r["timestamp"] == "t0"
    assert r["image_urls"] == ["u1"]


def test_new_key_without_updated_date(spark):
    """A6 quirk: first row without updated_date → no publication_date,
    even if a later row has one."""
    batch = [
        batch_row("9", 1, price_value=50.0),
        batch_row("9", 2, price_value=60.0, updated_date=ts("2026-01-06T08:00:00")),
    ]
    r = run_merge(spark, [], batch)["9"]
    assert r["publication_date"] is None
    assert r["last_active"] == ts("2026-01-06T08:00:00")
    # second row IS a price change against the first row's price
    assert r["total_price_changes"] == 1
    assert r["price_changes"] == "10"


def test_null_does_not_clobber(spark):
    """(d) J2: null source field preserves stored value."""
    state = [state_row("1", price_value=100.0, description="keep me",
                       is_unpublished=False)]
    batch = [batch_row("1", 1, price_value=None, description=None,
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["price_value"] == 100.0
    assert r["description"] == "keep me"


def test_duplicate_key_in_batch_last_wins_and_both_changes_count(spark):
    """(e) J12 + sequential fold: both in-batch changes are recorded."""
    state = [state_row("1", price_value=100.0)]
    batch = [
        batch_row("1", 1, price_value=110.0, updated_date=ts("2026-01-02T10:00:00")),
        batch_row("1", 2, price_value=105.0, updated_date=ts("2026-01-02T11:00:00")),
    ]
    r = run_merge(spark, state, batch)["1"]
    assert r["price_value"] == 105.0
    assert r["total_price_changes"] == 2
    assert r["price_changes"] == "10, -5"


def test_unpublish_transition(spark):
    """W2: false→true with updated_date sets unpublished_date; the same
    row's price change is NOT recorded (elif)."""
    state = [state_row("1", price_value=100.0, is_unpublished=False)]
    batch = [batch_row("1", 1, price_value=120.0, is_unpublished=True,
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["unpublished_date"] == ts("2026-01-02T10:00:00")
    assert r["total_price_changes"] is None  # suppressed by elif
    assert r["price_value"] == 120.0  # field merge still applies


def test_unpublish_requires_stored_false(spark):
    """W2: stored is_unpublished null (not False) → no transition."""
    state = [state_row("1", price_value=100.0, is_unpublished=None)]
    batch = [batch_row("1", 1, is_unpublished=True,
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["unpublished_date"] is None
    assert r["is_unpublished"] is True


def test_description_skipped_on_unpublish(spark):
    """J4: unpublishing row does not update description."""
    state = [state_row("1", description="original", is_unpublished=False)]
    batch = [batch_row("1", 1, description="gone", is_unpublished=True,
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["description"] == "original"


def test_protected_columns(spark):
    """J3: timestamp/image_urls never updated for existing keys."""
    state = [state_row("1", timestamp="t0", image_urls=["a"])]
    batch = [batch_row("1", 1, timestamp="t1", image_urls=["b"],
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["timestamp"] == "t0"
    assert r["image_urls"] == ["a"]


def test_url_fallback_key_resolution(spark):
    """J5: keyless row with matching offer_url adopts key, forced unpublished."""
    state = [state_row("1", offer_url="https://x/rent/flat/1", price_value=100.0,
                       is_unpublished=False)]
    batch = [batch_row(None, 1, offer_url="https://x/rent/flat/1",
                       updated_date=ts("2026-01-02T10:00:00"))]
    r = run_merge(spark, state, batch)["1"]
    assert r["is_unpublished"] is True
    assert r["unpublished_date"] == ts("2026-01-02T10:00:00")


def test_keyless_unmatched_row_dropped(spark):
    batch = [batch_row(None, 1, offer_url="https://x/rent/flat/404")]
    out = run_merge(spark, [], batch)
    assert out == {}


def test_no_updated_date_merges_fields_only(spark):
    """W4: no updated_date → field merge, no CDC, last_active untouched."""
    state = [state_row("1", price_value=100.0, last_active=ts("2026-01-01T00:00:00"))]
    batch = [batch_row("1", 1, price_value=200.0)]
    r = run_merge(spark, state, batch)["1"]
    assert r["price_value"] == 200.0
    assert r["total_price_changes"] is None
    assert r["last_active"] == ts("2026-01-01T00:00:00")


def test_guard_drops_update_older_than_stored_last_active(spark):
    """T5 guard on: a source row older than the stored last_active is a
    complete no-op (no field merge, no CDC); off: reference parity —
    the stale row overwrites (pinned by the T5 replay test)."""
    state = [state_row("1", price_value=100.0, is_unpublished=False,
                       last_active=ts("2026-01-05T10:00:00"))]
    batch = [batch_row("1", 1, price_value=90.0,
                       updated_date=ts("2026-01-03T10:00:00"))]
    guarded = run_merge(spark, state, batch, guard_out_of_order=True)["1"]
    assert guarded["price_value"] == 100.0
    assert guarded["last_active"] == ts("2026-01-05T10:00:00")
    assert guarded["total_price_changes"] is None
    unguarded = run_merge(spark, state, batch)["1"]
    assert unguarded["price_value"] == 90.0
    assert unguarded["last_active"] == ts("2026-01-03T10:00:00")
    assert unguarded["total_price_changes"] == 1


def test_guard_evolving_watermark_within_batch(spark):
    """The guard compares against the EVOLVING last_active (a fresh
    in-batch row raises the bar for later arrivals), matching what a
    sequential fold with `src.updated_date >= tgt.last_active` does."""
    state = [state_row("1", price_value=100.0, is_unpublished=False,
                       last_active=ts("2026-01-01T10:00:00"))]
    batch = [
        batch_row("1", 1, price_value=120.0,
                  updated_date=ts("2026-01-04T10:00:00")),
        # newer than stored last_active but older than the row above
        batch_row("1", 2, price_value=90.0,
                  updated_date=ts("2026-01-02T10:00:00")),
    ]
    guarded = run_merge(spark, state, batch, guard_out_of_order=True)["1"]
    assert guarded["price_value"] == 120.0
    assert guarded["total_price_changes"] == 1
    assert guarded["price_changes"] == "20"
    unguarded = run_merge(spark, state, batch)["1"]
    assert unguarded["price_value"] == 90.0
    assert unguarded["total_price_changes"] == 2
    assert unguarded["price_changes"] == "20, -30"


def test_guard_keeps_w4_rows_without_updated_date(spark):
    """Rows without updated_date cannot be ordered: the guard leaves
    their W4 semantics alone (fields merge, zero CDC)."""
    state = [state_row("1", price_value=100.0, is_unpublished=False,
                       last_active=ts("2026-01-05T10:00:00"))]
    batch = [batch_row("1", 1, price_value=95.0, updated_date=None)]
    guarded = run_merge(spark, state, batch, guard_out_of_order=True)["1"]
    assert guarded["price_value"] == 95.0
    assert guarded["total_price_changes"] is None
    assert guarded["last_active"] == ts("2026-01-05T10:00:00")


def test_untouched_state_rows_pass_through(spark):
    state = [state_row("7", price_value=77.0, price_changes="1, 2",
                       total_price_changes=2)]
    r = run_merge(spark, state, [])["7"]
    assert r["price_value"] == 77.0
    assert r["price_changes"] == "1, 2"
    assert r["total_price_changes"] == 2


# ---------------------------------------------------------------------------
# Differential test against the reference implementation (if present).
# ---------------------------------------------------------------------------

def _reference_merge():
    import importlib.util
    import os

    path = "/root/reference/data_process/merge.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_merge", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.merge_listings


@pytest.mark.parametrize("case_seed", range(6))
def test_differential_vs_reference(spark, case_seed):
    """Randomized batches through both engines must agree on final state."""
    import random

    ref_merge = _reference_merge()
    rng = random.Random(1000 + case_seed)

    keys = [str(i) for i in range(1, 6)]
    state_rows, batch_rows = [], []
    for k in keys[:3]:
        state_rows.append(
            state_row(
                k,
                offer_url=f"https://x/rent/flat/{k}",
                price_value=float(rng.randrange(50, 150)),
                is_unpublished=rng.choice([False, None]),
                description=f"desc{k}",
                timestamp=f"ts{k}",
            )
        )
    seq = 0
    for _ in range(12):
        seq += 1
        k = rng.choice(keys)
        batch_rows.append(
            batch_row(
                k,
                seq,
                price_value=rng.choice([None, float(rng.randrange(50, 150))]),
                is_unpublished=rng.choice([None, True, False]),
                description=rng.choice([None, f"d{seq}"]),
                updated_date=rng.choice(
                    [None, ts(f"2026-01-{seq:02d}T10:00:00")]
                ),
            )
        )

    # --- reference engine (list-of-dicts; drop None keys like real input) ---
    def to_ref_dict(r, with_upd):
        d = {}
        for f, v in r.items():
            if f == "seq" or v is None:
                continue
            if f == "updated_date" and not with_upd:
                continue
            if isinstance(v, dt.datetime):
                v = v.strftime("%Y-%m-%d %H:%M:%S")
            d[f] = v
        return d

    ref_target = [to_ref_dict(r, True) for r in state_rows]
    ref_source = [to_ref_dict(r, True) for r in batch_rows]
    ref_out = {d["offer_id"]: d for d in ref_merge(ref_target, ref_source)}

    # --- spark engine ---
    spark_out = run_merge(spark, state_rows, batch_rows)

    assert set(ref_out) == set(spark_out)
    check_fields = [
        "price_value", "is_unpublished", "description", "timestamp",
        "publication_date", "last_active", "unpublished_date",
        "price_change_value", "price_change_date", "total_price_changes",
        "price_changes", "price_changes_dates",
    ]
    for k in ref_out:
        for f in check_fields:
            rv = ref_out[k].get(f)
            sv = spark_out[k].get(f)
            if isinstance(sv, dt.datetime):
                sv = sv.strftime("%Y-%m-%d %H:%M:%S")
            if isinstance(rv, float) and isinstance(sv, float):
                assert math.isclose(rv, sv), (k, f, rv, sv)
            else:
                assert rv == sv or (rv is None and sv is None), (
                    k, f, rv, sv, ref_out[k], spark_out[k],
                )


def test_colliding_updated_date_deterministic_last_wins(spark):
    """J12 hardening: two batch rows sharing key + updated_date must
    resolve the same way on every run/partitioning (content-hash
    tiebreak), not by shuffle arrival order."""
    state = [state_row("1", price_value=100.0, is_unpublished=False)]
    when = ts("2026-01-02T10:00:00")
    a = batch_row("1", 1, price_value=111.0, description="A", updated_date=when)
    b = batch_row("1", 2, price_value=222.0, description="B", updated_date=when)

    def run(batch_rows, parts):
        target = spark.createDataFrame(
            [tuple(r[f.name] for f in STATE_SCHEMA.fields) for r in state],
            STATE_SCHEMA,
        )
        source = spark.createDataFrame(
            [tuple(r[f.name] for f in BATCH_SCHEMA.fields) for r in batch_rows],
            BATCH_SCHEMA,
        ).repartition(parts)
        # default order_cols=[updated_date] — the collision under test
        out = merge_listings(target, source.drop("seq"))
        return {r["offer_id"]: r.asDict() for r in out.collect()}

    results = [run([a, b], 1), run([b, a], 1), run([a, b], 7), run([b, a], 7)]
    winner = results[0]["1"]["price_value"]
    assert winner in (111.0, 222.0)
    for r in results[1:]:
        assert r["1"]["price_value"] == winner
        assert r["1"]["description"] == results[0]["1"]["description"]
