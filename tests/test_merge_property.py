"""Property-based differential test: Hypothesis-generated batches
through the Spark CDC merge vs the reference's pure-Python
``merge_listings`` (loaded read-only from /root/reference). Extends
the seeded differential cases in test_merge.py with shrinking and
broader shapes: keyless url-fallback rows, duplicate in-batch keys,
missing updated_date, price/unpublish interleavings."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_merge import batch_row, run_merge, state_row, ts

CHECK_FIELDS = [
    "price_value", "is_unpublished", "description", "timestamp",
    "publication_date", "last_active", "unpublished_date",
    "price_change_value", "price_change_date", "total_price_changes",
    "price_changes", "price_changes_dates",
]

KEYS = ["1", "2", "3"]


def _load_reference_merge():
    import importlib.util
    import os

    path = "/root/reference/data_process/merge.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_merge_prop", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.merge_listings


_price = st.one_of(st.none(), st.sampled_from([50.0, 100.0, 120.0, 120.0]))
_unpub = st.one_of(st.none(), st.booleans())
_desc = st.one_of(st.none(), st.sampled_from(["a", "b"]))

_state_entry = st.fixed_dictionaries(
    {
        "key": st.sampled_from(KEYS),
        "price_value": _price,
        "is_unpublished": st.one_of(st.none(), st.just(False)),
        "description": _desc,
    }
)

_batch_entry = st.fixed_dictionaries(
    {
        # None key => url-fallback path (J5)
        "key": st.one_of(st.none(), st.sampled_from(KEYS)),
        "price_value": _price,
        "is_unpublished": _unpub,
        "description": _desc,
        "has_date": st.booleans(),
        "day": st.integers(min_value=1, max_value=9),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    state_entries=st.lists(_state_entry, max_size=3, unique_by=lambda e: e["key"]),
    batch_entries=st.lists(_batch_entry, min_size=1, max_size=8),
)
def test_merge_matches_reference(spark, state_entries, batch_entries):
    ref_merge = _load_reference_merge()

    state_rows = [
        state_row(
            e["key"],
            offer_url=f"https://x/rent/flat/{e['key']}",
            price_value=e["price_value"],
            is_unpublished=e["is_unpublished"],
            description=e["description"],
            timestamp=f"ts{e['key']}",
        )
        for e in state_entries
    ]
    state_urls = {e["key"] for e in state_entries}
    batch_rows = []
    for i, e in enumerate(batch_entries, start=1):
        url = (
            f"https://x/rent/flat/{e['day'] % 3 + 1}" if e["key"] is None else None
        )
        batch_rows.append(
            batch_row(
                e["key"],
                i,
                offer_url=url,
                price_value=e["price_value"],
                is_unpublished=e["is_unpublished"],
                description=e["description"],
                updated_date=ts(f"2026-01-0{e['day']}T10:00:00")
                if e["has_date"]
                else None,
            )
        )

    def to_ref_dict(r):
        d = {}
        for f, v in r.items():
            if f == "seq" or v is None:
                continue
            if isinstance(v, dt.datetime):
                v = v.strftime("%Y-%m-%d %H:%M:%S")
            d[f] = v
        return d

    ref_out = {
        d["offer_id"]: d
        for d in ref_merge(
            [to_ref_dict(r) for r in state_rows],
            [to_ref_dict(r) for r in batch_rows],
        )
        if d.get("offer_id")
    }
    spark_out = run_merge(spark, state_rows, batch_rows)

    assert set(ref_out) == set(spark_out)
    for k in ref_out:
        for f in CHECK_FIELDS:
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
