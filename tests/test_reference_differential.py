"""Differential tests against the REFERENCE's own pure-Python
data-process functions, loaded read-only from /root/reference (same
approach as test_merge_property): the Spark twins must reproduce the
reference's outputs on identical inputs. bs4-dependent modules
(html_parser) can't load in this container; flatten/normalize are
stdlib+pandas and run as-is."""

from __future__ import annotations

import datetime as dt
import importlib.util
import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/data_process"


def _load(path: str, name: str):
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_flatten():
    return _load(f"{REF}/flatten.py", "ref_flatten_diff")


@pytest.fixture(scope="module")
def ref_normalize():
    return _load(f"{REF}/normalize.py", "ref_normalize_diff")


def test_field_mappings_match_reference(ref_flatten):
    from rental_data_pipeline_spark.schema import FIELD_MAPPINGS

    assert dict(FIELD_MAPPINGS) == ref_flatten.get_field_mappings()


def test_flatten_differential(spark, ref_flatten):
    from rental_data_pipeline_spark.operators.flatten import flatten_listings

    # RU keys, an alias collision (Комиссии + Комиссия), an unknown
    # passthrough key, and per-row missing values
    rows = [
        {"Залог": "5000", "Комиссии": "50%", "Комиссия": "40%", "unknown_key": "x"},
        {"Залог": None, "Комиссия": "30%", "unknown_key": "y"},
        {"Общая площадь": "42 м²", "Этаж": "3/9"},
    ]
    cols = ["Залог", "Комиссии", "Комиссия", "unknown_key", "Общая площадь", "Этаж"]
    df = spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows],
        ", ".join(f"`{c}` string" for c in cols),
    )
    got = [r.asDict() for r in flatten_listings(df).collect()]
    # column-world null == dict-world absent: reference dicts drop None
    # keys (a dict key present-with-None would clobber in the reference's
    # last-wins comprehension, a shape columnar data cannot express)
    want = ref_flatten.flatten_listings(
        [{k: v for k, v in r.items() if v is not None} for r in rows]
    )
    for g, w in zip(got, want):
        for k, v in w.items():
            assert g[k] == v, (k, g, w)
        for k, v in g.items():
            if v is not None:
                assert w.get(k) == v, (k, g, w)


def test_parse_numeric_differential(spark, ref_normalize):
    from rental_data_pipeline_spark.functions.numeric import parse_numeric_value

    labels = [
        "1 200,50", "42", " -3.5 ", "12px", "3,0", "от 35 000 ₽",
        "", "abc", None, "7,5 м²", "  60  ", "-0", "1.2.3", ",5",
        " 12 345 ", "цена 99",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(labels)], "i long, s string")
    got = {
        r.i: r.v
        for r in df.select("i", parse_numeric_value("s").alias("v")).collect()
    }
    for i, s in enumerate(labels):
        want = ref_normalize.parse_numeric_value(s)
        if want is None:
            assert got[i] is None, (s, got[i])
        else:
            assert got[i] == pytest.approx(float(want)), (s, got[i], want)


class _FixedDatetime(dt.datetime):
    _NOW = dt.datetime(2026, 8, 14, 12, 0, 0)

    @classmethod
    def now(cls, tz=None):
        return cls._NOW


def test_parse_russian_date_differential(spark, ref_normalize):
    """The reference reads the wall clock; pin it via the module's own
    ``datetime`` global (in-memory only — /root/reference is untouched)
    and inject the same instant into the Spark twin."""
    from rental_data_pipeline_spark.functions.dates import parse_russian_date_label

    ref_normalize.datetime = _FixedDatetime
    now = _FixedDatetime._NOW

    labels = [
        "5 мар 10:30",          # this year, past
        "20 дек 10:30",         # future month → previous year
        "14 авг 11:59",         # today's date via explicit form
        "сегодня, 12:45",       # relative: today
        "вчера, 09:15",         # relative: yesterday
        "только что",           # no time component → passthrough
        "15 х 10:30",           # unknown month → passthrough
        "31 фев 10:30",         # impossible date → reference NaT
        "2024-05-12 14:30:00",  # ISO-ish → no RU date match → passthrough
        None,
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(labels)], "i long, s string")
    got = {
        r.i: r.v
        for r in df.select(
            "i", parse_russian_date_label("s", now=now).alias("v")
        ).collect()
    }
    import pandas as pd

    for i, s in enumerate(labels):
        want = ref_normalize.parse_russian_date(s)
        if want is None or want is pd.NaT:
            assert got[i] is None, (s, got[i], want)
        else:
            assert got[i] == want, (s, got[i], want)


def test_search_url_params_match_reference():
    """S6 structural parity: the predicate-bearing query params our
    compiler emits must match the reference's construct_search_url for
    the same config (modulo percent-encoding of brackets and each
    side's fixed preamble — the base host is synthetic by design)."""
    import urllib.parse

    os.environ.setdefault("BASE_URL", "https://example.test")
    ref = _load(
        "/root/reference/search_configs/construct_url.py", "ref_construct_url"
    )
    from rental_data_pipeline_spark.jobs.pipeline import (
        SearchConfig,
        construct_search_url,
    )

    cfg = SearchConfig(
        maxprice=80000, districts=[21, 22, 151], metros=[4, 8], rooms=[1, 2, 4]
    )
    ours = construct_search_url(cfg)
    theirs = ref.construct_search_url(
        {
            "maxprice": 80000,
            "district": [21, 22, 151],
            "metro": [4, 8],
            "rooms": [1, 2, 4],
        }
    )

    def predicate_params(url: str) -> set[tuple[str, str]]:
        q = urllib.parse.urlparse(url).query
        pairs = urllib.parse.parse_qsl(urllib.parse.unquote(q))
        keep = ("maxprice", "district[", "metro[", "room")
        return {
            (k, v)
            for k, v in pairs
            if any(k.startswith(p) for p in keep) and k != "deal_type"
        }

    assert predicate_params(ours) == predicate_params(theirs)

    # repeated-param indexing must be positional on BOTH sides
    assert "district[0]=21" in urllib.parse.unquote(ours)
    assert "district[2]=151" in urllib.parse.unquote(theirs)
