"""Focused differentials for the two kernels round 13 rewrote for
speed: the literal strainer scan (str.find sweeps replacing one re
alternation) and the stateful price-change detector (vectorized shift
fold replacing iterrows). Each is pinned against an independent
reference implementation of the OLD semantics — pure Python, no
SparkSession."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from rental_data_pipeline_spark.operators.extract import (
    _CARD_STRAINER,
    _LISTING_STRAINER,
    _LiteralStrainer,
)
from rental_data_pipeline_spark.streaming import stateful as ST


# ---------------------------------------------------------------------------
# _LiteralStrainer.scan == the former re-alternation, position for position
# ---------------------------------------------------------------------------


def _re_positions(pairs, html):
    pat = re.compile("|".join(re.escape(f'{a}="{v}"') for a, v in pairs))
    return [(m.start(), m.end()) for m in pat.finditer(html)]


STRAINER_PAIRS = [
    ("data-name", "Description"),
    ("data-name", "Desc"),  # proper prefix of another literal
    ("class", "error-code"),
    ("data-mark", "MainPrice"),
]


@pytest.mark.parametrize(
    "html",
    [
        "",
        "no matches at all",
        '<div data-name="Description">x</div>',
        # adjacent and repeated hits
        '<a data-name="Desc"></a><b data-name="Description"></b>' * 3,
        # literal inside TEXT (the scan is position-level; _strain's
        # walk-back handles tag recovery — positions must still agree)
        'text data-name="Description" more <p class="error-code">e</p>',
        # prefix literal first in the pattern list but longer hit in doc
        '<i data-name="DescriptionX"></i><i data-name="Desc"></i>',
        # quotes and angle brackets around hits
        '<div title="a>b" data-mark="MainPrice">1</div>',
    ],
)
def test_literal_strainer_matches_re_alternation(html):
    s = _LiteralStrainer(STRAINER_PAIRS)
    assert s.scan(html) == _re_positions(STRAINER_PAIRS, html)


def test_literal_strainer_matches_re_on_fixture_shaped_markup():
    # a page-shaped document mixing filler, every production literal,
    # and near-miss attributes
    filler = '<div class="layout-row" data-track="imp"><span>x</span></div>'
    body = filler * 50 + (
        '<div data-mark="OfferTitle">t</div>'
        '<div data-testid="price-amount">1</div>'
        '<div data-name="Geo"><span itemprop="name" content="a"/></div>'
        '<div data-name="OfferFactItem"><span>l</span><span>v</span></div>'
    ) + filler * 50
    listing_pairs = [
        ("class", "error-code"),
        ("data-testid", "valuation_offerPrice"),
        ("data-testid", "price-amount"),
        ("data-mark", "MainPrice"),
        ("data-mark", "OfferSubtitle"),
        ("data-mark", "OfferTitle"),
        ("data-testid", "metadata-updated-date"),
        ("data-name", "Description"),
        ("data-name", "OfferStats"),
        ("data-name", "Geo"),
        ("data-name", "OfferUnpublished"),
        ("data-name", "OfferFactItem"),
        ("data-name", "ObjectFactoidsItem"),
        ("data-name", "FeaturesItem"),
    ]
    s = _LiteralStrainer(listing_pairs)
    assert s.scan(body) == _re_positions(listing_pairs, body)
    # and the production strainers expose the same literal set shape
    assert isinstance(_LISTING_STRAINER, _LiteralStrainer)
    assert isinstance(_CARD_STRAINER, _LiteralStrainer)


# ---------------------------------------------------------------------------
# vectorized _detect == the former iterrows fold, row for row
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self, value=None):
        self.exists = value is not None
        self._v = value
        self.updated = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True
        self.updated = v


def _detect_reference(key, pdfs, state):
    """The pre-round-13 iterrows fold, verbatim semantics."""
    last = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(
            ["updated_date", "event_id"], na_position="first"
        )
        for _, row in pdf.iterrows():
            price = row["price_value"]
            if pd.isna(price):
                continue
            price = float(price)
            upd = row["updated_date"]
            if last is not None and price != last and not pd.isna(upd):
                out.append(
                    (int(key[0]), upd, last, price, int(price) - int(last))
                )
            last = price
    if last is not None:
        state.update((last,))
    return out


def _rand_chunk(rng, n):
    secs = rng.choice([1_700_000_000, 1_700_001_000, 1_700_002_000, -1], n)
    ts = pd.Series(pd.to_datetime(secs, unit="s"))
    ts[secs == -1] = pd.NaT
    return pd.DataFrame(
        {
            "offer_id": np.full(n, 7, dtype="int64"),
            "updated_date": ts,
            "price_value": rng.choice(
                [100.0, 110.5, 120.0, np.nan], n
            ),
            "event_id": rng.permutation(n).astype("int64"),
        }
    )


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_detect_matches_iterrows_reference(seed):
    rng = np.random.RandomState(seed)
    # 1-3 chunks through the iterator, carried state on odd seeds
    chunks = [_rand_chunk(rng, int(rng.randint(0, 40))) for _ in range(rng.randint(1, 4))]
    init = (105.0,) if seed % 2 else None

    ref_state = _FakeState(init)
    ref_rows = _detect_reference((7,), iter([c.copy() for c in chunks]), ref_state)

    new_state = _FakeState(init)
    new_out = list(ST._detect((7,), iter([c.copy() for c in chunks]), new_state))
    new_rows = (
        [tuple(r) for r in pd.concat(new_out, ignore_index=True).itertuples(index=False)]
        if new_out
        else []
    )

    assert new_rows == [
        (k, pd.Timestamp(ts), old, new, diff) for k, ts, old, new, diff in ref_rows
    ]
    assert new_state._v == ref_state._v
    assert new_state.exists == ref_state.exists


def test_vectorized_detect_nan_price_and_nat_date_edges():
    # one chunk exercising every branch: NaN price skipped entirely,
    # NaT date updates last without emitting, equal price emits nothing
    pdf = pd.DataFrame(
        {
            "offer_id": np.full(6, 1, dtype="int64"),
            "updated_date": pd.to_datetime(
                ["2024-01-01", "2024-01-02", None, "2024-01-04",
                 "2024-01-05", "2024-01-06"]
            ),
            "price_value": [100.0, np.nan, 200.0, 200.0, 150.0, 150.0],
            "event_id": np.arange(6, dtype="int64"),
        }
    )
    st = _FakeState()
    out = list(ST._detect((1,), iter([pdf]), st))
    rows = pd.concat(out, ignore_index=True)
    # sort is NaT-FIRST: 200@NaT seeds last WITHOUT emitting (W4);
    # then 100@01-01 emits 200->100; NaN price (01-02) skipped
    # entirely; 200@01-04 emits 100->200; 150@01-05 emits 200->150;
    # equal 150@01-06 emits nothing
    assert [
        (r["old_price"], r["new_price"], r["price_diff"])
        for _, r in rows.iterrows()
    ] == [(200.0, 100.0, -100), (100.0, 200.0, 100), (200.0, 150.0, -50)]
    assert st._v == (150.0,)
