"""Property tests for the pure-stdlib BMP codec and the salted
hot-shingle fallback.

The codec round-trip runs WITHOUT Spark (pure functions), so hypothesis
can afford many examples; the fallback equivalence drives the real
operator over randomized corpora under a forced-fallback monkeypatch.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rental_data_pipeline_spark.operators.multimodal import (
    _bmp_stride,
    _resize_bmp,
    decode_bmp,
    encode_bmp,
)

geometry = st.tuples(
    st.integers(min_value=1, max_value=40),   # width: exercises all 4 pad widths
    st.integers(min_value=1, max_value=24),   # height
    st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    ),
)


@given(geometry)
@settings(max_examples=200, deadline=None)
def test_bmp_roundtrip_exact(geom):
    w, h, rgb = geom
    payload = encode_bmp(w, h, rgb)
    # file size field agrees with the byte string
    (size,) = struct.unpack_from("<I", payload, 2)
    assert size == len(payload) == 54 + h * _bmp_stride(w)
    d = decode_bmp(payload)
    assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == tuple(map(float, rgb))


@given(geometry, st.integers(1, 12), st.integers(1, 12))
@settings(max_examples=100, deadline=None)
def test_bmp_resize_preserves_uniform_fill(geom, w2, h2):
    w, h, rgb = geom
    resized = _resize_bmp(encode_bmp(w, h, rgb), w2, h2)
    d = decode_bmp(resized)
    assert (d["width"], d["height"]) == (w2, h2)
    # nearest-neighbor over a uniform image is the same uniform image
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == tuple(map(float, rgb))


@given(st.binary(max_size=80))
@settings(max_examples=200, deadline=None)
def test_bmp_decode_never_raises_on_junk(blob):
    """Arbitrary bytes (including 'BM'-prefixed truncations) decode to
    None, never an exception — one bad row must not kill a stage."""
    assert decode_bmp(blob) is None or isinstance(decode_bmp(blob), dict)
    r = _resize_bmp(blob, 4, 4)
    assert r is None or decode_bmp(r)["width"] == 4


@given(st.binary(min_size=0, max_size=120))
@settings(max_examples=100, deadline=None)
def test_bmp_decode_never_raises_on_bm_prefixed_junk(blob):
    assert decode_bmp(b"BM" + blob) is None or isinstance(
        decode_bmp(b"BM" + blob), dict
    )


@pytest.mark.parametrize("n_parts", [1, 7])
def test_fallback_tiers_equal_broadcast_path(spark, monkeypatch, n_parts):
    """Every forced-fallback tier (warm shuffle anti-join, ultra
    broadcast stratification, last-resort salted join) outputs EXACTLY
    the broadcast path's rows on a randomized corpus, across
    partitionings."""
    import random

    from rental_data_pipeline_spark.operators import dedup

    rng = random.Random(12)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        n_parts
    )
    sizes, exploded = dedup._shingle_pairs(df, "text", "doc_id", k=2)
    want = sorted(
        (r.doc, r.shingle)
        for r in dedup._cap_hot_shingles(exploded, max_doc_freq=6).collect()
    )
    assert want
    # (cap, ultra_df) combos steering every fallback tier: warm-only,
    # ultra+warm mixes, and the last-resort salted join — all must
    # equal the broadcast path exactly
    combos = [
        (0, dedup.HOT_SHINGLE_ULTRA_DF),
        (1, 10),
        (2, 8),
        (0, 0),
    ]
    for cap, ultra_df in combos:
        monkeypatch.setattr(dedup, "HOT_SHINGLE_BROADCAST_CAP", cap)
        monkeypatch.setattr(dedup, "HOT_SHINGLE_ULTRA_DF", ultra_df)
        got = sorted(
            (r.doc, r.shingle)
            for r in dedup._cap_hot_shingles(
                exploded, max_doc_freq=6
            ).collect()
        )
        assert got == want, f"cap={cap} ultra_df={ultra_df}"
        # output column order is the input's (internals never leak)
        out = dedup._cap_hot_shingles(exploded, max_doc_freq=6)
        assert out.columns == exploded.columns
