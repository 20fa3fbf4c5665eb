"""Hypothesis property layer for the PNG and WAV codecs — the JPEG
layer's discipline (tests/test_jpeg_properties.py) applied to the two
older decoders. PNG is LOSSLESS, so its invariant is sharper than the
JPEG error bounds: decode(encode(img)) must be bit-exact for every
image, and the decoder must invert every per-scanline filter type the
format defines. Pure-Python per example (no Spark job)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_join_scaling_spark.operators import multimodal as mm
from tests.test_multimodal import _png_bytes, _wav_bytes

SET = settings(max_examples=20, deadline=None)


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@SET
def test_png_roundtrip_bitexact(w, h, channels, seed):
    img = np.random.RandomState(seed).randint(0, 256, size=(h, w * channels))
    payload = mm._png_encode(img, w, h, channels)
    assert payload == mm._png_encode(img, w, h, channels)  # determinism
    ww, hh, cc, px = mm._png_pixels(payload)
    assert (ww, hh, cc) == (w, h, channels)
    assert np.array_equal(px.reshape(h, w * channels), img)


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
    filters=st.lists(st.integers(0, 4), min_size=24, max_size=24),
)
@SET
def test_png_decoder_inverts_every_filter_type(w, h, channels, seed, filters):
    """The hand-assembled encoder applies an arbitrary per-scanline
    filter sequence (None/Sub/Up/Average/Paeth); the decoder must
    reconstruct the source exactly whatever the mix — the filter
    reconstruction is where a PNG decoder goes silently wrong."""
    rng = np.random.RandomState(seed)
    pixels = [
        [
            int(rng.randint(0, 256))
            if channels == 1
            else [int(v) for v in rng.randint(0, 256, 3)]
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    payload = _png_bytes(pixels, channels, filters=filters[:h])
    ww, hh, cc, px = mm._png_pixels(payload)
    assert (ww, hh, cc) == (w, h, channels)
    flat = np.array(
        [
            c
            for row in pixels
            for p in row
            for c in (p if isinstance(p, list) else [p])
        ],
        dtype=np.int64,
    )
    assert np.array_equal(px.reshape(-1), flat)


@given(
    n=st.integers(1, 200),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@SET
def test_wav_u8_roundtrip_exact(n, rate, seed):
    samples = np.random.RandomState(seed).randint(0, 256, size=n)
    payload = mm._wav_encode_u8(samples, rate)
    got_rate, mono, bits = mm._wav_samples(payload)
    assert (got_rate, bits) == (rate, 8)
    assert np.array_equal(mono, samples.astype(np.float64) - 128.0)


@given(
    n=st.integers(4, 400),
    factor=st.integers(1, 8),
    bits=st.sampled_from([8, 16]),
    channels=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
@SET
def test_resample_matches_numpy_boxcar(n, factor, bits, channels, seed):
    """resample_wav == an independent NumPy restatement of its
    contract (mixdown → requantize to bias-128 → non-overlapping
    boxcar mean → half-up round), for every factor / bit depth /
    channel count — including factor=1 (pure requantization) and the
    trailing-partial-block drop."""
    import pytest

    rng = np.random.RandomState(seed)
    if bits == 16:
        raw = rng.randint(-32768, 32768, size=n * channels)
    else:
        raw = rng.randint(0, 256, size=n * channels)
    payload = _wav_bytes(list(raw), channels=channels, rate=8000, bits=bits)
    if factor > n:
        # fewer mono frames than the factor is not a downsample — the
        # operator refuses loudly rather than emitting an empty clip
        with pytest.raises(ValueError, match="downsample"):
            mm.resample_wav(payload, factor)
        return
    out = mm.resample_wav(payload, factor)
    got_rate, got, gbits = mm._wav_samples(out)
    assert (got_rate, gbits) == (8000 // factor, 8)

    # independent oracle
    s = raw.astype(np.float64)
    if bits == 16:
        mono = s.reshape(-1, channels).mean(axis=1) / 256.0 + 128.0
    else:
        mono = s.reshape(-1, channels).mean(axis=1)
    m = (len(mono) // factor) * factor
    if m == 0:
        assert len(got) == 0
        return
    blocks = mono[:m].reshape(-1, factor).mean(axis=1)
    expect = np.floor(blocks + 0.5)
    np.clip(expect, 0, 255, out=expect)
    assert np.array_equal(got + 128.0, expect)
