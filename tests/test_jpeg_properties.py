"""Hypothesis property layer for the baseline JPEG codec — the newest
from-scratch code in the repo, where silently-wrong pixels would
corrupt every downstream fingerprint (the dedup family hashes the
DECODED samples). Randomized dimensions, content, quantizers, and
restart intervals; pure-Python per example (no Spark job), so example
counts can be higher than the Spark-backed property suites.

Error bounds are empirical-with-margin: 60 random gray images across
1..64-px dimensions peak at |err| = 2 (fixed-point FDCT→IDCT rounding
with the all-ones quantizer), 40 random color images at |err| = 5
(adds YCbCr round trips); the assertions pin 3 and 6 so a real defect
(wrong coefficient, transposed block, mis-predicted DC) fails loudly
— such bugs produce errors in the tens — while legitimate rounding
never flakes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_join_scaling_spark.operators import jpeg_codec as jc
from flink_join_scaling_spark.operators import multimodal as mm

SET = settings(max_examples=20, deadline=None)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@given(
    w=st.integers(1, 64),
    h=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
@SET
def test_gray_roundtrip_bounded_and_deterministic(w, h, seed):
    img = np.random.RandomState(seed).randint(0, 256, size=(h, w))
    payload = jc.jpeg_encode_gray(img, w, h)
    assert payload == jc.jpeg_encode_gray(img, w, h)  # bit-determinism
    ww, hh, c, px = jc.jpeg_pixels(payload)
    assert (ww, hh, c) == (w, h, 1)
    assert int(np.abs(px.reshape(h, w) - img).max()) <= 3


@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
)
@SET
def test_color_444_roundtrip_bounded(w, h, seed):
    rgb = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3))
    ww, hh, c, px = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, w, h))
    assert (ww, hh, c) == (w, h, 3)
    assert int(np.abs(px.reshape(h, w, 3) - rgb).max()) <= 6


@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    r=st.integers(0, 256),
    g=st.integers(0, 256),
    b=st.integers(0, 256),
)
@SET
def test_color_420_equals_444_on_constant_any_dims(w, h, r, g, b):
    """On chroma-constant input, 4:2:0 box-mean subsampling +
    replication upsampling must add ZERO error over the 4:4:4 route
    at every width/height parity — the padded-edge and partial-MCU
    paths must not smear. (The small residual vs the SOURCE pixels is
    the YCbCr integer-rounding floor, shared by both routes: e.g.
    rgb=(0,0,1) shifts blue by 1 before any sampling choice — found
    by hypothesis, bounded separately.)"""
    rgb = np.zeros((h, w, 3), dtype=np.int64)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = r % 256, g % 256, b % 256
    ww, hh, c, p420 = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, w, h, subsample=True))
    _, _, _, p444 = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, w, h))
    assert (ww, hh, c) == (w, h, 3)
    assert np.array_equal(p420, p444)
    assert int(np.abs(p420.reshape(h, w, 3) - rgb).max()) <= 2


@given(seed=st.integers(0, 2**31 - 1), interval=st.integers(1, 9))
@SET
def test_restart_interval_invariance(seed, interval):
    """RSTn emission is a framing choice: any restart interval must
    decode to the SAME pixels as the unrestarted stream (the decoder
    resets DC predictors and bit alignment at each marker)."""
    img = np.random.RandomState(seed).randint(0, 256, size=(24, 40))
    _, _, _, plain = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 40, 24))
    _, _, _, rst = jc.jpeg_pixels(
        jc.jpeg_encode_gray(img, 40, 24, restart_interval=interval)
    )
    assert np.array_equal(plain, rst)


@given(seed=st.integers(0, 2**31 - 1), q=st.integers(1, 32))
@SET
def test_any_uniform_quantizer_decodes(seed, q):
    """Every uniform quantizer in [1, 32] must produce a decodable
    stream whose error scales with q, never a crash or a garbage
    frame (coefficients near zero exercise the EOB/run-length paths
    hardest at coarse q)."""
    img = np.random.RandomState(seed).randint(0, 256, size=(16, 24))
    payload = jc.jpeg_encode_gray(img, 24, 16, qtable=np.full((8, 8), q))
    ww, hh, c, px = jc.jpeg_pixels(payload)
    assert (ww, hh, c) == (24, 16, 1)
    assert float(np.abs(px.reshape(16, 24) - img).mean()) <= q + 2


@given(seed=st.integers(0, 2**31 - 1))
@SET
def test_cross_codec_dhash_equal_on_block_images(seed):
    """The property q_dedup_phash_mixed's oracle rests on, generalized
    from the single fixed grid: ANY constant-8×8-block image hashes
    identically through the PNG and JPEG codecs (DC-only blocks
    round-trip exactly in both)."""
    levels = np.random.RandomState(seed).randint(0, 256, size=(8, 9))
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    h_j = mm.dhash64(jc.jpeg_encode_ycbcr(np.stack([img] * 3, axis=2), 72, 64))
    h_g = mm.dhash64(jc.jpeg_encode_gray(img, 72, 64))
    h_p = mm.dhash64(mm._png_encode(img, 72, 64, 1))
    assert h_g == h_p
    # color route adds YCbCr rounding on gray content; stays in-band
    assert _ham(h_j, h_p) <= 3


# ------------------------------------------------- progressive (r13)
#
# The strongest available oracle without libjpeg: progressive and
# baseline are two entropy codings of the SAME quantized
# coefficients, so decoded pixels must be bit-identical — any
# refinement/EOB-run/band bug shows up as a pixel diff. Randomized
# scripts explore the progression space the fixed default script
# can't.


@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
    q=st.integers(1, 32),
)
@SET
def test_progressive_gray_equals_baseline(w, h, seed, q):
    img = np.random.RandomState(seed).randint(0, 256, size=(h, w))
    qt = np.full((8, 8), q)
    base = jc.jpeg_pixels(jc.jpeg_encode_gray(img, w, h, qtable=qt))
    prog = jc.jpeg_pixels(
        jc.jpeg_encode_progressive_gray(img, w, h, qtable=qt)
    )
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])


@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
)
@SET
def test_progressive_color_equals_baseline(w, h, seed, sub):
    rgb = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3))
    base = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, w, h, subsample=sub))
    prog = jc.jpeg_pixels(
        jc.jpeg_encode_progressive_ycbcr(rgb, w, h, subsample=sub)
    )
    assert np.array_equal(base[3], prog[3])


@given(
    seed=st.integers(0, 2**31 - 1),
    cuts=st.sets(st.integers(2, 63), max_size=6),
    al_dc=st.integers(0, 3),
    al_ac=st.integers(0, 3),
    interval=st.integers(0, 9),
)
@SET
def test_progressive_random_scan_scripts(seed, cuts, al_dc, al_ac, interval):
    """Random legal progression: random spectral-band partition of
    1..63, random successive-approximation depths for DC and AC
    (refined level-by-level to 0), random restart interval — all must
    decode to the baseline pixels."""
    img = np.random.RandomState(seed).randint(0, 256, size=(24, 24))
    bounds = sorted(cuts) + [64]
    scans = [([0], 0, 0, 0, al_dc)]
    lo = 1
    bands = []
    for b in bounds:
        if b > lo:
            bands.append((lo, b - 1))
            lo = b
    for s, e in bands:
        scans.append(([0], s, e, 0, al_ac))
    for lvl in range(al_ac, 0, -1):
        scans.append(([0], 1, 63, lvl, lvl - 1))
    for lvl in range(al_dc, 0, -1):
        scans.append(([0], 0, 0, lvl, lvl - 1))
    base = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 24, 24))[3]
    prog = jc.jpeg_pixels(
        jc.jpeg_encode_progressive_gray(
            img, 24, 24, scans=scans, restart_interval=interval
        )
    )[3]
    assert np.array_equal(base, prog)


@given(
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
    cuts=st.sets(st.integers(2, 63), max_size=3),
    al_ac=st.integers(0, 2),
    dc_first=st.booleans(),
    y_first=st.booleans(),
)
@SET
def test_progressive_random_color_scan_scripts(
    seed, sub, cuts, al_ac, dc_first, y_first
):
    """Random legal COLOR progressions: interleaved 3-component DC
    (with or without successive approximation), per-component AC
    band partitions in either component order, refinements
    level-by-level — all must decode to the baseline pixels, with and
    without 4:2:0 (where non-interleaved chroma grids diverge from
    the padded MCU grid)."""
    rgb = np.random.RandomState(seed).randint(0, 256, size=(21, 19, 3))
    bounds = sorted(cuts) + [64]
    bands = []
    lo = 1
    for b in bounds:
        if b > lo:
            bands.append((lo, b - 1))
            lo = b
    al_dc = 1 if dc_first else 0
    scans = [([0, 1, 2], 0, 0, 0, al_dc)]
    comps = [0, 1, 2] if y_first else [2, 1, 0]
    for ci in comps:
        for s, e in bands:
            scans.append(([ci], s, e, 0, al_ac))
    for lvl in range(al_ac, 0, -1):
        for ci in comps:
            scans.append(([ci], 1, 63, lvl, lvl - 1))
    if al_dc:
        scans.append(([0, 1, 2], 0, 0, 1, 0))
    base = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, 19, 21, subsample=sub))[3]
    prog = jc.jpeg_pixels(
        jc.jpeg_encode_progressive_ycbcr(rgb, 19, 21, subsample=sub,
                                         scans=scans)
    )[3]
    assert np.array_equal(base, prog)
