"""Baseline JPEG codec: value-level round trips on hand-built images,
loud refusal outside the decoded subset, and the Spark-side planted
dedup structure (the synth_png test discipline applied to the r12
codec)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_join_scaling_spark.operators import jpeg_codec as jc
from flink_join_scaling_spark.operators import multimodal as mm


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_gray_constant_blocks_roundtrip_exact():
    """Constant 8×8 blocks are DC-only; with an all-ones quantizer the
    decode must reproduce them EXACTLY — the property the planted
    fixture's oracle relies on."""
    rng = np.random.RandomState(7)
    levels = rng.randint(0, 256, size=(8, 9))
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    w, h, c, px = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 72, 64))
    assert (w, h, c) == (72, 64, 1)
    assert np.array_equal(px.reshape(64, 72), img)


def test_gray_random_roundtrip_within_dct_rounding():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(40, 56))
    w, h, c, px = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 56, 40))
    assert (w, h, c) == (56, 40, 1)
    assert np.abs(px.reshape(40, 56) - img).max() <= 2


def test_gray_non_multiple_of_8_dimensions_crop():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(13, 21))
    w, h, c, px = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 21, 13))
    assert (w, h, c) == (21, 13, 1)
    assert np.abs(px.reshape(13, 21) - img).max() <= 2


def test_color_444_roundtrip():
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, size=(24, 24, 3))
    w, h, c, px = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, 24, 24))
    assert (w, h, c) == (24, 24, 3)
    # color conversion adds rounding on top of the DCT pair
    assert np.abs(px.reshape(24, 24, 3) - rgb).max() <= 5


def test_color_420_subsampled_constant_exact():
    """4:2:0: chroma-constant input survives 2×2 subsampling +
    replication upsampling exactly; exercises the MCU interleave with
    2×2 luma sampling factors."""
    img = np.zeros((20, 28, 3), dtype=np.int64)
    img[:, :, 0] = 40
    img[:, :, 1] = 50
    img[:, :, 2] = 60
    w, h, c, px = jc.jpeg_pixels(
        jc.jpeg_encode_ycbcr(img, 28, 20, subsample=True)
    )
    assert (w, h, c) == (28, 20, 3)
    assert np.array_equal(px.reshape(20, 28, 3), img)


def test_color_420_smooth_gradient_within_subsample_error():
    y, x = np.mgrid[0:16, 0:16]
    rgb = np.stack([(x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256], axis=2)
    w, h, c, px = jc.jpeg_pixels(
        jc.jpeg_encode_ycbcr(rgb, 16, 16, subsample=True)
    )
    # 2×2 chroma box-mean + replication: bounded by neighbor deltas
    assert np.abs(px.reshape(16, 16, 3) - rgb).mean() < 6


def test_restart_markers_roundtrip_and_determinism():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(40, 56))
    p_rst = jc.jpeg_encode_gray(img, 56, 40, restart_interval=3)
    p_plain = jc.jpeg_encode_gray(img, 56, 40)
    assert b"\xff\xdd" in p_rst and b"\xff\xd0" in p_rst
    _, _, _, px = jc.jpeg_pixels(p_rst)
    _, _, _, px2 = jc.jpeg_pixels(p_plain)
    assert np.array_equal(px, px2)
    assert p_rst == jc.jpeg_encode_gray(img, 56, 40, restart_interval=3)


def test_coarse_quantization_decodes_and_compresses():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(32, 32))
    q16 = jc.jpeg_encode_gray(img, 32, 32, qtable=np.full((8, 8), 16))
    q1 = jc.jpeg_encode_gray(img, 32, 32)
    assert len(q16) < len(q1)  # coarser quantizer → smaller stream
    _, _, _, px = jc.jpeg_pixels(q16)
    assert np.abs(px.reshape(32, 32) - img).mean() < 16


def test_loud_refusal_outside_subset():
    img = np.full((8, 8), 100)
    payload = bytearray(jc.jpeg_encode_gray(img, 8, 8))
    i = payload.index(b"\xff\xc0")
    # lossless (SOF3) and arithmetic (SOF9) stay out of the subset
    for sof in (b"\xff\xc3", b"\xff\xc9"):
        bad = bytes(payload[:i]) + sof + bytes(payload[i + 2 :])
        with pytest.raises(ValueError, match="lossless/hierarchical/arith"):
            jc.jpeg_pixels(bad)
    # SOF2 is decoded since r13 — but a progressive frame carrying a
    # BASELINE full-band scan header is structurally invalid and must
    # refuse, not decode half a progression
    prog = bytes(payload[:i]) + b"\xff\xc2" + bytes(payload[i + 2 :])
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        jc.jpeg_pixels(prog)
    with pytest.raises(ValueError, match="SOI"):
        jc.jpeg_pixels(b"notajpeg")
    with pytest.raises(ValueError, match="truncated"):
        jc.jpeg_pixels(bytes(payload[:8]))
    # 4-component (CMYK-style) SOF is refused
    with pytest.raises(ValueError, match="component count"):
        sof = (
            b"\xff\xd8\xff\xc0\x00\x14\x08\x00\x08\x00\x08\x04"
            + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00\x04\x11\x00"
            + b"\xff\xd9"
        )
        jc.jpeg_pixels(sof)


def test_dhash64_magic_dispatch_png_vs_jpeg():
    """One fingerprint column over a MIXED corpus: the same image
    content hashed through both codecs must land within band distance
    (the codecs round the pixels slightly differently, but dHash is
    exactly the thing that's robust to that)."""
    rng = np.random.RandomState(21)
    levels = rng.randint(0, 256, size=(8, 9))
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    jp = jc.jpeg_encode_gray(img, 72, 64)
    pn = mm._png_encode(img.reshape(64, 72), 72, 64, 1)
    h_j, h_p = mm.dhash64(jp), mm.dhash64(pn)
    assert h_j == h_p  # constant blocks decode exactly in both codecs


def test_real_decode_media_jpeg_mean_byte():
    img = np.full((16, 16), 64)
    w, h, c, mean = mm._parse_jpeg(jc.jpeg_encode_gray(img, 16, 16))
    assert (w, h, c) == (16, 16, 1)
    assert mean == pytest.approx(64 / 255.0, abs=1e-4)


def test_synth_jpeg_planted_structure():
    hashes = {i: mm.dhash64(mm.synth_jpeg(i)) for i in range(24)}
    for even in range(0, 24, 2):
        assert _ham(hashes[even], hashes[even + 1]) <= 3
    for i in range(24):
        for j in range(i + 1, 24):
            if i % 2 == 0 and j == i + 1:
                continue
            assert _ham(hashes[i], hashes[j]) > 3, (i, j)


def test_q_dedup_phash_jpeg_spark_end_to_end(spark):
    """The registered query's planted pair set through Spark — real
    encode on the executors, real entropy decode, band join."""
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    from flink_join_scaling_spark.operators import dedup as dd

    imgs = mm.attach_synth_jpeg(df, "doc_id")
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.phash_dedup_pairs(
            imgs, "doc_id", "payload", max_hamming=3
        ).collect()
    }
    assert pairs == {(i, i + 1) for i in range(0, 12, 2)}


def test_synth_mixed_is_cross_codec():
    """Even ids are PNG, odd ids are JPEG, and the planted pair
    structure holds ACROSS the codec boundary."""
    for i in range(0, 8, 2):
        assert mm.synth_mixed(i)[:4] == b"\x89PNG"
        assert mm.synth_mixed(i + 1)[:2] == b"\xff\xd8"
    hashes = {i: mm.dhash64(mm.synth_mixed(i)) for i in range(16)}
    for even in range(0, 16, 2):
        assert _ham(hashes[even], hashes[even + 1]) <= 3
    for i in range(16):
        for j in range(i + 1, 16):
            if i % 2 == 0 and j == i + 1:
                continue
            assert _ham(hashes[i], hashes[j]) > 3, (i, j)


def test_q_dedup_phash_mixed_spark_end_to_end(spark):
    """Cross-format dedup through Spark: the PNG-encoded even doc and
    the JPEG-encoded odd doc of each group pair up through one
    magic-dispatched fingerprint column."""
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    from flink_join_scaling_spark.operators import dedup as dd

    imgs = mm.attach_synth_mixed(df, "doc_id")
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.phash_dedup_pairs(
            imgs, "doc_id", "payload", max_hamming=3
        ).collect()
    }
    assert pairs == {(i, i + 1) for i in range(0, 12, 2)}


def test_zero_quantizer_refuses_loudly():
    """A zero qtable entry would make the encoder's integer divide
    silently zero coefficients (NumPy //0 → 0 + RuntimeWarning) and
    decode to a constant-gray frame — both sides must refuse instead."""
    img = np.full((8, 8), 200)
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        jc.jpeg_encode_gray(img, 8, 8, qtable=np.zeros((8, 8)))
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        jc.jpeg_encode_ycbcr(
            np.stack([img] * 3, axis=2), 8, 8, qtable=np.full((8, 8), 256)
        )
    # decoder side: rewrite a valid stream's DQT to contain a zero
    payload = bytearray(jc.jpeg_encode_gray(img, 8, 8))
    i = payload.index(b"\xff\xdb")
    payload[i + 5] = 0  # first zigzag entry of the table body
    with pytest.raises(ValueError, match="zero"):
        jc.jpeg_pixels(bytes(payload))


# ------------------------------------------------- progressive (r13)


def test_progressive_equals_baseline_gray():
    """Progressive and baseline encode the SAME quantized coefficients
    through different entropy layers — decode must be bit-identical.
    Covers DC first at Al>0, DC refinement, split-band AC first passes
    at Al=2, and two AC refinement levels (the default scan script)."""
    rng = np.random.RandomState(31)
    for w, h in [(8, 8), (72, 64), (17, 23), (1, 1), (5, 40)]:
        img = rng.randint(0, 256, size=(h, w))
        base = jc.jpeg_pixels(jc.jpeg_encode_gray(img, w, h))
        prog = jc.jpeg_pixels(jc.jpeg_encode_progressive_gray(img, w, h))
        assert base[:3] == prog[:3] == (w, h, 1)
        assert np.array_equal(base[3], prog[3]), (w, h)


def test_progressive_equals_baseline_color_and_subsampled():
    """Color path: interleaved 3-component DC scans over the padded
    MCU grid + non-interleaved AC scans over each component's ACTUAL
    block grid — with 4:2:0 the two grids diverge (e.g. 72 px wide at
    2×2 luma: padded stride 10 blocks vs actual 9), the case the
    decoder must index correctly."""
    rng = np.random.RandomState(37)
    for w, h in [(16, 16), (72, 64), (17, 23)]:
        rgb = rng.randint(0, 256, size=(h, w, 3))
        for sub in (False, True):
            base = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, w, h, subsample=sub))
            prog = jc.jpeg_pixels(
                jc.jpeg_encode_progressive_ycbcr(rgb, w, h, subsample=sub)
            )
            assert np.array_equal(base[3], prog[3]), (w, h, sub)


def test_progressive_alternative_scan_scripts():
    """The decoder accepts ANY legal progression, not just the default
    script: spectral-selection-only (Al=0 everywhere), many small
    bands, and a deep 3-level successive approximation all decode to
    the baseline pixels."""
    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(40, 56))
    base = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 56, 40))[3]
    scripts = [
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        [([0], 0, 0, 0, 0)]
        + [([0], 1 + 9 * i, min(9 + 9 * i, 63), 0, 0) for i in range(7)],
        [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
         ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2),
         ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)],
    ]
    for sc in scripts:
        px = jc.jpeg_pixels(
            jc.jpeg_encode_progressive_gray(img, 56, 40, scans=sc)
        )[3]
        assert np.array_equal(px, base), sc


def test_progressive_restart_markers():
    """RSTn inside progressive scans: every interval re-encodes with
    fresh DC predictors and EOB-run state; the decoder must reset the
    same state at each marker."""
    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, size=(48, 80))
    base = jc.jpeg_pixels(jc.jpeg_encode_gray(img, 80, 48))[3]
    for ri in (1, 3, 7, 100):
        payload = jc.jpeg_encode_progressive_gray(img, 80, 48,
                                                  restart_interval=ri)
        if ri < 60:
            assert b"\xff\xd0" in payload
        assert np.array_equal(jc.jpeg_pixels(payload)[3], base), ri


def test_progressive_illegal_progressions_refuse():
    """The per-coefficient Al tracker refuses streams whose scans skip
    a band, refine before the first pass, skip an approximation level,
    or repeat a first pass — each would otherwise decode to silently
    wrong pixels (the loud-refusal stance)."""
    img = np.full((16, 16), 77)
    cases = [
        ([([0], 0, 0, 0, 0), ([0], 1, 30, 0, 0)], "uncoded"),
        ([([0], 1, 63, 0, 0), ([0], 0, 0, 0, 0)], "before the DC scan"),
        ([([0], 0, 0, 0, 2), ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 0)],
         "DC successive-approximation"),
        ([([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0), ([0], 1, 63, 0, 0)],
         "overlapping"),
    ]
    for scans, msg in cases:
        payload = jc.jpeg_encode_progressive_gray(img, 16, 16, scans=scans)
        with pytest.raises(ValueError, match=msg):
            jc.jpeg_pixels(payload)


def test_progressive_hand_built_stream_decodes_expected_pixels():
    """Decoder-only check against a HAND-ASSEMBLED progressive stream
    (bit codes written from the T.81 Annex K tables by hand, not by
    the repo encoder) — guards the entropy layer against a
    complementary encoder/decoder bug, which round-trip tests cannot
    see. One 8×8 block, q=1, DC diff 5 (category 3: DC-lum code 100 +
    bits 101), then AC scan: symbol 0x01 (AC-lum code 00) + value bit
    1 (coefficient +1 at zigzag k=1), EOB (code 1010)."""
    out = bytearray(b"\xff\xd8")
    out += jc._dqt_seg(0, np.ones((8, 8), dtype=np.int64))
    out += jc._seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += jc._dht_seg(0, 0, *jc._STD_DC_LUM)
    out += jc._dht_seg(1, 0, *jc._STD_AC_LUM)
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bytes([0b10010111])  # 100 101 + 1-pad
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bytes([0b00110101])  # 00 1 1010 + 1-pad
    out += b"\xff\xd9"
    w, h, c, px = jc.jpeg_pixels(bytes(out))
    assert (w, h, c) == (8, 8, 1)
    coef = np.zeros((1, 8, 8), dtype=np.int64)
    coef[0, 0, 0] = 5
    coef[0, 0, 1] = 1  # zigzag k=1 → natural (0, 1)
    expected = np.clip(jc._idct_blocks(coef)[0] + 128, 0, 255)
    assert np.array_equal(px.reshape(8, 8), expected)


def test_progressive_zrl_past_band_end_refuses():
    """A ZRL whose 16-zero run overruns the scan's band end is corrupt
    (T.81 G.1.2.2: runs never cross a spectral band) and must refuse
    loudly like the coded-value overrun path — not silently drop the
    block remainder. Hand-assembled stream: DC first pass (diff 0,
    DC-lum category-0 code 00), then an AC first pass over band
    [1, 5] whose sole symbol is ZRL (AC-lum code 11111111001):
    k = 1 + 16 = 17 > Se + 1 = 6."""
    out = bytearray(b"\xff\xd8")
    out += jc._dqt_seg(0, np.ones((8, 8), dtype=np.int64))
    out += jc._seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += jc._dht_seg(0, 0, *jc._STD_DC_LUM)
    out += jc._dht_seg(1, 0, *jc._STD_AC_LUM)
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bytes([0b00111111])  # DC code 00 + 1-pad
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0x00]))
    out += bytes([0xFF, 0x00, 0b00111111])  # ZRL 11111111(001) stuffed + pad
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="AC run past band end"):
        jc.jpeg_pixels(bytes(out))


def test_progressive_refinement_zrl_past_band_end_refuses():
    """The refinement-pass sibling of the first-pass ZRL check: a ZRL
    whose 16 zero-history positions don't fit before the band end is
    corrupt and must refuse, not silently drop the block remainder.
    Hand-assembled: DC first at Al=1, AC first pass filling band
    [1, 5] with five nonzero coefficients (codes 00+1 each), then a
    refinement scan (Ah=1, Al=0) whose sole symbol is ZRL — zero
    zero-history positions remain, so the advance loop exhausts the
    band with r=15 outstanding."""
    out = bytearray(b"\xff\xd8")
    out += jc._dqt_seg(0, np.ones((8, 8), dtype=np.int64))
    out += jc._seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += jc._dht_seg(0, 0, *jc._STD_DC_LUM)
    out += jc._dht_seg(1, 0, *jc._STD_AC_LUM)
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b00111111])  # DC code 00 + 1-pad
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0x01]))
    out += bytes([0b00100100, 0b10010011])  # five (0,1)+bit-1 + pad
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0x10]))
    out += bytes([0xFF, 0x00, 0b00100000])  # ZRL + 5 correction bits
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="refinement run past band end"):
        jc.jpeg_pixels(bytes(out))


def test_dhash64_magic_dispatch_covers_progressive():
    """dhash64's JPEG branch needs no change for progressive payloads
    — same SOI magic, same decoder entry — and the fingerprint equals
    the baseline encoding's (identical decoded pixels)."""
    rng = np.random.RandomState(47)
    levels = rng.randint(0, 256, size=(8, 9))
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)
    h_base = mm.dhash64(jc.jpeg_encode_gray(img, 72, 64))
    h_prog = mm.dhash64(jc.jpeg_encode_progressive_gray(img, 72, 64))
    assert h_base == h_prog


def test_synth_progressive_planted_structure():
    """Even ids baseline (SOF0), odd ids progressive (SOF2), pair
    structure holds across the coding boundary."""
    for i in range(0, 8, 2):
        assert b"\xff\xc0" in mm.synth_progressive(i)
        assert b"\xff\xc2" in mm.synth_progressive(i + 1)
    hashes = {i: mm.dhash64(mm.synth_progressive(i)) for i in range(16)}
    for even in range(0, 16, 2):
        assert _ham(hashes[even], hashes[even + 1]) <= 3
    for i in range(16):
        for j in range(i + 1, 16):
            if i % 2 == 0 and j == i + 1:
                continue
            assert _ham(hashes[i], hashes[j]) > 3, (i, j)


def test_synth_progressive_carries_real_ac_energy():
    """The texture must put nonzero AC coefficients through the
    progressive scans — otherwise the e2e query only proves the DC
    path (the all-constant-block trap)."""
    payload = mm.synth_progressive(1)
    # a DC-only 72×64 progressive stream of this script is ~1.2 KB;
    # real AC energy across 72 blocks × 5 scans is far larger
    assert len(payload) > 3000
    # and decodes to the textured image exactly (q=1, within DCT
    # rounding — the texture survives, it is not quantized away)
    w, h, c, px = jc.jpeg_pixels(payload)
    img = mm._synth_textured_image(1)
    assert int(np.abs(px.reshape(64, 72) - img).max()) <= 2


def test_q_dedup_phash_progressive_spark_end_to_end(spark):
    """The registered query's planted pair set through Spark — real
    progressive encode on the executors, real refinement decode,
    band join."""
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    from flink_join_scaling_spark.operators import dedup as dd

    imgs = mm.attach_synth_progressive(df, "doc_id")
    pairs = {
        (r.id_a, r.id_b)
        for r in dd.phash_dedup_pairs(
            imgs, "doc_id", "payload", max_hamming=3
        ).collect()
    }
    assert pairs == {(i, i + 1) for i in range(0, 12, 2)}


def test_appn_and_com_segments_are_skipped():
    """Real crawled JPEGs open with JFIF APP0 / EXIF APP1 / COM
    segments our encoders never emit — the marker walk must skip any
    length-bearing segment it doesn't model, in both frame types."""
    img = np.random.RandomState(5).randint(0, 256, size=(16, 16))
    app0 = jc._seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    app1 = jc._seg(0xE1, b"Exif\x00\x00" + b"\x00" * 16)
    com = jc._seg(0xFE, b"written by a camera")
    for maker in (jc.jpeg_encode_gray, jc.jpeg_encode_progressive_gray):
        payload = maker(img, 16, 16)
        spliced = payload[:2] + app0 + app1 + com + payload[2:]
        assert np.array_equal(
            jc.jpeg_pixels(spliced)[3], jc.jpeg_pixels(payload)[3]
        )


def test_progressive_color_restart_markers():
    """RSTn in INTERLEAVED progressive DC scans (3 components × h·v
    blocks per MCU — the restart interval counts MCUs, not blocks)
    and in the per-component AC scans, with and without 4:2:0."""
    rng = np.random.RandomState(53)
    rgb = rng.randint(0, 256, size=(24, 40, 3))
    for sub in (False, True):
        base = jc.jpeg_pixels(jc.jpeg_encode_ycbcr(rgb, 40, 24, subsample=sub))[3]
        for ri in (1, 2, 5):
            payload = jc.jpeg_encode_progressive_ycbcr(
                rgb, 40, 24, subsample=sub, restart_interval=ri
            )
            assert b"\xff\xd0" in payload
            assert np.array_equal(jc.jpeg_pixels(payload)[3], base), (sub, ri)


def test_bitwriter_matches_reference_bit_packing():
    """r17: _BitWriter buffers (code, length) pairs and packs them in
    one vectorized pass. Differential check against a straightforward
    per-bit reference writer (the pre-r17 semantics: MSB-first
    concatenation, codes masked to their length, 1-padding at flush
    and before RSTn, 0x00 stuffed after every 0xFF data byte) over
    random symbol streams with interleaved restarts."""
    rng = np.random.RandomState(1217)
    for trial in range(25):
        stream = []
        for _ in range(rng.randint(1, 400)):
            ln = int(rng.randint(1, 17))
            code = int(rng.randint(0, 1 << 17))  # may exceed ln bits
            stream.append((code, ln, bool(trial % 3 == 0 and rng.rand() < 0.05)))

        # reference: naive bit accumulator
        bits = []
        ref = bytearray()

        def ref_emit():
            while len(bits) % 8:
                bits.append(1)
            for i in range(0, len(bits), 8):
                b = int("".join(map(str, bits[i : i + 8])), 2)
                ref.append(b)
                if b == 0xFF:
                    ref.append(0x00)
            bits.clear()

        w = jc._BitWriter()
        rst = 0
        for code, ln, restart in stream:
            w.write(code, ln)
            for i in range(ln - 1, -1, -1):
                bits.append((code >> i) & 1)
            if restart:
                w.restart(rst)
                ref_emit()
                ref += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
        got = w.flush()
        ref_emit()
        assert got == bytes(ref), f"trial {trial}"


def test_fixture_bitstreams_pinned():
    """r17: the encoder optimizations (vectorized bit packing, bulk
    zigzag, inlined magnitude coding) were verified BIT-IDENTICAL to
    the pre-r17 encoder; pin the planted fixtures' exact payload
    digests so a future 'optimization' that silently changes the
    emitted bitstream (legal JPEG or not) fails loudly here instead
    of surfacing as an oracle drift three rounds later."""
    import hashlib

    from flink_join_scaling_spark.operators.multimodal import (
        synth_jpeg,
        synth_progressive,
    )

    pins = {
        ("prog", 0): "a2846a0bb40a0b6ad24c2d032681d25542b5fcc25e255ed0f435af3761228397",
        ("prog", 1): "9d8491b77010b239258b6ef169566581b29994e8108e9ee4513a33db47b38add",
        ("jpeg", 0): "164515737643a5c837164aa873f29caddb42946eeaab6cc39357b985a81f2470",
        ("jpeg", 1): "35eb861ae304827dd42c36b19d3a62b2894de47f783325ba76adde5a2b03d1b5",
    }
    for (kind, i), want in pins.items():
        payload = synth_progressive(i) if kind == "prog" else synth_jpeg(i)
        assert hashlib.sha256(payload).hexdigest() == want, (kind, i)
