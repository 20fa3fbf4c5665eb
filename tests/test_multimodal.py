"""Unit tests for multimodal plumbing: schema/batching correctness of
the fake-decode path, real-decoder gating, and frame-sampling math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (100 * (i + 1))) for i in range(8)], "doc_id long, text string"
    )
    return mm.attach_payload(docs, "doc_id", "text")


def test_attach_payload_schema_and_types(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }
    rows = {r.doc_id: (r.media_type, r.n_bytes) for r in media.collect()}
    assert rows[0] == ("image/png", 100)
    assert rows[3] == ("video/mp4", 400)
    assert rows[7] == ("video/mp4", 800)


def test_fake_decode_deterministic_and_batched(media):
    out1 = {tuple(r) for r in mm.decode_media(media).collect()}
    out2 = {tuple(r) for r in mm.decode_media(media.repartition(4)).collect()}
    assert out1 == out2  # partitioning/batch boundaries don't change results
    one = {r.doc_id: r for r in mm.decode_media(media).collect()}
    assert one[0].width == 16 + (100 % 640)
    assert one[0].n_channels == 1 + (100 % 3)
    assert all(r.mean_byte == float(ord("x")) for r in one.values())


def test_real_decoder_rejects_non_wav_payload(media):
    """decoder="real" fails loudly on the fixture: its audio/wav and
    image/png rows carry text bytes (not RIFF/PNG), and jpeg/video have
    no codec — either way the decode step raises instead of fabricating
    features. (Real WAV/PNG decode is value-checked in
    test_real_wav_decode_values / test_real_png_decode_through_spark;
    the jpeg/video NotImplementedError gate in
    test_real_decoder_still_gated_for_jpeg.)"""
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, decoder="real").collect()
    msg = str(exc_info.value)
    # message set tracks the real decoders: RIFF/PNG/JPEG structure
    # validation errors, or the NotImplementedError codec gate
    assert (
        "NotImplementedError" in msg
        or "RIFF" in msg
        or "PNG" in msg
        or "JPEG" in msg
    )


def _wav_bytes(
    samples: list[int],
    channels: int = 2,
    rate: int = 8000,
    bits: int = 16,
    extra_chunk: bytes = b"",
) -> bytes:
    """Hand-assemble a minimal RIFF/WAVE file: fmt + optional extra
    chunk + data, so the decoder is checked against known PCM."""
    if bits == 16:
        data = b"".join(
            int(s).to_bytes(2, "little", signed=True) for s in samples
        )
    else:
        data = bytes(samples)
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += extra_chunk
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_real_wav_decode_values(spark):
    """decoder="real" on audio/wav: the RIFF/PCM parse returns exact
    (rate, frames, channels, mean|amplitude|) for hand-built bytes,
    through the full Spark mapInPandas path."""
    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    wav = _wav_bytes(samples, channels=2, rate=8000, bits=16)
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav", len(wav))],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    [r] = mm.decode_media(df, decoder="real").collect()
    assert (r.width, r.height, r.n_channels) == (8000, 4, 2)
    # mean(|s|)/32768 = 14335.875/32768, half-up rounded to 4 decimals
    assert r.mean_byte == 0.4375


def test_parse_wav_8bit_and_chunk_walk():
    """8-bit unsigned branch + word-aligned skip of an odd-sized
    non-data chunk between fmt and data."""
    odd = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # pad byte
    wav = _wav_bytes([128, 0, 255, 128], channels=1, rate=44100, bits=8, extra_chunk=odd)
    rate, frames, ch, mean_abs = mm._parse_wav(wav)
    assert (rate, frames, ch) == (44100, 4, 1)
    # |128-128|+|0-128|+|255-128|+|128-128| = 255; /4/128 = 0.498046875
    assert mean_abs == 0.498


def test_parse_wav_rejects_non_pcm():
    wav = bytearray(_wav_bytes([0, 0], channels=1, rate=8000, bits=16))
    wav[20:22] = (3).to_bytes(2, "little")  # IEEE float format tag
    with pytest.raises(ValueError, match="only PCM"):
        mm._parse_wav(bytes(wav))


def test_real_decoder_still_gated_for_video(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"notavideo"), "video/mp4", 9)],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(df, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def _jpeg_bytes(
    width: int,
    height: int,
    n_components: int = 3,
    sof_marker: int = 0xC0,
    fill_bytes: int = 0,
    extra_segments: bool = True,
) -> bytes:
    """Hand-assembled JPEG marker stream (T.81 §B): SOI, optional
    APP0/DQT/DRI segments and RST-style standalone markers to exercise
    the walk, the SOFn frame header carrying the dimensions, SOS, two
    bytes of fake scan data, EOI."""
    out = bytearray(b"\xff\xd8")  # SOI
    if extra_segments:
        jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + (len(jfif) + 2).to_bytes(2, "big") + jfif
        dqt = bytes([0]) + bytes(range(64))  # table id + 64 entries
        out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
        out += b"\xff\x01"  # TEM: standalone marker, no length
    out += b"\xff" * fill_bytes  # fill bytes are legal padding
    sof = (
        bytes([8])  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([n_components])
    )
    for i in range(n_components):
        sof += bytes([i + 1, 0x11, 0])  # component id, sampling, qtable
    out += bytes([0xFF, sof_marker]) + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([n_components]) + b"".join(
        bytes([i + 1, 0]) for i in range(n_components)
    ) + bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += b"\x12\x34\xff\xd9"  # scan bytes + EOI
    return bytes(out)


def test_parse_jpeg_header_baseline_and_progressive():
    for marker, w, h, nc in [(0xC0, 640, 480, 3), (0xC2, 31, 17, 1), (0xC1, 8192, 1, 4)]:
        got = mm._parse_jpeg_header(_jpeg_bytes(w, h, nc, sof_marker=marker))
        assert got == (w, h, nc, None)


def test_parse_jpeg_header_fill_bytes_and_minimal():
    assert mm._parse_jpeg_header(_jpeg_bytes(99, 7, 3, fill_bytes=3)) == (99, 7, 3, None)
    assert mm._parse_jpeg_header(
        _jpeg_bytes(5, 6, 1, extra_segments=False)
    ) == (5, 6, 1, None)


def test_parse_jpeg_header_rejects_corrupt():
    with pytest.raises(ValueError, match="SOI"):
        mm._parse_jpeg_header(b"notanimage")
    with pytest.raises(ValueError, match="SOF"):
        # SOS with no preceding SOF
        mm._parse_jpeg_header(b"\xff\xd8\xff\xda\x00\x04\x01\x00\x12\xff\xd9")
    with pytest.raises(ValueError, match="truncated"):
        mm._parse_jpeg_header(_jpeg_bytes(640, 480)[:12])
    # DHT (0xC4) must NOT be mistaken for a frame header
    dht_only = b"\xff\xd8\xff\xc4\x00\x08" + bytes(6) + b"\xff\xd9"
    with pytest.raises(ValueError, match="SOF"):
        mm._parse_jpeg_header(dht_only)


def test_real_jpeg_decode_through_spark(spark):
    """Since the r12 baseline codec landed, decode_media's real path
    ENTROPY-DECODES JPEG (jpeg_codec.jpeg_pixels) instead of stopping
    at the frame header — so the fixture must be a real encoded
    stream, and mean_byte is a real pixel statistic now (a constant
    image under the all-ones quantizer is DC-only, hence the lossy
    round trip is exact and the mean is checkable)."""
    import numpy as np

    from flink_join_scaling_spark.operators import jpeg_codec as jc

    rgb = np.full((200, 320, 3), 64)
    df = spark.createDataFrame(
        [(1, bytearray(jc.jpeg_encode_ycbcr(rgb, 320, 200)), "image/jpeg", 100)],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    [row] = mm.decode_media(df, decoder="real").collect()
    assert (row.width, row.height, row.n_channels) == (320, 200, 3)
    assert row.mean_byte == pytest.approx(64 / 255.0, abs=1e-2)


def _png_bytes(pixels, channels: int, filters=None) -> bytes:
    """Hand-assembled PNG: `pixels` is rows × width × channels nested
    lists of 0-255 ints; `filters` picks the per-scanline filter type
    (default all 0 = None) and the encoder applies the MATCHING forward
    filter so the decoder must invert it."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    height = len(pixels)
    width = len(pixels[0])
    stride = width * channels
    flat = [
        [c for px in row for c in (px if isinstance(px, (list, tuple)) else [px])]
        for row in pixels
    ]
    filters = filters or [0] * height
    raw = bytearray()
    prev = [0] * stride
    for row, ft in zip(flat, filters):
        raw.append(ft)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pred
            raw.append(v & 0xFF)
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_parse_png_all_filter_types():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) on a 3×5 RGB
    image: the decoder's unfiltering must reproduce the exact pixels
    the encoder forward-filtered, attested by the exact mean."""
    pixels = [
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[15, 25, 35], [45, 55, 65], [75, 85, 95]],
        [[200, 100, 0], [0, 200, 100], [100, 0, 200]],
        [[255, 0, 255], [1, 2, 3], [250, 251, 252]],
        [[128, 128, 128], [0, 0, 0], [255, 255, 255]],
    ]
    png = _png_bytes(pixels, channels=3, filters=[0, 1, 2, 3, 4])
    w, h, ch, mean = mm._parse_png(png)
    assert (w, h, ch) == (3, 5, 3)
    import math

    flat = [c for row in pixels for px in row for c in px]
    expected = sum(flat) / len(flat) / 255.0
    assert mean == math.floor(expected * 10000 + 0.5) / 10000


def test_parse_png_gray_and_rgba():
    import math

    g = _png_bytes([[0, 100], [200, 255]], channels=1, filters=[4, 4])
    assert mm._parse_png(g) == (
        2, 2, 1, math.floor((555 / 4) / 255.0 * 10000 + 0.5) / 10000,
    )
    rgba = _png_bytes(
        [[[1, 2, 3, 4], [5, 6, 7, 8]]], channels=4, filters=[1]
    )
    w, h, ch, mean = mm._parse_png(rgba)
    assert (w, h, ch) == (2, 1, 4)
    assert mean == math.floor((36 / 8) / 255.0 * 10000 + 0.5) / 10000


def test_parse_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        mm._parse_png(b"\x89PNG\r\n\x1a\nshort")
    # 16-bit depth rejected loudly
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        mm._parse_png(png16)


def test_real_png_decode_through_spark(spark):
    """decoder="real" on image/png through the mapInPandas path: exact
    IHDR dimensions + channel count + pixel mean come back."""
    png = _png_bytes(
        [[[9, 18, 27], [36, 45, 54]], [[63, 72, 81], [90, 99, 108]]],
        channels=3,
        filters=[2, 3],
    )
    df = spark.createDataFrame(
        [(7, bytearray(png), "image/png", len(png))],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    [r] = mm.decode_media(df, decoder="real").collect()
    assert (r.width, r.height, r.n_channels) == (2, 2, 3)
    import math

    expected = (9 + 18 + 27 + 36 + 45 + 54 + 63 + 72 + 81 + 90 + 99 + 108) / 12 / 255.0
    assert r.mean_byte == math.floor(expected * 10000 + 0.5) / 10000


def test_frame_sample_positions(media):
    rows = mm.frame_sample(media, every_n_bytes=100, max_frames=4).collect()
    # only video/mp4 docs (doc_id % 4 == 3): ids 3 (400 B) and 7 (800 B)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.byte_offset))
    assert set(by_doc) == {3, 7}
    assert sorted(by_doc[3]) == [(0, 0), (1, 100), (2, 200), (3, 300)]
    assert sorted(by_doc[7]) == [(0, 0), (1, 100), (2, 200), (3, 300)]  # capped at max_frames


def test_binaryfile_ingestion_to_real_decode(spark, tmp_path):
    """File-based ingestion closes the loop: real WAV files on disk ->
    spark.read.format('binaryFile') -> the standard payload shape ->
    decode_media(decoder='real'). Features match a direct _parse_wav
    of the same bytes — i.e. the lakehouse ingest path and the
    operator agree byte-for-byte."""
    import os

    from pyspark.sql import functions as F

    media = str(tmp_path / "media")
    os.makedirs(media)
    clips = {
        "a.wav": _wav_bytes([0, 1000, -1000, 500], channels=1, rate=8000, bits=16),
        "b.wav": _wav_bytes([128, 0, 255, 128, 64, 192], channels=2, rate=44100, bits=8),
    }
    for name, payload in clips.items():
        with open(os.path.join(media, name), "wb") as f:
            f.write(payload)

    raw = spark.read.format("binaryFile").load(media)
    shaped = raw.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
    )
    out = {
        r["fname"]: r
        for r in mm.decode_media(
            shaped.drop("fname").join(
                shaped.select("doc_id", "fname"), "doc_id"
            ),
            decoder="real",
        )
        .join(shaped.select("doc_id", "fname"), "doc_id")
        .collect()
    }
    for name, payload in clips.items():
        rate, frames, ch, mean_abs = mm._parse_wav(payload)
        r = out[name]
        assert (r["width"], r["height"], r["n_channels"]) == (rate, frames, ch)
        assert r["mean_byte"] == mean_abs
        assert r["n_bytes"] == len(payload)


def test_read_media_dir_source(spark, tmp_path):
    """The media-directory source yields the standard payload shape
    with extension-derived types and deterministic path-hash ids, and
    feeds decode_media(decoder='real') directly."""
    import os

    from flink_join_scaling_spark.sources.media import read_media_dir

    media = str(tmp_path / "m")
    os.makedirs(media)
    wav = _wav_bytes([0, 500, -500], channels=1, rate=8000, bits=16)
    with open(os.path.join(media, "clip.wav"), "wb") as f:
        f.write(wav)
    with open(os.path.join(media, "blob.bin"), "wb") as f:
        f.write(b"\x00\x01\x02")

    df = read_media_dir(spark, media)
    rows = {r["media_type"]: r for r in df.collect()}
    assert rows["audio/wav"]["n_bytes"] == len(wav)
    assert rows["application/octet-stream"]["n_bytes"] == 3
    # ids are deterministic across reads (path-hash, not monotonic id)
    again = {r["media_type"]: r["doc_id"] for r in read_media_dir(spark, media).collect()}
    assert again["audio/wav"] == rows["audio/wav"]["doc_id"]

    feats = (
        mm.decode_media(
            df.where(F.col("media_type") == "audio/wav").drop("src_path"),
            decoder="real",
        )
        .collect()
    )
    rate, frames, ch, mean_abs = mm._parse_wav(wav)
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_channels"]) == (
        rate, frames, ch,
    )


# ------------------------------------------------- pHash image dedup


def test_png_pixels_roundtrip_exact():
    """_png_pixels must return the EXACT encoder pixels (all filter
    types) — the dHash consumer is only as good as this matrix."""
    import numpy as np

    pixels = [
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[15, 25, 35], [45, 55, 65], [75, 85, 95]],
        [[200, 100, 0], [0, 200, 100], [100, 0, 200]],
        [[255, 0, 255], [1, 2, 3], [250, 251, 252]],
        [[128, 128, 128], [0, 0, 0], [255, 255, 255]],
    ]
    png = _png_bytes(pixels, channels=3, filters=[0, 1, 2, 3, 4])
    w, h, ch, px = mm._png_pixels(png)
    assert (w, h, ch) == (3, 5, 3)
    expected = np.array(
        [[c for p in row for c in p] for row in pixels], dtype=np.int64
    )
    assert (px == expected).all()


def test_dhash_planted_near_duplicate_and_unrelated():
    """dHash contract: identical image → hamming 0; a one-pixel edit →
    within a couple of bits (it feeds one 9×8 grid cell); an unrelated
    random image → tens of bits. These gaps are what make the banded
    candidate join both complete (≤3) and selective."""
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    a = mm.dhash64(mm.synth_png(0))
    assert mm.dhash64(mm.synth_png(0)) == a  # deterministic
    near = mm.dhash64(mm.synth_png(1))  # same group, one pixel bumped
    far = mm.dhash64(mm.synth_png(8))  # different md5 group
    assert ham(a, near) <= 2
    assert ham(a, far) > 10


def test_dhash_rejects_undecodable_and_tiny():
    with pytest.raises(ValueError, match="not a PNG"):
        mm.dhash64(b"JFIF-ish bytes")
    one_px = _png_bytes([[7]], channels=1, filters=[0])
    with pytest.raises(ValueError, match="at least 2"):
        mm.dhash64(one_px)


def test_phash_dedup_finds_planted_pair(spark):
    """End-to-end through Spark: the planted near-identical PNG pair
    (one-pixel edit) is found by the band join + hamming verify; the
    unrelated image pairs with nothing."""
    from flink_join_scaling_spark.operators import dedup as dd

    rows = [(i, mm.synth_png(i)) for i in (0, 1, 8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.phash_dedup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] <= 2


def test_phash_band_join_is_pigeonhole_complete(spark):
    """Every ≤3-hamming pair must be found (4 disjoint 16-bit bands →
    at least one equal band): plant a pair that differs in exactly 3
    bits spread across THREE bands — the worst case short of a miss —
    plus brute-force cross-check over the whole fixture set."""
    from flink_join_scaling_spark.operators import dedup as dd

    base = mm.dhash64(mm.synth_png(0))
    # craft a payload-level 3-band difference via pixel edits is not
    # controllable bit-by-bit, so cross-check against brute force on
    # real fixtures instead: all pairs among 20 synthetic images
    rows = [(i, mm.synth_png(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in dd.phash_dedup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    hashes = {i: mm.dhash64(mm.synth_png(i)) for i in range(20)}
    brute = {
        (a, b)
        for a in range(20)
        for b in range(a + 1, 20)
        if ham(hashes[a], hashes[b]) <= 3
    }
    assert got == brute
    assert brute  # the planted pairs make this non-vacuous
    assert base == hashes[0]


# ------------------------------------------------- real resize


def test_png_encode_decode_roundtrip_rgb():
    """The minimal encoder is the exact inverse of the decoder on its
    shared subset — RGB pixels in, identical pixels out."""
    import numpy as np

    rng = np.arange(2 * 3 * 3, dtype=np.int64).reshape(2, 9) * 13 % 256
    png = mm._png_encode(rng, width=3, height=2, channels=3)
    w, h, ch, px = mm._png_pixels(png)
    assert (w, h, ch) == (3, 2, 3)
    assert (px == rng).all()


def test_resize_png_exact_block_means():
    """16x16 -> 8x8 area-average: every output sample equals the
    half-up-rounded mean of its 2x2 source block, exactly."""
    import numpy as np

    p = mm.synth_png(0)
    _w, _h, _ch, px = mm._png_pixels(p)
    r = mm.resize_png(p, 8, 8)
    w, h, ch, rx = mm._png_pixels(r)
    assert (w, h, ch) == (8, 8, 1)
    blocks = px.reshape(16, 16).astype(float).reshape(8, 2, 8, 2).mean(axis=(1, 3))
    assert (rx.reshape(8, 8) == np.floor(blocks + 0.5).astype(int)).all()


def test_resize_png_rgb_and_uneven_grid():
    """Non-divisible target (3x5 RGB -> 2x2) uses the equal-measure
    boundaries; channels resize independently."""
    pixels = [
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[15, 25, 35], [45, 55, 65], [75, 85, 95]],
        [[200, 100, 0], [0, 200, 100], [100, 0, 200]],
        [[255, 0, 255], [1, 2, 3], [250, 251, 252]],
        [[128, 128, 128], [0, 0, 0], [255, 255, 255]],
    ]
    png = _png_bytes(pixels, channels=3, filters=[0, 1, 2, 3, 4])
    r = mm.resize_png(png, 2, 2)
    w, h, ch, rx = mm._png_pixels(r)
    assert (w, h, ch) == (2, 2, 3)
    # spot-check cell (0,0): rows 0-1, col 0 only (bounds floor(i*3/2) = [0,1,3])
    import numpy as np

    cube = np.array(
        [[c for p in row for c in p] for row in pixels], dtype=float
    ).reshape(5, 3, 3)
    cell = cube[0:2, 0:1, :].mean(axis=(0, 1))
    assert list(rx.reshape(2, 2, 3)[0, 0, :]) == [int(np.floor(v + 0.5)) for v in cell]


def test_resize_png_refuses_upsample():
    with pytest.raises(ValueError, match="downsample"):
        mm.resize_png(mm.synth_png(0), 32, 8)


def test_resize_images_through_spark(spark):
    """The mapInPandas stage emits re-decoded dims and payloads that
    decode to the exact block means."""
    rows = [(i, mm.synth_png(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mm.resize_images(df, "doc_id", out_w=4, out_h=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i, r in out.items():
        assert (r.width, r.height) == (4, 4)
        w, h, ch, px = mm._png_pixels(bytes(r.payload))
        assert (w, h, ch) == (4, 4, 1)


# ------------------------------------------------- audio fingerprint


def test_wav_samples_roundtrip_and_mixdown():
    """_wav_samples returns the exact centered PCM samples; stereo
    mixes down by mean."""
    import struct

    import numpy as np

    def wav(data: bytes, channels: int = 1, bits: int = 8) -> bytes:
        fmt = struct.pack(
            "<HHIIHH", 1, channels, 8000,
            8000 * channels * (bits // 8), channels * (bits // 8), bits,
        )
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    rate, mono, bits = mm._wav_samples(wav(bytes([0, 128, 255, 130])))
    assert rate == 8000
    assert bits == 8
    assert list(mono) == [-128.0, 0.0, 127.0, 2.0]
    # stereo 16-bit: mean of the two channels
    data = struct.pack("<4h", 100, 300, -50, 50)
    rate, mono, bits16 = mm._wav_samples(wav(data, channels=2, bits=16))
    assert bits16 == 16
    assert list(mono) == [200.0, 0.0]


def test_audiohash_planted_near_duplicate_and_unrelated():
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    a = mm.audiohash64(mm.synth_wav(0))
    assert mm.audiohash64(mm.synth_wav(0)) == a
    near = mm.audiohash64(mm.synth_wav(1))
    far = mm.audiohash64(mm.synth_wav(8))
    assert ham(a, near) <= 2
    assert ham(a, far) > 10


def test_audiohash_rejects_undecodable_and_short():
    with pytest.raises(ValueError, match="not a RIFF"):
        mm.audiohash64(b"\x89PNG not audio")
    with pytest.raises(ValueError, match=">= 65 samples"):
        mm.audiohash64(mm.synth_wav(0, n_windows=2, window=2))


def test_audiohash_dedup_finds_planted_pair(spark):
    from flink_join_scaling_spark.operators import dedup as dd

    rows = [(i, mm.synth_wav(i)) for i in (0, 1, 8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.audiohash_dedup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    assert set(pairs) == {(0, 1)}


def test_audiohash_band_join_matches_brute_force(spark):
    from flink_join_scaling_spark.operators import dedup as dd

    n = 20
    rows = [(i, mm.synth_wav(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.id_a, r.id_b)
        for r in dd.audiohash_dedup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    hs = {i: mm.audiohash64(mm.synth_wav(i)) for i in range(n)}
    brute = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if ham(hs[a], hs[b]) <= 3
    }
    assert got == brute and brute


# ------------------------------------------------- APNG multi-frame container


def test_apng_encode_decode_roundtrip_hand_built():
    """Hand-built frames survive the full acTL/fcTL/fdAT encode →
    chunk-walk → per-frame inflate → unfilter pipeline exactly."""
    import numpy as np

    frames = [
        np.arange(8 * 8, dtype=np.int64).reshape(8, 8) % 256,
        np.full((8, 8), 200, dtype=np.int64),
        np.flipud(np.arange(8 * 8, dtype=np.int64).reshape(8, 8) % 256),
    ]
    payload = mm._apng_encode(frames, 8, 8, 1)
    w, h, ch, got = mm._apng_frames(payload)
    assert (w, h, ch) == (8, 8, 1)
    assert len(got) == 3
    for exp, px in zip(frames, got):
        assert (px == exp).all()


def test_apng_rgb_frames_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(4, 4 * 3), dtype=np.int64)
        for _ in range(2)
    ]
    payload = mm._apng_encode(frames, 4, 4, 3)
    w, h, ch, got = mm._apng_frames(payload)
    assert (w, h, ch) == (4, 4, 3)
    assert all((a == b).all() for a, b in zip(frames, got))


def test_apng_rejects_malformed_containers():
    """Every unsupported/corrupt shape raises loudly (the parser-subset
    convention): still PNG, frame-count mismatch, broken sequence
    counter, region (non-full-canvas) frames."""
    import struct

    import numpy as np
    import pytest

    with pytest.raises(ValueError, match="no acTL"):
        mm._apng_frames(mm.synth_png(0))

    frames = [np.zeros((8, 8), dtype=np.int64), np.ones((8, 8), dtype=np.int64)]
    good = mm._apng_encode(frames, 8, 8, 1)

    # acTL declaring 3 frames while 2 fcTLs present
    i = good.find(b"acTL")
    bad = bytearray(good)
    bad[i + 4 : i + 8] = struct.pack(">I", 3)
    # fix the chunk CRC so only the declared count is wrong
    import zlib

    body = bytes(bad[i : i + 12])
    bad[i + 12 : i + 16] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="declares 3 frames"):
        mm._apng_frames(bytes(bad))

    # fdAT sequence number bumped out of order
    i = good.find(b"fdAT")
    bad = bytearray(good)
    bad[i + 4 : i + 8] = struct.pack(">I", 9)
    with pytest.raises(ValueError, match="sequence numbers"):
        mm._apng_frames(bytes(bad))

    # region frame: fcTL width halved
    i = good.find(b"fcTL")
    bad = bytearray(good)
    bad[i + 8 : i + 12] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="full-canvas"):
        mm._apng_frames(bytes(bad))


def test_synth_apng_frame_means_match_formula():
    """The planted gradient's decoded mean is exactly base + 3.5 — the
    invariant q_multimodal_frames_real's oracle states."""
    for d in (0, 1, 2, 11, 42):
        w, h, ch, frames = mm._apng_frames(mm.synth_apng(d))
        assert len(frames) == 2 + d % 3
        for f, px in enumerate(frames):
            base = (7 * d + 13 * f) % 200
            assert abs(float(px.mean()) - (base + 3.5)) < 1e-12


def test_apng_frame_stats_through_spark(spark):
    """The Arrow sampling stage emits exactly every 2nd frame (capped)
    with real per-frame means, straight from the container's frame
    count."""
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = mm.apng_frame_stats(
        mm.attach_synth_apng(df, "doc_id"), "doc_id",
        sample_every=2, max_frames=4,
    ).collect()
    got = {(r.doc_id, r.frame_idx): (r.n_frames, r.mean_e4) for r in out}
    import math

    exp = {}
    for d in range(12):
        n = 2 + d % 3
        for fi in list(range(0, n, 2))[:4]:
            base = (7 * d + 13 * fi) % 200
            exp[(d, fi)] = (n, math.floor((base + 3.5) / 255.0 * 10000 + 0.5))
    assert got == exp


def test_image_pipeline_stage_matches_single_operators(spark):
    """The combined single-decode stage must be value-identical to the
    standalone operators it fuses: phash == phash_hashes, resized
    payload == resize_images payload, mean_orig == png_features
    mean_byte (pre-rounding tolerance) — composing for one decode may
    not change any leg's semantics."""
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    imgs = mm.attach_synth_png(df, "doc_id").localCheckpoint(eager=True)

    stage = {
        r.doc_id: r
        for r in mm.image_pipeline_stage(imgs, "doc_id", out_w=8, out_h=8).collect()
    }
    hashes = {r.doc_id: r.phash for r in mm.phash_hashes(imgs, "doc_id").collect()}
    resized = {
        r.doc_id: bytes(r.payload)
        for r in mm.resize_images(imgs, "doc_id", out_w=8, out_h=8).collect()
    }
    feats = {r.doc_id: r.mean_byte for r in mm.png_features(imgs, "doc_id").collect()}

    assert set(stage) == set(hashes) == set(resized)
    for d, row in stage.items():
        assert row.phash == hashes[d]
        assert bytes(row.res_payload) == resized[d]
        # png_features SQL-half-up rounds to 4 decimals; stage emits raw
        assert abs(row.mean_orig - feats[d]) <= 5e-5


def test_apng_frame_hashes_planted_structure(spark):
    """Frame-level fingerprints through the real container: the
    (even, odd) doc pair is near-dup FRAME-WISE (hamming <= 1 per
    aligned frame), frames within a doc are unrelated, and the
    composite node id is doc*16+frame."""
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    fh = mm.apng_frame_hashes(
        mm.attach_synth_apng_group(df, "doc_id"), "doc_id"
    ).collect()
    by_key = {(r.doc_id, r.frame_idx): r.fhash for r in fh}
    for r in fh:
        assert r.node == r.doc_id * 16 + r.frame_idx
    for d in range(0, 6, 2):
        n = 2 + (d // 2) % 3
        assert {f for (dd_, f) in by_key if dd_ == d} == set(range(n))
        for f in range(n):
            a, b = by_key[(d, f)], by_key[(d + 1, f)]
            assert bin((a ^ b) & (2**64 - 1)).count("1") <= 1
        # frames within the even doc are unrelated (md5-random)
        if n >= 2:
            a, b = by_key[(d, 0)], by_key[(d, 1)]
            assert bin((a ^ b) & (2**64 - 1)).count("1") > 3


def test_apng_frame_hashes_rejects_frame_stride_overflow(spark):
    """A container with >= frame_stride frames must raise — a silent
    composite-id collision would corrupt the pair graph."""
    import numpy as np
    import pytest

    frames = [np.full((8, 8), i, dtype=np.int64) for i in range(5)]
    payload = mm._apng_encode(frames, 8, 8, 1)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="frame_stride"):
        mm.apng_frame_hashes(df, "doc_id", frame_stride=4).collect()


# ------------------------------------------------- audio resample


def test_resample_wav_exact_block_means():
    """Hand-built PCM: factor-4 decimation emits exactly the block
    means (bias-128, half-up), the trailing partial block is dropped,
    and the re-encoded WAV re-decodes at rate//4."""
    import numpy as np

    # 10 samples: two full blocks of 4, one partial block of 2 (dropped)
    u8 = np.array([10, 20, 30, 40, 100, 100, 100, 101, 7, 9], dtype=np.uint8)
    payload = mm._wav_encode_u8(u8, 8000)
    rp = mm.resample_wav(payload, 4)
    rate, mono, _bits = mm._wav_samples(rp)
    assert rate == 2000
    # block means of CENTERED samples: (10+20+30+40)/4-128 = -103;
    # (100+100+100+101)/4 = 100.25 -> 100 centered -27.75 -> -28+... 
    # recompute exactly: centered blocks = mean(u8)-128, re-encoded
    # half-up: block1 25.0 -> 25; block2 100.25 -> 100
    assert list(mono.astype(int) + 128) == [25, 100]


def test_resample_wav_refuses_upsample_and_bad_payload():
    import pytest

    payload = mm.synth_wav(0)
    with pytest.raises(ValueError, match="downsample"):
        mm.resample_wav(payload, 10**9)
    with pytest.raises(ValueError):
        mm.resample_wav(b"not a wav", 4)


def test_resample_wav_preserves_fixture_envelope_exactly():
    """On the constant-level fixture windows (32 samples, factor 4 —
    no block spans a boundary) decimation preserves the envelope and
    the mean |amplitude| EXACTLY."""
    p = mm.synth_wav(6)
    rate0, n0, ch0, mean0 = mm._parse_wav(p)
    rp = mm.resample_wav(p, 4)
    rate1, n1, ch1, mean1 = mm._parse_wav(rp)
    assert (rate1, n1, ch1) == (rate0 // 4, n0 // 4, 1)
    assert abs(mean1 - mean0) < 1e-9


def test_resample_audio_through_spark(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    auds = mm.attach_synth_wav(df, "doc_id")
    out = mm.resample_audio(auds, "doc_id", factor=4).collect()
    assert len(out) == 6
    for r in out:
        assert (r.sample_rate, r.n_frames) == (2000, 520)
        # the resampled payload really decodes
        rate, n, ch, mean = mm._parse_wav(bytes(r.payload))
        assert (rate, n) == (2000, 520)


def test_resample_wav_requantizes_16bit():
    """A 16-bit source is scaled by 256 into the 8-bit bias-128 range
    (the standard requantization), not clipped to garbage."""
    import struct

    import numpy as np

    samples = np.array([0, 2560, -2560, 25600], dtype="<i2")  # ±32768 units
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rp = mm.resample_wav(payload, 2)
    rate, mono, _bits = mm._wav_samples(rp)
    assert rate == 4000
    # block means in 16-bit units: 1280, 11520 -> /256 = 5, 45
    assert list(mono.astype(int)) == [5, 45]


def test_audio_pipeline_stage_matches_single_operators(spark):
    """The composed audio stage must be value-identical to the
    standalone operators it fuses: audiohash == audiohash_hashes,
    resampled payload == resample_audio payload."""
    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    auds = mm.attach_synth_wav(df, "doc_id").localCheckpoint(eager=True)
    stage = {
        r.doc_id: r
        for r in mm.audio_pipeline_stage(auds, "doc_id", factor=4).collect()
    }
    hashes = {
        r.doc_id: r.audiohash
        for r in mm.audiohash_hashes(auds, "doc_id").collect()
    }
    resampled = {
        r.doc_id: bytes(r.payload)
        for r in mm.resample_audio(auds, "doc_id", factor=4).collect()
    }
    assert set(stage) == set(hashes) == set(resampled)
    for d, row in stage.items():
        assert row.audiohash == hashes[d]
        assert bytes(row.res_payload) == resampled[d]


def test_audio_pipeline_stage_16bit_matches_single_operators(spark):
    """The advisor's r11 finding: the composed stage used to hardcode
    requantization scale 1.0, so 16-bit input (±32768-unit samples)
    was clipped to 0/255 garbage in res_payload and mean_orig came out
    in 16-bit units. Now the stage derives the scale from the
    decoder's own bit depth — 16-bit input must round-trip exactly
    like the standalone ``resample_wav``/``audiohash64`` operators,
    with ``mean_orig`` in requantized 8-bit units."""
    import struct

    import numpy as np

    def wav16(seed: int) -> bytes:
        rng = np.random.RandomState(seed)
        samples = (rng.randint(-120, 120, size=128) * 256).astype("<i2")
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    payloads = {i: wav16(i) for i in range(4)}
    df = spark.createDataFrame(
        [(i, p) for i, p in payloads.items()], "doc_id long, payload binary"
    )
    stage = {
        r.doc_id: r
        for r in mm.audio_pipeline_stage(df, "doc_id", factor=4).collect()
    }
    for d, p in payloads.items():
        row = stage[d]
        assert row.audiohash == mm.audiohash64(p)
        assert bytes(row.res_payload) == mm.resample_wav(p, 4)
        _rate, mono, bits = mm._wav_samples(p)
        assert bits == 16
        expected_mean = float(np.abs(mono).mean() / 256.0)
        assert abs(row.mean_orig - expected_mean) < 1e-9
        # the old bug clipped every block to 0/255; the fixed payload
        # must re-decode to non-degenerate centered samples
        _r2, mono2, _b2 = mm._wav_samples(bytes(row.res_payload))
        assert np.abs(mono2).max() < 127.0
        assert np.abs((mono / 256.0)[: len(mono2) * 4].reshape(-1, 4)
                      .mean(axis=1) - mono2).max() <= 0.5 + 1e-9
