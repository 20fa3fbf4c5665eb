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
    """decoder="real" fails loudly on the fixture: its audio/wav rows
    carry text bytes (not RIFF), and image/video have no codec — either
    way the decode step raises instead of fabricating features. (Real
    WAV decode is value-checked in test_real_wav_decode_values; the
    image/video NotImplementedError gate in
    test_real_decoder_still_gated_for_images.)"""
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, decoder="real").collect()
    msg = str(exc_info.value)
    assert "NotImplementedError" in msg or "RIFF" in msg


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


def test_real_decoder_still_gated_for_images(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"notanimage"), "image/png", 10)],
        "doc_id long, payload binary, media_type string, n_bytes long",
    )
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(df, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


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
