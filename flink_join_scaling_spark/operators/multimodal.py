"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each Python worker sees
columnar batches of payloads, never one row at a time. This is the
shape that holds at 100 TB: payload bytes stay in the executor, only
fixed-width features come back.

Image/video codecs (PIL/ffmpeg) are NOT in this container, so
``decode_media`` is gated: for those types ``decoder="real"`` raises
NotImplementedError at the decode step; ``decoder="fake"`` (default in
tests, and the DuckDB-oracle path) derives deterministic
pseudo-features from the raw bytes so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is fully real and
testable. ``audio/wav`` has a REAL dependency-free decoder
(:func:`_parse_wav`: RIFF chunk walk + PCM statistics in pure
Python/NumPy), value-checked in tests against hand-built WAV bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_sha int, "
    "width int, height int, n_channels int, mean_byte double"
)

_MEDIA_TYPES = ("image/png", "image/jpeg", "audio/wav", "video/mp4")


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture builder: wrap a text column as an opaque binary payload
    with typed metadata (the documents table stands in for a media
    manifest; at scale the payload column comes from the lakehouse)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col(id_col) % len(_MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _parse_wav(payload: bytes) -> tuple[int, int, int, float]:
    """Dependency-free WAV decode: walk the RIFF chunk list, read the
    ``fmt `` chunk (PCM format/channels/rate/bits) and the ``data``
    chunk (interleaved samples), and reduce the samples to one
    deterministic statistic. Returns the audio projection of
    FEATURE_SCHEMA's generic fields:

    - width      → sample rate in Hz
    - height     → frame count (samples per channel)
    - n_channels → channel count
    - mean_byte  → mean |amplitude| normalized to [0, 1], SQL-style
      half-up rounded to 4 decimals (same rounding as the fake path)

    Supports PCM (format 1) at 8-bit unsigned and 16-bit signed
    little-endian — the formats a header-only parser can decode without
    a codec. Anything else raises ValueError (loudly, not a guess).
    """
    import math

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels < 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV (format={audio_format}, channels={channels}, "
            f"bits={bits}); only PCM 8/16-bit is decoded here"
        )
    bytes_per_frame = channels * (bits // 8)
    usable = len(data) - (len(data) % bytes_per_frame)
    n_frames = usable // bytes_per_frame
    if n_frames == 0:
        return sample_rate, 0, channels, 0.0
    if bits == 16:
        samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
        mean_abs = float(np.abs(samples).mean()) / 32768.0
    else:
        samples = np.frombuffer(data[:usable], dtype="u1").astype(np.float64)
        mean_abs = float(np.abs(samples - 128.0).mean()) / 128.0
    return (
        sample_rate,
        n_frames,
        channels,
        math.floor(mean_abs * 10000 + 0.5) / 10000,
    )


def _real_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    if media_type == "audio/wav":
        return _parse_wav(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r}: image/video decoders (PIL/ffmpeg) "
        "are not available in this environment; plug a decoder in here"
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode from raw bytes: stands in for
    (width, height, channels, mean pixel/sample)."""
    import math

    n = len(payload)
    width = 16 + (n % 640)
    height = 16 + ((n * 7) % 480)
    channels = 1 + (n % 3)
    mean_byte = (sum(payload[:64]) / max(min(n, 64), 1)) if n else 0.0
    # half-UP rounding (SQL round), not Python's banker's rounding —
    # sums divided by 64 land on exact dyadic halves constantly, and
    # the value-level oracle compares against SQL round()
    return width, height, channels, math.floor(mean_byte * 10000 + 0.5) / 10000


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas decode/feature-extract over (doc_id, payload,
    media_type, n_bytes) batches → fixed-width feature rows."""
    decode = _fake_decode if decoder == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p), m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_channels", "mean_byte"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "media_type", pdf["media_type"].to_numpy())
            out.insert(2, "n_bytes", pdf["n_bytes"].to_numpy())
            out.insert(
                3,
                "payload_sha",
                [int.from_bytes(bytes(p)[:2], "big") if len(bytes(p)) >= 2 else 0 for p in pdf["payload"]],
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index. The frame *positions* are computed Spark-side (cheap,
    declarative); actual frame decode would go through
    :func:`decode_media` with a real decoder."""
    n_frames = F.least(
        F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return (
        df.where(F.col("media_type") == "video/mp4")
        .select(
            "doc_id",
            "n_bytes",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn(
            "byte_offset", (F.col("frame_idx").cast("bigint") * every_n_bytes)
        )
    )
