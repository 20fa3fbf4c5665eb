"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each Python worker sees
columnar batches of payloads, never one row at a time. This is the
shape that holds at 100 TB: payload bytes stay in the executor, only
fixed-width features come back.

The actual codecs (PIL/libsndfile/ffmpeg) are NOT in this container,
so ``decode_media`` is gated: ``decoder="real"`` raises
NotImplementedError at the decode step; ``decoder="fake"`` (default in
tests) derives deterministic pseudo-features from the raw bytes so the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is fully real and testable.
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


def _real_decode(payload: bytes, media_type: str):
    raise NotImplementedError(
        "media codecs (PIL/libsndfile/ffmpeg) are not available in this "
        "environment; plug a decoder in here"
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
