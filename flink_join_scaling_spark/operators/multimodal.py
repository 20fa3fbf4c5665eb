"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each Python worker sees
columnar batches of payloads, never one row at a time. This is the
shape that holds at 100 TB: payload bytes stay in the executor, only
fixed-width features come back.

Codec coverage: ``audio/wav`` and ``image/png`` have REAL
dependency-free decoders (:func:`_parse_wav`: RIFF chunk walk + PCM
statistics; :func:`_parse_png`: chunk walk + stdlib-zlib inflate +
full None/Sub/Up/Average/Paeth scanline unfiltering), value-checked
in tests against hand-built bytes, and ``image/jpeg`` has a REAL
baseline-sequential pixel decoder (r12 —
:mod:`~flink_join_scaling_spark.operators.jpeg_codec`: Huffman
entropy decode, dequantize, integer IDCT, 4:2:0/4:2:2/4:4:4 chroma
upsampling, restart markers), so the dHash dedup family and the
feature queries run on the format ~90% of crawled images actually
use. The structure-only :func:`_parse_jpeg_header` remains for
metadata paths that must not pay the entropy decode. JPEG variants
outside the baseline subset (progressive, arithmetic, 12-bit, CMYK)
raise a LOUD ValueError — a perceptual hash from a half-decoded
image would be silently wrong.

Video frame decode (ffmpeg-class codecs) stays a PERMANENT gate in
this environment: ``decoder="real"`` raises ``NotImplementedError``
at the decode step for ``video/mp4``; ``decoder="fake"`` (default in
tests, and the DuckDB-oracle path for the generic plumbing queries)
derives deterministic pseudo-features from the raw bytes so the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is fully real and testable, and the production deployment plugs the
real library into ``_real_decode`` — a one-function seam. (The APNG
container walk exercises real frame-for-frame video-shaped dedup
without a DCT video codec.)
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


def _parse_png(payload: bytes) -> tuple[int, int, int, float]:
    """Dependency-free PNG decode: chunk walk + IHDR fields + zlib
    (stdlib) inflate of the IDAT stream + per-scanline unfiltering
    (None/Sub/Up/Average/Paeth — the full PNG filter set), reducing the
    reconstructed samples to one deterministic statistic. Returns the
    image projection of FEATURE_SCHEMA's generic fields:

    - width / height → IHDR dimensions in pixels
    - n_channels     → from IHDR color type (gray 1, RGB 3, gray+α 2,
      RGBA 4)
    - mean_byte      → mean reconstructed sample value normalized to
      [0, 1], SQL-style half-up rounded to 4 decimals (the same
      reduction and rounding as the WAV path)

    Supports 8-bit, non-interlaced, non-palette images — the subset a
    filter-reconstruction parser can decode exactly without a palette
    table or Adam7 pass logic. Anything else raises ValueError
    (loudly, not a guess).
    """
    return _pixels_to_features(*_png_pixels(payload))


def _png_pixels(payload: bytes):
    """The reconstructed sample matrix behind :func:`_parse_png`:
    returns ``(width, height, n_channels, pixels)`` where ``pixels``
    is an int64 ndarray of shape (height, width × channels) — the
    exact unfiltered scanlines. Factored out so pixel-consuming
    operators (the dHash image fingerprint) share one decoder with
    the feature extractor; same supported subset, same loud
    ValueError outside it."""
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    if len(payload) < len(sig) + 25 or payload[: len(sig)] != sig:
        raise ValueError("not a PNG payload")
    pos = len(sig)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if bit_depth != 8 or channels is None or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); only 8-bit non-interlaced "
            "gray/RGB/gray+alpha/RGBA is decoded here"
        )
    if width == 0 or height == 0:
        return width, height, channels, np.zeros((0, 0), dtype=np.int64)
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT stream length does not match dimensions")
    prev = np.zeros(stride, dtype=np.int64)
    rows = []
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, cur = line[0], np.frombuffer(line[1:], dtype="u1").astype(np.int64)
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub: out[i] = (cur[i] + out[i-ch]) & 0xFF,
            # i.e. per-channel running sum mod 256 — vectorized cumsum
            # per channel residue class instead of a per-sample loop.
            out = np.empty(stride, dtype=np.int64)
            for c in range(channels):
                out[c::channels] = np.cumsum(cur[c::channels]) & 0xFF
            cur = out
        elif ftype in (3, 4):  # Average/Paeth: the left operand feeds
            # floor-division / a 3-way min predictor, so the recurrence
            # is genuinely sequential — O(width·channels) Python per
            # such scanline. Fine for test/fixture imagery; at real
            # scale the pixel path belongs to a native codec anyway
            # (this parser's job is exact small-image ground truth).
            out = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = out[i - channels] if i >= channels else 0  # left
                b = prev[i]  # up
                if ftype == 3:
                    rec = cur[i] + (a + b) // 2
                else:
                    c = prev[i - channels] if i >= channels else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec = cur[i] + pred
                out[i] = rec & 0xFF
            cur = out
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        prev = cur
        rows.append(cur)
    return width, height, channels, np.stack(rows)


def _parse_jpeg_header(payload: bytes) -> tuple[int, int, int, None]:
    """Dependency-free JPEG STRUCTURE decode: a marker-segment walk to
    the frame header (SOF0/SOF1/SOF2/…), the same honest pattern as the
    WAV RIFF walk — everything a parser can know without entropy
    decode. Returns (width, height, n_components, None): dimensions
    and channel count are exact; ``mean_byte`` is None because pixel
    statistics require Huffman/DCT decode (libjpeg), which stays
    behind :class:`NotImplementedError` by design.

    JPEG layout (ITU T.81 §B): SOI (FFD8), then marker segments
    ``FF xx <len16 incl. itself> <body>``; standalone markers
    (SOI/EOI/TEM/RSTn) carry no length; 0xFF fill bytes may pad before
    any marker. The frame header is any SOFn in 0xC0–0xCF except DHT
    (0xC4), JPG (0xC8), DAC (0xCC); its body is precision(1),
    height(2), width(2), n_components(1). SOF must precede SOS —
    hitting scan data or EOI without one is a corrupt file, not a
    guess."""
    n = len(payload)
    if n < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG marker stream at byte {pos}")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone: SOI / TEM / RSTn
        if marker == 0xD9 or marker == 0xDA:
            break  # EOI, or SOS (scan data) — frame header never found
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment body")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            body = payload[pos + 2 : pos + seglen]
            if len(body) < 6:
                raise ValueError("SOF segment too short")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            return width, height, body[5], None
        pos += seglen  # skip this segment's body
    raise ValueError("no SOF frame header before scan data/EOI")


def _pixels_to_features(
    width: int, height: int, channels: int, px
) -> tuple[int, int, int, float]:
    """Shared decoded-pixels → FEATURE_SCHEMA reduction for the image
    codecs: mean reconstructed sample / 255, SQL-style half-up rounded
    to 4 decimals (the WAV path's rounding). One function so the two
    codecs' feature contract cannot drift. The degenerate-dimension
    branch is only reachable from the PNG side (``jpeg_pixels`` raises
    on zero dimensions before returning)."""
    import math

    if width == 0 or height == 0:
        return width, height, channels, 0.0
    mean = float(px.mean()) / 255.0
    return width, height, channels, math.floor(mean * 10000 + 0.5) / 10000


def _parse_jpeg(payload: bytes) -> tuple[int, int, int, float]:
    """REAL baseline JPEG decode to the generic feature fields —
    the :func:`_parse_png` contract on the
    :func:`~flink_join_scaling_spark.operators.jpeg_codec.jpeg_pixels`
    decoder. Loud ValueError outside the baseline-sequential subset."""
    from flink_join_scaling_spark.operators.jpeg_codec import jpeg_pixels

    return _pixels_to_features(*jpeg_pixels(payload))


def _real_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float | None]:
    if media_type == "audio/wav":
        return _parse_wav(payload)
    if media_type == "image/png":
        return _parse_png(payload)
    if media_type == "image/jpeg":
        return _parse_jpeg(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r}: video decoders (ffmpeg) are not "
        "available in this environment; plug a decoder in here. (Images "
        "decode for real — PNG scanline filters and baseline JPEG "
        "entropy decode both live in-repo; see jpeg_codec.py.)"
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


# ------------------------------------------------- image fingerprinting


def dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash — Krawetz's perceptual image
    fingerprint) over the REAL decoder's pixels: grayscale by
    per-pixel channel mean, area-average downsample to a 9×8 grid,
    then one bit per horizontal neighbor comparison (bit = left <
    right), row-major. Near-identical images (small edits, recompress,
    slight crops) land within a few bits; unrelated images differ in
    ~32 — which is what makes the SimHash-style band join work as the
    candidate generator (:func:`~flink_join_scaling_spark.operators.
    dedup.phash_dedup_pairs`).

    Format is sniffed from the payload's magic bytes — PNG
    (``\\x89PNG`` → :func:`_png_pixels`) and baseline JPEG
    (``\\xff\\xd8`` → :func:`~flink_join_scaling_spark.operators.
    jpeg_codec.jpeg_pixels`) — so one fingerprint column covers a
    MIXED image corpus and the whole pHash dedup family runs
    unchanged on the format ~90% of crawled images use.

    All integer/int64-NumPy arithmetic on the exact decoded samples —
    deterministic across runs and hosts. Returned as a SIGNED 64-bit
    int (two's complement) so it stores in a Spark ``long`` like the
    SimHash family. Raises the decoder's loud ValueError outside the
    supported subsets: a perceptual hash from a half-decoded image
    would be silently wrong."""
    if payload[:2] == b"\xff\xd8":
        from flink_join_scaling_spark.operators.jpeg_codec import jpeg_pixels

        width, height, channels, px = jpeg_pixels(payload)
    else:
        width, height, channels, px = _png_pixels(payload)
    return _dhash_from_pixels(width, height, channels, px)


def _dhash_from_pixels(width: int, height: int, channels: int, px) -> int:
    """The fingerprint core of :func:`dhash64`, taking already-decoded
    pixels — so a combined pipeline stage can decode ONCE and feed
    both the hash and resize legs (the q_pipeline_media single-decode
    discipline)."""
    import numpy as np

    if width < 2 or height < 1:
        raise ValueError(
            f"dhash64 needs at least 2×1 pixels, got {width}×{height}"
        )
    gray = (
        px.reshape(height, width, channels).astype(np.float64).mean(axis=2)
    )
    # area-average resample to 8 rows × 9 cols: split each axis into
    # equal-measure slices (boundaries floor(i·n/k)) and mean each cell
    def _bounds(n: int, k: int) -> list[int]:
        return [(i * n) // k for i in range(k + 1)]

    rb, cb = _bounds(height, 8), _bounds(width, 9)
    grid = np.empty((8, 9), dtype=np.float64)
    for r in range(8):
        r0, r1 = rb[r], max(rb[r + 1], rb[r] + 1)
        for c in range(9):
            c0, c1 = cb[c], max(cb[c + 1], cb[c] + 1)
            grid[r, c] = gray[r0:r1, c0:c1].mean()
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | int(grid[r, c] < grid[r, c + 1])
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed long


def phash_hashes(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, phash) via Arrow-batched :func:`dhash64` over a binary
    payload column — the mapInPandas stage every pHash consumer
    (dedup band join, clustering) starts from. Map-only; payload bytes
    never leave the executor."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "phash": [dhash64(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_t}, phash long"
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    """length + type + data + CRC — one PNG chunk."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_encode(px, width: int, height: int, channels: int) -> bytes:
    """Minimal REAL PNG encoder for 8-bit non-interlaced images
    (filter type 0 per scanline, stdlib zlib) — the inverse of the
    subset :func:`_png_pixels` decodes, so resize output round-trips
    through the same decoder. ``px`` is an int array of shape
    (height, width × channels) with values in [0, 255]."""
    import struct
    import zlib

    import numpy as np

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    arr = np.asarray(px, dtype=np.int64)
    if arr.shape != (height, width * channels):
        raise ValueError(
            f"pixel shape {arr.shape} != ({height}, {width * channels})"
        )
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("pixel values outside [0, 255]")
    body = arr.astype(np.uint8).tobytes()
    stride = width * channels
    raw = b"".join(
        b"\x00" + body[r * stride : (r + 1) * stride] for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize: decode (:func:`_png_pixels`), per-channel
    area-average downsample to ``out_w × out_h`` (equal-measure cell
    boundaries ``floor(i·n/k)`` — the dHash grid rule), SQL-half-up
    round back to uint8, re-encode (:func:`_png_encode`). Entirely
    stdlib + NumPy, deterministic across hosts; raises the decoder's
    loud ValueError outside the supported subset and refuses UPsampling
    (area-averaging is a downsample; interpolation policy belongs to a
    real imaging library)."""
    width, height, channels, px = _png_pixels(payload)
    out = _resize_pixels(px, width, height, channels, out_w, out_h)
    return _png_encode(out, out_w, out_h, channels)


def _resize_pixels(px, width: int, height: int, channels: int,
                   out_w: int, out_h: int):
    """The area-average core of :func:`resize_png` on already-decoded
    pixels (shape (height, width × channels) → (out_h, out_w ×
    channels)) — factored out so a combined pipeline stage can decode
    once and feed both the resize and hash legs."""
    import math

    import numpy as np

    if out_w < 1 or out_h < 1 or out_w > width or out_h > height:
        raise ValueError(
            f"resize_png downsamples only: {width}x{height} -> "
            f"{out_w}x{out_h} is not a downsample"
        )
    cube = px.reshape(height, width, channels).astype(np.float64)

    def _bounds(n: int, k: int) -> list[int]:
        return [(i * n) // k for i in range(k + 1)]

    rb, cb = _bounds(height, out_h), _bounds(width, out_w)
    out = np.empty((out_h, out_w, channels), dtype=np.int64)
    for r in range(out_h):
        r0, r1 = rb[r], max(rb[r + 1], rb[r] + 1)
        for c in range(out_w):
            c0, c1 = cb[c], max(cb[c + 1], cb[c] + 1)
            cell = cube[r0:r1, c0:c1, :].mean(axis=(0, 1))
            out[r, c, :] = [int(math.floor(v + 0.5)) for v in cell]
    return out.reshape(out_h, out_w * channels)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """(id, payload, width, height) with every PNG payload REALLY
    resized via :func:`resize_png` — the resize stage of the
    decode/feature-extract/resize/frame-sample quartet, as an
    Arrow-batched ``mapInPandas``: payloads in and out stay on the
    executors, one Python worker sees columnar batches. The emitted
    width/height come from RE-DECODING the resized payload (not from
    the arguments), so a broken encoder can't silently claim
    success."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads, widths, heights = [], [], []
            for p in pdf[payload_col]:
                rp = resize_png(bytes(p), out_w, out_h)
                w, h, _ch, _px = _png_pixels(rp)
                payloads.append(rp)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_t}, payload binary, width int, height int"
    )


def image_pipeline_stage(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """ONE Arrow pass decoding each image ONCE and emitting everything
    the media pipeline's downstream legs need: ``(id, phash,
    res_payload, mean_orig)`` — the 64-bit dHash (census leg) and the
    area-average-resized re-encoded PNG plus the original's mean
    sample (resize leg), both computed from the SAME decoded pixel
    matrix.

    This is the composition discipline ``q_pipeline_media`` proves:
    without a shared stage, composing ``phash_hashes`` +
    ``resize_images`` would decode the corpus twice (and a band
    self-join over an unmaterialized stage would decode it once PER
    SIDE — the localCheckpoint lesson). Callers materialize this
    stage's output before any self-join. At 100 TB the decode is the
    dominant cost; paying it exactly once is the difference between a
    pipeline and a pile of operators."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            hashes, payloads, means = [], [], []
            for p in pdf[payload_col]:
                w, h, ch, px = _png_pixels(bytes(p))
                hashes.append(_dhash_from_pixels(w, h, ch, px))
                res = _resize_pixels(px, w, h, ch, out_w, out_h)
                payloads.append(_png_encode(res, out_w, out_h, ch))
                means.append(float(px.mean()) / 255.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "phash": hashes,
                    "res_payload": payloads,
                    "mean_orig": means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} {id_t}, phash long, res_payload binary, mean_orig double",
    )


def png_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, width, height, n_channels, mean_byte) via the REAL PNG
    decoder over a binary column — the image projection of
    ``decode_media(decoder="real")`` without requiring the media_type
    plumbing (for frames already known to be PNG)."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [_parse_png(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_channels", "mean_byte"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} {id_t}, width int, height int, n_channels int, mean_byte double",
    )


# ------------------------------------------------- animated PNG (APNG)
#
# The REAL multi-frame container for the frame-sampling leg: APNG is
# plain PNG plus three chunk types (acTL/fcTL/fdAT — the public APNG
# spec, now folded into the W3C PNG 3 standard), so the existing chunk
# walker, zlib inflate, scanline unfilter, and encoder all carry over.
# Reference parity note: the reference engine has no media codecs at
# all; this closes OUR SURVEY §2 multimodal quartet (decode / features
# / resize / frame-sample) with frame sampling value-checked through a
# real container rather than byte-offset pseudo-frames.


def _apng_encode(frames, width: int, height: int, channels: int) -> bytes:
    """Minimal REAL APNG encoder over the :func:`_png_encode` subset:
    8-bit non-interlaced full-canvas frames, each carried as its own
    complete zlib stream (frame 0 in IDAT, later frames in one fdAT
    each), fcTL/fdAT sequence numbers sharing the spec's single
    counter. ``frames`` is a list of (height, width × channels) pixel
    arrays."""
    import struct
    import zlib

    import numpy as np

    if not frames:
        raise ValueError("APNG needs at least one frame")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels

    def _zstream(px) -> bytes:
        arr = np.asarray(px, dtype=np.int64)
        if arr.shape != (height, stride):
            raise ValueError(
                f"frame shape {arr.shape} != ({height}, {stride})"
            )
        body = arr.astype(np.uint8).tobytes()
        raw = b"".join(
            b"\x00" + body[r * stride : (r + 1) * stride]
            for r in range(height)
        )
        return zlib.compress(raw)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, px in enumerate(frames):
        # full-canvas frame control: offsets 0, 1/10s delay,
        # dispose_op 0 (none), blend_op 0 (source)
        out += _png_chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq, width, height, 0, 0, 1, 10, 0, 0),
        )
        seq += 1
        if i == 0:
            out += _png_chunk(b"IDAT", _zstream(px))
        else:
            out += _png_chunk(
                b"fdAT", struct.pack(">I", seq) + _zstream(px)
            )
            seq += 1
    return out + _png_chunk(b"IEND", b"")


def _apng_frames(payload: bytes):
    """REAL APNG frame decode: chunk walk collecting acTL / fcTL /
    IDAT / fdAT, then each frame's zlib stream is re-wrapped as a
    standalone PNG and decoded through :func:`_png_pixels` — one
    decoder for stills and animation frames, same supported subset,
    same loud ValueError outside it. Returns
    ``(width, height, channels, [frame pixel arrays])``.

    Supported: full-canvas frames (offsets 0, frame dims == canvas
    dims) with blend_op source — frames that ARE complete images, so
    no compositing state machine; region updates / over-blending raise
    (loudly, not a guess), like every other parser subset here. The
    shared fcTL/fdAT sequence counter is validated: a container with
    reordered or missing chunks raises instead of yielding frames from
    the wrong stream."""
    sig = b"\x89PNG\r\n\x1a\n"
    if len(payload) < len(sig) + 25 or payload[: len(sig)] != sig:
        raise ValueError("not a PNG payload")
    pos = len(sig)
    ihdr = None
    actl_frames = None
    fctls: list[tuple[int, tuple[int, ...]]] = []  # (seq, fields)
    streams: list[bytearray] = []  # per-frame zlib bytes
    seqs: list[int] = []  # every fcTL/fdAT sequence number, in file order
    saw_idat = False
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"acTL":
            if len(body) < 8:
                raise ValueError("truncated acTL chunk")
            actl_frames = int.from_bytes(body[0:4], "big")
        elif ctype == b"fcTL":
            if len(body) < 26:
                raise ValueError("truncated fcTL chunk")
            seq = int.from_bytes(body[0:4], "big")
            fields = tuple(
                int.from_bytes(body[o : o + 4], "big")
                for o in (4, 8, 12, 16)
            ) + (body[24], body[25])  # w, h, x, y, dispose, blend
            fctls.append((seq, fields))
            seqs.append(seq)
            streams.append(bytearray())
        elif ctype == b"IDAT":
            saw_idat = True
            if streams:  # animation frame 0 (fcTL precedes IDAT)
                streams[0] += body
        elif ctype == b"fdAT":
            if len(body) < 4:
                raise ValueError("truncated fdAT chunk")
            if not streams:
                raise ValueError("fdAT before any fcTL")
            seqs.append(int.from_bytes(body[0:4], "big"))
            streams[-1] += body[4:]
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    if actl_frames is None:
        raise ValueError("not an APNG (no acTL chunk)")
    if not saw_idat:
        raise ValueError("missing IDAT chunk")
    if len(fctls) != actl_frames:
        raise ValueError(
            f"acTL declares {actl_frames} frames but {len(fctls)} fcTL "
            "chunks present"
        )
    if seqs != list(range(len(seqs))):
        raise ValueError(
            f"fcTL/fdAT sequence numbers {seqs} are not the spec's "
            "contiguous shared counter — reordered or missing chunks"
        )
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    frames = []
    for (_, (fw, fh, fx, fy, _disp, blend)), stream in zip(fctls, streams):
        if (fw, fh, fx, fy) != (width, height, 0, 0) or blend != 0:
            raise ValueError(
                "unsupported APNG frame: only full-canvas source-blend "
                f"frames are decoded here (got {fw}x{fh}+{fx}+{fy} "
                f"blend={blend})"
            )
        if not stream:
            raise ValueError("APNG frame with empty data stream")
        frame_png = (
            sig
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", bytes(stream))
            + _png_chunk(b"IEND", b"")
        )
        w, h, ch, px = _png_pixels(frame_png)
        frames.append(px)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ihdr[9]]
    return width, height, ch, frames


def apng_frame_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    sample_every: int = 2,
    max_frames: int = 4,
) -> DataFrame:
    """REAL frame sampling: decode the APNG container, keep every
    ``sample_every``-th frame up to ``max_frames``, and emit one row
    per SAMPLED frame with its real per-frame statistics —
    ``(id, n_frames, frame_idx, width, height, mean_e4)`` where
    ``mean_e4 = floor(mean_sample / 255 * 10000 + 0.5)`` as a BIGINT
    (the e-notation integer recipe, no float hash exposure). The frame
    index set comes from the container's REAL frame count, unlike the
    byte-offset plumbing of :func:`frame_sample`.

    Scale shape: one map-only Arrow pass — container bytes never
    shuffle, each output row is five fixed-width columns. At 100 TB of
    video-class media this is the decode-side sampling stage; a
    production build swaps an ffmpeg-class decoder into the same
    mapInPandas slot (same sampling policy, same output schema)."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ch, frames = _apng_frames(bytes(p))
                n = len(frames)
                for fi in list(range(0, n, sample_every))[:max_frames]:
                    mean = float(frames[fi].mean()) / 255.0
                    rows.append(
                        (i, n, fi, w, h, int(mean * 10000 + 0.5))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "frame_idx", "width", "height",
                    "mean_e4",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} {id_t}, n_frames int, frame_idx int, width int, "
        "height int, mean_e4 long",
    )


def apng_frame_hashes(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    frame_stride: int = 16,
) -> DataFrame:
    """Frame-LEVEL perceptual fingerprints from a real multi-frame
    container: one output row per frame with ``(id, frame_idx, node,
    fhash)`` where ``fhash`` is the frame's 64-bit dHash and ``node =
    id · frame_stride + frame_idx`` is the composite node id the
    downstream band join / components machinery keys on (the frame
    population becomes first-class dedup citizens, the shape real
    video dedup takes: fingerprint frames, group them, elect keepers).
    Containers with ≥ ``frame_stride`` frames raise — a silent
    composite-id collision would corrupt the pair graph.

    One map-only Arrow pass: each container is decoded ONCE and all
    its frames hashed from the same walk; payload bytes never shuffle;
    downstream carries 16-byte (node, hash) rows."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, ch, frames = _apng_frames(bytes(p))
                if len(frames) >= frame_stride:
                    raise ValueError(
                        f"container {i} has {len(frames)} frames >= "
                        f"frame_stride {frame_stride}: composite node "
                        "ids would collide — raise frame_stride"
                    )
                for fi, px in enumerate(frames):
                    rows.append(
                        (
                            i,
                            fi,
                            int(i) * frame_stride + fi,
                            _dhash_from_pixels(w, h, ch, px),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "node", "fhash"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_t}, frame_idx int, node long, fhash long"
    )


def synth_apng_group(doc_id: int, size: int = 16) -> bytes:
    """Multi-frame APNG fixture with PLANTED frame-level near-dup
    structure (the ``synth_png`` design lifted to containers):
    ``2 + (doc_id // 2) % 3`` frames of md5-derived pixels keyed by
    ``(doc_id // 2, frame_idx)`` — so the (even, odd) doc pair holds
    frame-wise near-duplicates (odd docs perturb one pixel per frame →
    dHash hamming ≤ 1 per frame pair) while frames WITHIN a doc and
    across groups are unrelated random images (expected hamming ~32).
    Anchors ``q_dedup_frames``' SQL-expressible planted pair set."""
    import hashlib

    import numpy as np

    group = int(doc_id) // 2
    n_frames = 2 + group % 3
    frames = []
    for f in range(n_frames):
        px = bytearray()
        for r in range(size):
            px += hashlib.md5(f"fhash_{group}_{f}_{r}".encode()).digest()[:size]
        if int(doc_id) % 2 == 1:
            px[0] = (px[0] + 16) % 256
        arr = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64)
        frames.append(arr.reshape(size, size))
    return _apng_encode(frames, size, size, 1)


def _attach_fixture(df: DataFrame, id_col: str, fixture_fn) -> DataFrame:
    """Shared (id, payload) fixture-attach plumbing: one Arrow
    ``mapInPandas`` pass building ``fixture_fn(id)`` payloads on the
    EXECUTORS (never the driver), fed by an id-projection repartition.

    The repartition is load-bearing: a single-file parquet scan
    arrives as ONE partition, which would serialize every downstream
    Arrow decode stage on one core (measured 3.5x on the sf0.1
    pipeline stage). The partition count must be EXPLICIT — a bare
    ``repartition(col)`` lets AQE coalesce the tiny id shuffle back to
    one partition (it sizes by shuffle bytes and cannot see the
    per-row Python decode cost downstream; measured: 1 partition, the
    exact serialization this exists to prevent). Production media
    comes pre-split from binaryFile; this shuffles 8-byte ids, never
    payloads."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": [fixture_fn(int(i)) for i in pdf[id_col]],
                }
            )

    n = df.sparkSession.sparkContext.defaultParallelism
    return df.select(id_col).repartition(n, id_col).mapInPandas(
        run, f"{id_col} {id_t}, payload binary"
    )


def attach_synth_apng_group(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_apng_group` fixtures — see
    :func:`_attach_fixture` for the shared executor-side plumbing."""
    return _attach_fixture(df, id_col, synth_apng_group)


def synth_apng(doc_id: int, size: int = 16) -> bytes:
    """Deterministic multi-frame APNG fixture: ``2 + doc_id % 3``
    full-canvas grayscale frames; frame ``f`` is the horizontal
    gradient ``pixel(x, y) = base + (x % 8)`` with
    ``base = (7·doc_id + 13·f) % 200`` — so each frame's real decoded
    mean is EXACTLY ``base + 3.5`` (the x%8 gradient averages to 3.5
    over any width that is a multiple of 8) and the whole container →
    frames → statistics pipeline is SQL-expressible from doc_id
    arithmetic alone. Used by ``q_multimodal_frames_real`` the way
    ``synth_png`` anchors ``q_dedup_phash``."""
    import numpy as np

    if size % 8 != 0:
        raise ValueError("size must be a multiple of 8 for the exact mean")
    n_frames = 2 + int(doc_id) % 3
    xs = np.arange(size, dtype=np.int64) % 8
    frames = []
    for f in range(n_frames):
        base = (7 * int(doc_id) + 13 * f) % 200
        frames.append(np.tile(base + xs, (size, 1)))
    return _apng_encode(frames, size, size, 1)


def attach_synth_apng(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_apng` fixtures — the
    animated-media corpus stand-in; plumbing in :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_apng)


def synth_png(doc_id: int, size: int = 16) -> bytes:
    """Deterministic 8-bit grayscale PNG fixture: md5-derived pixels
    keyed by ``doc_id // 2``, with odd ids perturbing one pixel — so
    consecutive (even, odd) ids form planted near-duplicate pairs
    (dHash hamming ≤ 1: the perturbed pixel feeds exactly one grid
    cell, hence at most one neighbor comparison) while distinct
    groups are unrelated random images (expected hamming ~32). Used
    by ``q_dedup_phash`` to exercise the REAL decoder + fingerprint +
    band join end-to-end against a SQL-expressible planted pair set,
    and by the planted-PNG pytest."""
    import hashlib

    import numpy as np

    group = int(doc_id) // 2
    px = bytearray()
    for r in range(size):
        px += hashlib.md5(f"phash_{group}_{r}".encode()).digest()[:size]
    if int(doc_id) % 2 == 1:
        px[0] = (px[0] + 16) % 256
    arr = np.frombuffer(bytes(px), dtype=np.uint8).astype(np.int64)
    return _png_encode(arr.reshape(size, size), size, size, 1)


def attach_synth_png(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_png` fixtures — the image-corpus
    stand-in this container can't produce from real files (no image
    libs to ENCODE anything richer; the DECODE side is the real
    dependency-free parser); plumbing in :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_png)


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic baseline-JPEG fixture: a 72×64 grayscale image of
    constant 8×8 blocks (one per dHash grid cell — 9 cols × 8 rows)
    with md5-derived levels keyed by ``doc_id // 2``, odd ids bumping
    block (0, 0)'s level — so consecutive (even, odd) ids are planted
    near-duplicates (dHash hamming ≤ 1: the bumped block feeds exactly
    one neighbor comparison) while distinct groups are unrelated
    (expected hamming ~32). Encoded through the REAL encoder
    (:func:`~flink_join_scaling_spark.operators.jpeg_codec.
    jpeg_encode_gray`) with an all-ones quantization table: constant
    blocks are DC-only, so the lossy round trip reconstructs them
    EXACTLY (value-tested) and the planted pair set survives
    compression — the property that makes ``q_dedup_phash_jpeg``'s
    oracle statable. The JPEG twin of :func:`synth_png`."""
    from flink_join_scaling_spark.operators.jpeg_codec import jpeg_encode_gray

    return jpeg_encode_gray(_synth_block_image(int(doc_id)), 72, 64)


def _synth_block_image(doc_id: int):
    """The constant-block planted image shared by :func:`synth_jpeg`
    and :func:`synth_mixed`: a 72×64 grid of 8×8 constant blocks (one
    per dHash cell, 9 cols × 8 rows) with md5-derived levels keyed by
    ``doc_id // 2``, odd ids bumping block (0, 0)'s level — returned
    as a (64, 72) int64 array both encoders accept."""
    import hashlib

    import numpy as np

    group = doc_id // 2
    levels = np.array(
        [
            [
                hashlib.md5(f"jphash_{group}_{r}_{c}".encode()).digest()[0]
                for c in range(9)
            ]
            for r in range(8)
        ],
        dtype=np.int64,
    )
    if doc_id % 2 == 1:
        levels[0, 0] = (levels[0, 0] + 16) % 256
    return np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)  # 64×72


def synth_mixed(doc_id: int) -> bytes:
    """Cross-CODEC fixture: the same constant-block image content as
    :func:`synth_jpeg` (md5 grid keyed by ``doc_id // 2``, odd ids
    bumping block (0, 0)) — but encoded as PNG for even ids and
    baseline JPEG for odd ids, so every planted near-duplicate pair
    STRADDLES the two formats. Constant 8×8 blocks are DC-only under
    the all-ones quantizer, so both codecs reconstruct the pixels
    exactly and the cross-codec dHash distance equals the
    same-codec distance (≤ 1 within a pair, ~32 across groups) —
    pinned by ``test_dhash64_magic_dispatch_png_vs_jpeg``. This is
    the real crawled-corpus scenario: the same image re-hosted in a
    different format must still dedup."""
    from flink_join_scaling_spark.operators.jpeg_codec import jpeg_encode_gray

    img = _synth_block_image(int(doc_id))
    if int(doc_id) % 2 == 0:
        return _png_encode(img, 72, 64, 1)
    return jpeg_encode_gray(img, 72, 64)


def attach_synth_mixed(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_mixed` fixtures — the mixed
    PNG/JPEG corpus attach; plumbing in :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_mixed)


def synth_progressive(doc_id: int) -> bytes:
    """Cross-ENTROPY-CODING fixture (r13): the planted block image —
    md5 levels keyed by ``doc_id // 2`` over a fixed in-block texture,
    odd ids bumping block (0, 0)'s level — encoded BASELINE for even
    ids and PROGRESSIVE (SOF2: successive approximation + spectral
    selection) for odd ids, so every planted near-duplicate pair
    straddles the two entropy codings: the crawled-corpus reality
    where the same image is saved once sequential, once progressive.

    The texture (identical in every block) puts real nonzero AC
    coefficients through the progressive first-pass AND refinement
    scans; it cannot perturb the pair structure because (a) baseline
    and progressive decode the SAME quantized coefficients to
    bit-identical pixels (pinned by the codec parity suites), and
    (b) within a pair only block (0, 0) differs, so all other dHash
    cells decode identically in both members — pair hamming ≤ 1,
    cross-group ~32, exactly the ``synth_jpeg`` geometry."""
    from flink_join_scaling_spark.operators.jpeg_codec import (
        jpeg_encode_gray,
        jpeg_encode_progressive_gray,
    )

    img = _synth_textured_image(int(doc_id))
    if int(doc_id) % 2 == 0:
        return jpeg_encode_gray(img, 72, 64)
    return jpeg_encode_progressive_gray(img, 72, 64)


def _synth_textured_image(doc_id: int):
    """The textured planted image behind :func:`synth_progressive`:
    :func:`_synth_block_image`'s md5 level grid (compressed to
    [16, 215] so the bump and texture stay in gamut) plus a fixed
    per-block texture ``((3x + 5y) mod 7) · 4`` ∈ [0, 24] tiled over
    every 8×8 block — the same offset pattern in every dHash cell, so
    cell-mean ORDER relations (hence the planted dHash structure) are
    exactly the level grid's, while the JPEG blocks carry real AC
    energy through the entropy coders."""
    import hashlib

    import numpy as np

    group = doc_id // 2
    levels = np.array(
        [
            [
                hashlib.md5(f"jpprog_{group}_{r}_{c}".encode()).digest()[0]
                % 200 + 16
                for c in range(9)
            ]
            for r in range(8)
        ],
        dtype=np.int64,
    )
    if doc_id % 2 == 1:
        levels[0, 0] += 16  # ≤ 231; +24 texture peaks at 255
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1)  # 64×72
    yy, xx = np.mgrid[0:8, 0:8]
    texture = ((3 * xx + 5 * yy) % 7) * 4
    return img + np.tile(texture, (8, 9))


def attach_synth_progressive(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_progressive` fixtures — the
    baseline/progressive cross-coding corpus attach; plumbing in
    :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_progressive)


def attach_synth_jpeg(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_jpeg` fixtures — the JPEG twin of
    :func:`attach_synth_png`; plumbing in :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_jpeg)


# ------------------------------------------------- audio fingerprinting


def _wav_samples(payload: bytes):
    """Mono float64 PCM samples behind :func:`_parse_wav`: decode the
    RIFF chunks with the same walk/validation, mix channels down by
    mean, and return ``(sample_rate, samples, bits)`` where samples
    are centered amplitudes (value − 128 for 8-bit, raw for 16-bit)
    and ``bits`` is the source bit depth (8 or 16) — returned so
    requantizing consumers (:func:`resample_wav`,
    :func:`audio_pipeline_stage`) derive their 16→8 scale from the
    SAME chunk walk instead of re-walking RIFF (a second walk could
    drift and silently take the no-rescale path on 16-bit input).
    Factored for sample-consuming operators (the audio fingerprint);
    same supported subset, same loud ValueError outside it."""
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
        pos += 8 + size + (size & 1)
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
    if usable == 0:
        return sample_rate, np.zeros(0, dtype=np.float64), bits
    if bits == 16:
        s = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
    else:
        s = np.frombuffer(data[:usable], dtype="u1").astype(np.float64) - 128.0
    mono = s.reshape(-1, channels).mean(axis=1)
    return sample_rate, mono, bits


def audiohash64(payload: bytes) -> int:
    """64-bit audio energy-envelope fingerprint over the REAL WAV
    decoder's samples: mono mixdown, 65 equal-measure time windows
    (boundaries ``floor(i·n/65)`` — the dHash grid rule on the time
    axis), mean |amplitude| per window, one bit per neighboring-window
    comparison (bit = earlier < later). Re-encoded, slightly-edited,
    or level-tweaked audio lands within a few bits; unrelated audio
    differs in ~32 — the property the banded candidate join
    (:func:`~flink_join_scaling_spark.operators.dedup.
    audiohash_dedup_pairs`) needs. Signed 64-bit like the dHash.
    Raises the decoder's loud ValueError outside the supported subset
    or when there are fewer samples than windows."""
    _rate, mono, _bits = _wav_samples(payload)
    return _audiohash_from_samples(mono)


def _audiohash_from_samples(mono) -> int:
    """The fingerprint core of :func:`audiohash64` on already-decoded
    mono samples — factored (like :func:`_dhash_from_pixels`) so the
    composed audio pipeline stage decodes each clip ONCE."""
    import numpy as np

    n = len(mono)
    if n < 65:
        raise ValueError(f"audiohash64 needs >= 65 samples, got {n}")
    bounds = [(i * n) // 65 for i in range(66)]
    env = np.empty(65, dtype=np.float64)
    absx = np.abs(mono)
    for w in range(65):
        lo, hi = bounds[w], max(bounds[w + 1], bounds[w] + 1)
        env[w] = absx[lo:hi].mean()
    bits = 0
    for w in range(64):
        bits = (bits << 1) | int(env[w] < env[w + 1])
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audiohash_hashes(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, audiohash) via Arrow-batched :func:`audiohash64` — the
    audio twin of :func:`phash_hashes`; payload bytes never leave the
    executor."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "audiohash": [
                        audiohash64(bytes(p)) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_t}, audiohash long"
    )


def _wav_encode_u8(samples, sample_rate: int) -> bytes:
    """Minimal REAL WAV encoder: 8-bit unsigned mono PCM — the inverse
    of the subset :func:`_wav_samples` decodes, so resample output
    round-trips through the same decoder. ``samples`` are uint8
    values (bias-128 representation, the 8-bit WAV convention)."""
    import struct

    import numpy as np

    arr = np.asarray(samples)
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("8-bit WAV samples must be in [0, 255]")
    data = arr.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def resample_wav(payload: bytes, factor: int) -> bytes:
    """REAL audio downsample: decode (:func:`_wav_samples` — RIFF walk
    + PCM mixdown to centered mono float), average non-overlapping
    ``factor``-sample blocks (the area-average rule on the time axis —
    the boxcar-decimate every DSP pipeline starts from), SQL-half-up
    round back to bias-128 uint8, re-encode 8-bit mono at
    ``rate // factor`` (:func:`_wav_encode_u8`). A trailing partial
    block is dropped (standard decimation truncation, documented).
    Entirely stdlib + NumPy, deterministic; raises the decoder's loud
    ValueError outside the supported subset and refuses UPsampling
    (interpolation policy belongs to a real resampler — the
    ``resize_png`` stance on the time axis)."""
    # requantization scale: _wav_samples centers but does not rescale,
    # so 16-bit samples arrive in ±32768 units — a bias-128 re-encode
    # without the >>8 would clip them to garbage.
    rate, mono, bits = _wav_samples(payload)
    return _resample_encode(mono, rate, factor, 256.0 if bits == 16 else 1.0)


def _resample_encode(mono, rate: int, factor: int, scale: float) -> bytes:
    """The decimate+requantize core of :func:`resample_wav` on
    already-decoded mono samples (factored like
    :func:`_audiohash_from_samples` for the composed audio stage):
    block-average, divide by ``scale`` (256 for 16-bit sources — the
    standard 16→8 requantization), bias-128 half-up to uint8, encode
    at ``rate // factor``."""
    import math

    import numpy as np

    if factor < 1 or (len(mono) and factor > len(mono)):
        raise ValueError(
            f"resample_wav downsamples only: factor {factor} vs "
            f"{len(mono)} samples is not a downsample"
        )
    n_blocks = len(mono) // factor
    blocks = mono[: n_blocks * factor].reshape(n_blocks, factor).mean(axis=1)
    u8 = np.array(
        [int(math.floor(v / scale + 128.0 + 0.5)) for v in blocks],
        dtype=np.int64,
    )
    u8 = np.clip(u8, 0, 255)
    return _wav_encode_u8(u8, rate // factor)


def resample_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    factor: int = 4,
) -> DataFrame:
    """(id, payload, sample_rate, n_frames) with every WAV payload
    REALLY decimated via :func:`resample_wav` — the audio twin of
    :func:`resize_images`, Arrow-batched; the emitted rate/frames come
    from RE-DECODING the resampled payload (not from arithmetic), so a
    broken encoder can't silently claim success. Payloads in and out
    stay on the executors."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads, rates, frames = [], [], []
            for p in pdf[payload_col]:
                rp = resample_wav(bytes(p), factor)
                rate, n, _ch, _mean = _parse_wav(rp)
                payloads.append(rp)
                rates.append(rate)
                frames.append(n)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": payloads,
                    "sample_rate": rates,
                    "n_frames": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_t}, payload binary, sample_rate int, n_frames int"
    )


def audio_pipeline_stage(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    factor: int = 4,
) -> DataFrame:
    """ONE Arrow pass decoding each clip ONCE and emitting both audio
    legs' inputs: ``(id, audiohash, res_payload, mean_orig)`` — the
    64-bit envelope fingerprint (census leg) and the boxcar-decimated
    re-encoded WAV plus the original's raw mean |amplitude| (resample
    leg), both computed from the SAME decoded sample vector. The audio
    twin of :func:`image_pipeline_stage`; same discipline — callers
    materialize before any self-join, the corpus is decoded exactly
    once. ``mean_orig`` is in centered 8-bit sample units for EVERY
    source depth: 16-bit clips are requantized by the same 256 scale
    :func:`resample_wav` applies (derived from the decoder's own bit
    depth, not re-walked), so the resample leg's payload and the
    invariant consumer's comparison stay value-identical to the
    standalone operators on both 8- and 16-bit input."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            hashes, payloads, means = [], [], []
            for p in pdf[payload_col]:
                rate, mono, bits = _wav_samples(bytes(p))
                scale = 256.0 if bits == 16 else 1.0
                hashes.append(_audiohash_from_samples(mono))
                payloads.append(_resample_encode(mono, rate, factor, scale))
                means.append(float(np.abs(mono).mean() / scale))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "audiohash": hashes,
                    "res_payload": payloads,
                    "mean_orig": means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} {id_t}, audiohash long, res_payload binary, "
        "mean_orig double",
    )


def wav_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, sample_rate, n_frames, n_channels, mean_abs) via the REAL
    WAV decoder over a binary column — the audio projection of
    ``decode_media(decoder="real")`` without the media_type plumbing
    (for payloads already known to be WAV; the :func:`png_features`
    twin)."""
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [_parse_wav(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                feats,
                columns=["sample_rate", "n_frames", "n_channels", "mean_abs"],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} {id_t}, sample_rate int, n_frames int, n_channels int, "
        "mean_abs double",
    )


def synth_wav(doc_id: int, n_windows: int = 65, window: int = 32) -> bytes:
    """Deterministic 8-bit PCM mono WAV fixture: each of the 65
    envelope windows holds a constant md5-derived level keyed by
    ``doc_id // 2``, with odd ids bumping one window's level — so
    consecutive (even, odd) ids are planted near-duplicates
    (audiohash hamming ≤ 2: one window feeds two neighbor
    comparisons) while distinct groups are unrelated (expected
    hamming ~32). The audio twin of :func:`synth_png`, used by
    ``q_dedup_audiohash`` and the planted-WAV pytest."""
    import hashlib
    import struct

    group = int(doc_id) // 2
    levels = [
        hashlib.md5(f"audio_{group}_{w}".encode()).digest()[0]
        for w in range(n_windows)
    ]
    if int(doc_id) % 2 == 1:
        levels[0] = (levels[0] + 8) % 256
    data = bytes(v for v in levels for _ in range(window))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def attach_synth_wav(df: DataFrame, id_col: str) -> DataFrame:
    """(id, payload) of :func:`synth_wav` fixtures — the audio-corpus
    stand-in; plumbing in :func:`_attach_fixture`."""
    return _attach_fixture(df, id_col, synth_wav)
