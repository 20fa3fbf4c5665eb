"""Sequential + progressive JPEG codec — stdlib + NumPy, no libjpeg.

Closes the last media-codec gate with real user pull (r11 verdict
task 3): image dedup (``q_dedup_phash``-family) previously decoded
PNG/APNG only, while ~90% of crawled images are baseline JPEG. This
module implements the honest subset end to end:

- **Decoder** (:func:`jpeg_pixels`): marker walk (DQT / DHT / SOF0-2 /
  SOS / DRI), Huffman entropy decode with 0xFF00 unstuffing and RSTn
  restart handling, dequantize, inverse zigzag, 8×8 integer IDCT,
  level shift, chroma upsampling for sampling factors up to 2×2
  (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr→RGB. Grayscale (1 component)
  and color (3 components) frames. Both baseline/extended SEQUENTIAL
  (SOF0/SOF1, single interleaved scan) and PROGRESSIVE (SOF2, r13):
  multi-scan spectral selection + successive approximation per ITU
  T.81 Annex G — DC first/refinement scans (interleaved or not), AC
  first scans with EOB-run coding, AC refinement scans with
  correction bits, with the per-coefficient Al-progression validated
  across scans (a file that skips a band or repeats a pass refuses
  loudly instead of producing silently-wrong pixels). Arithmetic
  coding, lossless/hierarchical frames, 12-bit precision, and
  4-component CMYK raise a loud ValueError (the PNG subset stance).

- **Encoder** (:func:`jpeg_encode_gray` / :func:`jpeg_encode_ycbcr` /
  :func:`jpeg_encode_progressive_gray` /
  :func:`jpeg_encode_progressive_ycbcr`): forward DCT, quantization,
  and Huffman coding with the ITU T.81 Annex K typical tables — real
  bitstreams, so fixtures and tests round-trip through the real
  decoder (the ``synth_png`` / ``_wav_encode_u8`` discipline). The
  progressive encoders emit a real multi-scan script (DC at Al>0 +
  refinement, split spectral bands, two successive-approximation
  levels) with cross-block EOB-run accumulation and buffered
  correction bits, exercising every decoder scan kind.

Determinism: every DCT pass is an INTEGER matrix product evaluated as
a sum of eight int64 element-wise products (integer addition is
associative — no accumulation-order or BLAS variance), with
fixed-point cosine constants embedded as literals. Identical output
bits on every host, the property the value-level DuckDB oracle and
the banded dedup joins require.

Scale shape: the codec runs inside Arrow ``mapInPandas`` batches like
the PNG/WAV codecs — map-only, payload bytes never shuffle. The
pure-Python/NumPy constant is the documented swap-native-codecs-here
slot (SCALING.md); the Spark-side plumbing is identical either way.

Reference parity note: the reference repo has no media operators —
this module belongs to the LLM-data-pipeline extension surface
(SURVEY §2.3), not the Flink-join parity surface.
"""

from __future__ import annotations

import array
import functools
import struct

import numpy as np

# ---------------------------------------------------------- constants

#: Fixed-point 8-point DCT-II basis, scaled by 2**13:
#: M[x][u] = round(2^13 * c(u)/2 * cos((2x+1)·u·π/16)), c(0)=1/√2.
#: Embedded as literals (not math.cos at import) so the basis is
#: byte-identical on every host/libm.
_DCT_SCALE_BITS = 13
_IDCT_M = np.array(
    [
        [2896, 4017, 3784, 3406, 2896, 2276, 1567, 799],
        [2896, 3406, 1567, -799, -2896, -4017, -3784, -2276],
        [2896, 2276, -1567, -4017, -2896, 799, 3784, 3406],
        [2896, 799, -3784, -2276, 2896, 3406, -1567, -4017],
        [2896, -799, -3784, 2276, 2896, -3406, -1567, 4017],
        [2896, -2276, -1567, 4017, -2896, -799, 3784, -3406],
        [2896, -3406, 1567, 799, -2896, 4017, -3784, 2276],
        [2896, -4017, 3784, -3406, 2896, -2276, 1567, -799],
    ],
    dtype=np.int64,
)
#: Forward basis is the transpose (DCT-II matrix is orthogonal up to
#: the same scaling): F[u] = Σ_x M[x][u]·s[x] / 2^13.
_FDCT_M = _IDCT_M.T.copy()

#: Zigzag scan order (ITU T.81 Figure A.6): zigzag index → (row, col).
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])

# Annex K "typical" Huffman tables (ITU T.81 §K.3.3 — public
# standard data): (bits[1..16] code counts, huffval symbol list).
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


# ------------------------------------------------------ integer DCTs


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """8×8 inverse DCT over ``coeffs`` of shape (n, 8, 8) (int64,
    dequantized, natural order) → spatial samples (n, 8, 8) int64 in
    roughly [-128, 127] before level shift. Two separable passes;
    each pass is Σ over 8 INTEGER element-wise products (order-free),
    descaled round-to-nearest."""
    half = 1 << (_DCT_SCALE_BITS - 1)
    # pass 1 (columns): tmp[n, x, v] = Σ_u M[x, u] · coeffs[n, u, v]
    tmp = np.zeros_like(coeffs)
    for u in range(8):
        tmp += _IDCT_M[:, u].reshape(1, 8, 1) * coeffs[:, u : u + 1, :]
    tmp = (tmp + half) >> _DCT_SCALE_BITS
    # pass 2 (rows): out[n, x, y] = Σ_v M[y, v] · tmp[n, x, v]
    out = np.zeros_like(coeffs)
    for v in range(8):
        out += _IDCT_M[:, v].reshape(1, 1, 8) * tmp[:, :, v : v + 1]
    return (out + half) >> _DCT_SCALE_BITS


def _fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """Forward 8×8 DCT over level-shifted samples (n, 8, 8) int64 →
    coefficients (n, 8, 8) int64, the exact adjoint of
    :func:`_idct_blocks` (same fixed-point basis, same descale)."""
    half = 1 << (_DCT_SCALE_BITS - 1)
    tmp = np.zeros_like(samples)
    for x in range(8):
        tmp += _FDCT_M[:, x].reshape(1, 8, 1) * samples[:, x : x + 1, :]
    tmp = (tmp + half) >> _DCT_SCALE_BITS
    out = np.zeros_like(samples)
    for y in range(8):
        out += _FDCT_M[:, y].reshape(1, 1, 8) * tmp[:, :, y : y + 1]
    return (out + half) >> _DCT_SCALE_BITS


# ------------------------------------------------------------ decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-stuffed marker (the caller handles
    RSTn)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # Refill deep (>40 bits) and consume PLAIN byte runs in bulk:
        # between 0xFF boundaries the stream needs no unstuffing, so
        # `find` + `int.from_bytes` replace a Python-level per-byte
        # loop and the refill runs ~2x less often (together with the
        # fused peek/skip ops: ~1.1-1.2x whole-decode by alternating
        # A/B, strongest on dense payloads). Invariant preserved: pos
        # never advances past a real marker, and only consumed DATA
        # bytes advance it.
        d = self.data
        n = len(d)
        pos = self.pos
        # drop consumed garbage above nbits ONCE per refill — the
        # per-symbol consumers no longer mask acc after each take
        # (they mask at extraction), which saves one big-int op per
        # symbol in the entropy hot loops
        acc = self.acc & ((1 << self.nbits) - 1)
        nbits = self.nbits
        while nbits <= 40:
            if pos >= n:
                # pad with 1-bits per T.81 §F.2.2.5 (end of scan)
                acc = (acc << 8) | 0xFF
                nbits += 8
                continue
            if d[pos] == 0xFF:
                nxt = d[pos + 1] if pos + 1 < n else 0xD9
                if nxt == 0x00:
                    pos += 2  # stuffed 0xFF data byte
                    acc = (acc << 8) | 0xFF
                    nbits += 8
                    continue
                # a real marker: pad without consuming it
                acc = (acc << 8) | 0xFF
                nbits += 8
                continue
            end = d.find(0xFF, pos, pos + 6)
            if end < 0:
                end = min(pos + 6, n)
            k = end - pos
            acc = (acc << (8 * k)) | int.from_bytes(d[pos:end], "big")
            nbits += 8 * k
            pos = end
        self.pos = pos
        self.acc = acc
        self.nbits = nbits

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def read(self, n: int) -> int:
        # the entropy hot path: one attribute round-trip, no self.skip
        # call — part of the r13 fused-bit-ops pass (alternating A/B:
        # ~1.1-1.2x whole-decode, call dispatch was the cost)
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        nb = self.nbits - n
        v = (self.acc >> nb) & ((1 << n) - 1)
        self.nbits = nb
        return v

    def align_to_marker(self) -> int:
        """Drop partial byte, expect and consume a marker; return its
        second byte (e.g. 0xD0-0xD7 for RSTn)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected a restart marker in scan data")
        m = d[self.pos + 1]
        self.pos += 2
        return m


@functools.lru_cache(maxsize=64)
def _huff_lut(bits: tuple, vals: tuple) -> array.array:
    """16-bit-prefix decode LUT per T.81 §C.2/F.16: entry ``w`` packs
    ``(symbol << 5) | code_length`` for the canonical code that
    prefixes the 16-bit word ``w`` (-1 = invalid prefix), so a decode
    is ONE ``peek16`` + one index + a skip. Cached per distinct
    (bits, vals) table across payloads — in-repo encoders emit a
    fixed table set, but real crawled JPEGs commonly carry per-image
    OPTIMIZED tables, so the cache must tolerate churn: the LUT is a
    stdlib ``array('i')`` (256 KB — a worst-case-full cache is ~17 MB
    per worker, vs ~150 MB as Python lists) built by one memcpy from
    the numpy fill (``frombytes``); scalar ``array`` indexing matches
    plain-list speed in the decode hot loop (measured, r13)."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (vals[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = array.array("i")
    out.frombytes(lut.tobytes())
    return out


def _build_huff(bits: list[int], vals: list[int]) -> array.array:
    return _huff_lut(tuple(bits), tuple(vals))


def _huff_decode(br: _BitReader, table: array.array) -> int:
    # fused peek16+skip: this runs once per Huffman symbol, and the
    # 3-call form (peek16 → index → skip) spent more on CPython call
    # dispatch than on the decode itself (r13 A/B: the fused-ops pass
    # is worth ~1.1-1.2x of the whole decode)
    if br.nbits < 16:
        br._fill()
    nb = br.nbits
    packed = table[(br.acc >> (nb - 16)) & 0xFFFF]
    if packed < 0:
        raise ValueError("invalid Huffman code in JPEG scan")
    nb -= packed & 31
    br.nbits = nb
    return packed >> 5


def _extend(v: int, t: int) -> int:
    """DIFF/AC value extension (T.81 §F.2.2.1): t-bit magnitude v →
    signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(payload: bytes):
    """REAL JPEG decode (baseline/extended sequential AND progressive):
    returns ``(width, height, channels, px)`` with ``px`` an int64
    array of shape (height, width·channels) in [0, 255] — the
    :func:`.multimodal._png_pixels` contract, so every pixel consumer
    (dHash, resize, features) runs unchanged on JPEG payloads.
    Supported subset documented in the module docstring; everything
    else raises a loud ValueError / NotImplementedError."""
    n = len(payload)
    if n < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (width, height, [(cid, h, v, tq)])
    progressive = False
    prog = None  # progressive coefficient state (built at first SOS)
    restart_interval = 0
    pos = 2
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG marker stream at byte {pos}")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment body")
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8)
                    i += 64
                elif pq == 1:
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2")
                    i += 128
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
                if len(vals) < 64 or not vals.all():
                    # T.81 forbids zero quantizer entries; a zero here
                    # would silently zero coefficients downstream —
                    # the silent-wrong-pixels failure this module
                    # refuses by convention
                    raise ValueError(
                        "JPEG DQT table is truncated or contains zero "
                        "entries"
                    )
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals.astype(np.int64)
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                i += 17 + nv
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if body[0] != 8:
                raise ValueError(f"unsupported JPEG precision {body[0]}")
            if frame is not None:
                raise ValueError("multiple SOF frames in one JPEG")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {nc} (grayscale "
                    "and YCbCr only; CMYK is out of the decoded subset)"
                )
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            frame = (width, height, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only sequential/progressive Huffman JPEG is decoded "
                f"(SOF marker 0x{marker:02X} — lossless/hierarchical/"
                "arithmetic frames are out of the subset)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF frame header")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs = body[1 + 2 * s]
                tables = body[2 + 2 * s]
                scan.append((cs, tables >> 4, tables & 0x0F))
            if not progressive:
                return _decode_scan(
                    payload, pos + seglen, frame, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated progressive SOS header")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                prog = _prog_init(frame)
            pos = _decode_prog_scan(
                payload, pos + seglen, prog, scan, ss, se,
                ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval,
            )
            continue
        pos += seglen
    if prog is not None:
        return _reconstruct_progressive(prog, qt)
    raise ValueError("no JPEG scan data (SOS) found")


def _decode_scan(payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    width, height, comps = frame
    if width < 1 or height < 1:
        raise ValueError(f"degenerate JPEG dimensions {width}×{height}")
    if len(comps) == 1:
        # T.81 §A.2.4: a single-component scan is non-interleaved and
        # its sampling factors do not apply — normalize to 1×1 so a
        # grayscale SOF declaring 2×2 doesn't get MCU-padded wrongly
        cid, _h, _v, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax > 2 or vmax > 2 or any(
        h not in (1, 2) or v not in (1, 2) for _, h, v, _ in comps
    ):
        raise ValueError(
            "sampling factors above 2 are out of the decoded subset"
        )
    if len(scan) != len(comps):
        raise ValueError("multi-scan (non-interleaved) JPEG not supported")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # per-component block planes (padded to MCU grid)
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}
    comp_info = []
    zz_rows: list[list] = []  # per component: zigzag block lists by row
    for cid, h, v, tq in comps:
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        td, ta = scan_by_cid[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("missing Huffman table for scan component")
        bw, bh = mcux * h, mcuy * v
        zz_rows.append([None] * (bh * bw))
        comp_info.append((h, v, qt[tq], huff_dc[td], huff_ac[ta], bw))
    br = _BitReader(payload, data_pos)
    pred = [0] * len(comps)
    mcu_index = 0
    # Bit-reader state lives in locals through the entropy loop (see
    # _prog_ac_scan); blocks accumulate as plain-int lists and the
    # zigzag/dequantize runs ONCE vectorized after the scan — the
    # per-block np.zeros + fancy-index assignment used to dominate.
    fill = br._fill
    acc = br.acc
    nbits = br.nbits
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RSTn, got 0x{m:02X}")
                acc = 0
                nbits = 0
                pred = [0] * len(comps)
            for ci, (h, v, q, hdc, hac, bw) in enumerate(comp_info):
                for by in range(v):
                    for bx in range(h):
                        blk = [0] * 64
                        if nbits < 16:
                            br.acc = acc
                            br.nbits = nbits
                            fill()
                            acc = br.acc
                            nbits = br.nbits
                        packed = hdc[(acc >> (nbits - 16)) & 0xFFFF]
                        if packed < 0:
                            raise ValueError(
                                "invalid Huffman code in JPEG scan"
                            )
                        nbits -= packed & 31
                        t = packed >> 5
                        if t:
                            if nbits < t:
                                br.acc = acc
                                br.nbits = nbits
                                fill()
                                acc = br.acc
                                nbits = br.nbits
                            nbits -= t
                            v0 = (acc >> nbits) & ((1 << t) - 1)
                            pred[ci] += (
                                v0 if v0 >= (1 << (t - 1))
                                else v0 - (1 << t) + 1
                            )
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            if nbits < 16:
                                br.acc = acc
                                br.nbits = nbits
                                fill()
                                acc = br.acc
                                nbits = br.nbits
                            packed = hac[(acc >> (nbits - 16)) & 0xFFFF]
                            if packed < 0:
                                raise ValueError(
                                    "invalid Huffman code in JPEG scan"
                                )
                            nbits -= packed & 31
                            rs = packed >> 5
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            if nbits < s:
                                br.acc = acc
                                br.nbits = nbits
                                fill()
                                acc = br.acc
                                nbits = br.nbits
                            nbits -= s
                            v0 = (acc >> nbits) & ((1 << s) - 1)
                            blk[k] = (
                                v0 if v0 >= (1 << (s - 1))
                                else v0 - (1 << s) + 1
                            )
                            k += 1
                        row = (my * v + by) * bw + (mx * h + bx)
                        zz_rows[ci][row] = blk
            mcu_index += 1
    br.acc = acc
    br.nbits = nbits
    planes = []
    for (h, v, q, hdc, hac, bw), rows in zip(comp_info, zz_rows):
        zz = np.array(rows, dtype=np.int64)  # (nblocks, 64) zigzag
        nat = np.zeros((zz.shape[0], 8, 8), dtype=np.int64)
        nat[:, _ZZ_ROWS, _ZZ_COLS] = zz
        planes.append(nat * q.reshape(1, 8, 8))
    return _reconstruct(
        [(h, v, bw) for h, v, q, hdc, hac, bw in comp_info],
        planes, width, height, hmax, vmax,
    )


def _reconstruct(infos, planes, width, height, hmax, vmax):
    """Shared decode tail for the sequential and progressive paths:
    IDCT each component's dequantized natural-order block plane
    (``infos`` = per-component ``(h, v, blocks_per_row)``), assemble,
    upsample by sample replication, crop, and color-convert."""
    out_planes = []
    for (h, v, bw), plane in zip(infos, planes):
        bh = plane.shape[0] // bw
        spat = _idct_blocks(plane) + 128
        np.clip(spat, 0, 255, out=spat)
        # (bh·bw, 8, 8) → (bh·8, bw·8)
        img = (
            spat.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by sample replication
        ry, rx = vmax // v, hmax // h
        if ry > 1:
            img = np.repeat(img, ry, axis=0)
        if rx > 1:
            img = np.repeat(img, rx, axis=1)
        out_planes.append(img[:height, :width])
    if len(out_planes) == 1:
        return width, height, 1, out_planes[0].reshape(height, width)
    # JFIF YCbCr → RGB, rounded half-up, clamped — integer-exact:
    # r = y + 1.402·(cr−128) etc., computed in scaled int64
    y = out_planes[0]
    cb = out_planes[1] - 128
    cr = out_planes[2] - 128
    s = 1 << 16
    half = s // 2
    r = (y * s + 91881 * cr + half) >> 16       # 1.402 · 2^16
    g = (y * s - 22554 * cb - 46802 * cr + half) >> 16
    b = (y * s + 116130 * cb + half) >> 16      # 1.772 · 2^16
    rgb = np.stack([r, g, b], axis=2)
    np.clip(rgb, 0, 255, out=rgb)
    return width, height, 3, rgb.reshape(height, width * 3)


# ----------------------------------------------- progressive decoder
#
# T.81 Annex G, Huffman path. Coefficients accumulate across scans in
# per-component ZIGZAG-order block planes (plain Python int lists —
# the entropy loops are scalar; NumPy enters at reconstruction);
# ``coef_bits[ci][k]`` tracks each coefficient's current successive-
# approximation bit position so an out-of-order or overlapping scan
# refuses loudly instead of decoding silently-wrong pixels.


def _prog_init(prog_frame):
    """Build the progressive decode state from the SOF2 frame header:
    per-component padded block planes (MCU grid, shared with any
    interleaved DC scan), the ACTUAL block grid used by
    non-interleaved scans (T.81 §A.2.2 — ceil of the scaled component
    size, NOT the MCU-padded width), and the Al-progression tracker."""
    width, height, comps = prog_frame
    if width < 1 or height < 1:
        raise ValueError(f"degenerate JPEG dimensions {width}×{height}")
    if len(comps) == 1:
        # single-component frame: sampling factors do not apply
        cid, _h, _v, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if any(h not in (1, 2) or v not in (1, 2) for _, h, v, _ in comps):
        raise ValueError(
            "sampling factors above 2 are out of the decoded subset"
        )
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    layout = []
    coef = []
    coef_bits = []
    for cid, h, v, tq in comps:
        bw, bh = mcux * h, mcuy * v
        cw = -(-(width * h) // hmax)    # component width in samples
        ch = -(-(height * v) // vmax)
        nbw = -(-cw // 8)               # actual block grid (non-interleaved)
        nbh = -(-ch // 8)
        layout.append((cid, h, v, tq, bw, bh, nbw, nbh))
        coef.append([[0] * 64 for _ in range(bw * bh)])
        coef_bits.append([-1] * 64)
    return {
        "width": width, "height": height, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "layout": layout, "coef": coef,
        "coef_bits": coef_bits,
    }


def _expect_rst(br: _BitReader) -> None:
    m = br.align_to_marker()
    if not (0xD0 <= m <= 0xD7):
        raise ValueError(f"expected RSTn, got 0x{m:02X}")


def _decode_prog_scan(payload, data_pos, prog, scan, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval):
    """Decode ONE progressive scan into ``prog``'s coefficient planes;
    returns the byte offset of the next marker. Validates the scan
    against the per-coefficient Al progression (first pass exactly
    once per band, refinements strictly Ah = previous Al = Al + 1)."""
    layout = prog["layout"]
    cid_to_ci = {lay[0]: i for i, lay in enumerate(layout)}
    sel = []
    for cs, td, ta in scan:
        if cs not in cid_to_ci:
            raise ValueError(f"scan references unknown component {cs}")
        sel.append((cid_to_ci[cs], td, ta))
    coef_bits = prog["coef_bits"]
    if al > 13 or ah > 13:
        raise ValueError("successive approximation beyond 13 bits")
    br = _BitReader(payload, data_pos)
    if ss == 0:
        if se != 0:
            raise ValueError(
                "progressive scan mixes DC and AC (Ss=0 requires Se=0)"
            )
        for ci, _td, _ta in sel:
            cb = coef_bits[ci]
            if ah == 0:
                if cb[0] != -1:
                    raise ValueError("duplicate progressive DC first scan")
            elif al != ah - 1 or cb[0] != ah:
                raise ValueError(
                    "inconsistent DC successive-approximation progression"
                )
            cb[0] = al
        _prog_dc_scan(br, prog, sel, ah, al, huff_dc, restart_interval)
    else:
        if len(sel) != 1:
            raise ValueError(
                "progressive AC scan must be single-component (T.81 G.1)"
            )
        if not (1 <= ss <= se <= 63):
            raise ValueError(f"bad progressive spectral band {ss}..{se}")
        ci, _td, ta = sel[0]
        cb = coef_bits[ci]
        if cb[0] < 0:
            raise ValueError("progressive AC scan before the DC scan")
        for k in range(ss, se + 1):
            if ah == 0:
                if cb[k] != -1:
                    raise ValueError(
                        "overlapping progressive AC first scans"
                    )
            elif al != ah - 1 or cb[k] != ah:
                raise ValueError(
                    "inconsistent AC successive-approximation progression"
                )
            cb[k] = al
        if ta not in huff_ac:
            raise ValueError("missing AC Huffman table for scan")
        _prog_ac_scan(br, prog, ci, huff_ac[ta], ss, se, ah, al,
                      restart_interval)
    # resume the marker walk: seek the next real marker (skips any
    # trailing stuffed pad byte the scan's bit consumer never pulled)
    p, n = br.pos, len(payload)
    while p + 1 < n and not (payload[p] == 0xFF and payload[p + 1] != 0x00):
        p += 1
    return p


def _prog_dc_scan(br, prog, sel, ah, al, huff_dc, restart_interval):
    """DC scan (T.81 G.1.2.1): first pass (Ah=0) Huffman-decodes DIFF
    values into bit position Al; refinement passes read one raw bit
    per block into bit Al (twos-complement OR — exact for negatives).
    Interleaved scans walk the MCU grid (including dummy pad blocks);
    a single-component scan walks that component's actual grid."""
    layout, coef = prog["layout"], prog["coef"]
    tabs = []
    for _ci, td, _ta in sel:
        if ah == 0:
            if td not in huff_dc:
                raise ValueError("missing DC Huffman table for scan")
            tabs.append(huff_dc[td])
        else:
            tabs.append(None)
    preds = [0] * len(sel)
    bit = 1 << al

    def block(si: int, ci: int, row: int) -> None:
        # (kept as the original 3-call form: DC scans touch one
        # coefficient per block, so this is not a hot path)
        c = coef[ci][row]
        if ah == 0:
            t = _huff_decode(br, tabs[si])
            preds[si] += _extend(br.read(t), t)
            c[0] = preds[si] << al
        elif br.read(1):
            c[0] |= bit

    mcu_index = 0
    if len(sel) > 1:
        mcux, mcuy = prog["mcux"], prog["mcuy"]
        for my in range(mcuy):
            for mx in range(mcux):
                if (restart_interval and mcu_index
                        and mcu_index % restart_interval == 0):
                    _expect_rst(br)
                    preds = [0] * len(sel)
                for si, (ci, _td, _ta) in enumerate(sel):
                    _cid, h, v, _tq, bw = layout[ci][:5]
                    for by in range(v):
                        for bx in range(h):
                            block(si, ci, (my * v + by) * bw + mx * h + bx)
                mcu_index += 1
    else:
        ci = sel[0][0]
        _cid, _h, _v, _tq, bw, _bh, nbw, nbh = layout[ci]
        for y in range(nbh):
            for x in range(nbw):
                if (restart_interval and mcu_index
                        and mcu_index % restart_interval == 0):
                    _expect_rst(br)
                    preds = [0] * len(sel)
                block(0, ci, y * bw + x)
                mcu_index += 1


def _prog_ac_scan(br, prog, ci, ac, ss, se, ah, al, restart_interval):
    """AC scan over one component's ACTUAL block grid (T.81 G.1.2.2 /
    G.1.2.3). First pass (Ah=0): run/size symbols place values at bit
    Al, EOBn symbols start end-of-band runs spanning whole blocks.
    Refinement (Ah>0): already-nonzero coefficients take correction
    bits (magnitude grows only if bit Al is clear), newly-nonzero
    coefficients arrive as ±1·2^Al after a zero-history run; an EOB
    run still consumes correction bits for the rest of each block."""
    _cid, _h, _v, _tq, bw, _bh, nbw, nbh = prog["layout"][ci]
    coef = prog["coef"][ci]
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    mcu_index = 0
    # The entropy loop keeps the bit-reader state (acc, nbits) in
    # LOCALS and inlines _huff_decode/read — one Huffman symbol was
    # previously 2-3 method calls of attribute round-trips, which
    # dominated the decode profile. State is synced to ``br`` only
    # around _fill()/RST boundaries (same values, just rehomed).
    fill = br._fill
    acc = br.acc
    nbits = br.nbits
    for y in range(nbh):
        for x in range(nbw):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                _expect_rst(br)  # discards bits; pos already synced
                acc = 0
                nbits = 0
                eobrun = 0
            mcu_index += 1
            c = coef[y * bw + x]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    if nbits < 16:
                        br.acc = acc
                        br.nbits = nbits
                        fill()
                        acc = br.acc
                        nbits = br.nbits
                    packed = ac[(acc >> (nbits - 16)) & 0xFFFF]
                    if packed < 0:
                        raise ValueError("invalid Huffman code in JPEG scan")
                    nbits -= packed & 31
                    rs = packed >> 5
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                if nbits < r:
                                    br.acc = acc
                                    br.nbits = nbits
                                    fill()
                                    acc = br.acc
                                    nbits = br.nbits
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                            break
                        k += 16  # ZRL
                        if k > se + 1:
                            raise ValueError(
                                "progressive AC run past band end"
                            )
                        continue
                    k += r
                    if k > se:
                        raise ValueError("progressive AC run past band end")
                    if nbits < s:
                        br.acc = acc
                        br.nbits = nbits
                        fill()
                        acc = br.acc
                        nbits = br.nbits
                    nbits -= s
                    v = (acc >> nbits) & ((1 << s) - 1)
                    c[k] = (v if v >= (1 << (s - 1)) else v - (1 << s) + 1) << al
                    k += 1
                continue
            # refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    if nbits < 16:
                        br.acc = acc
                        br.nbits = nbits
                        fill()
                        acc = br.acc
                        nbits = br.nbits
                    packed = ac[(acc >> (nbits - 16)) & 0xFFFF]
                    if packed < 0:
                        raise ValueError("invalid Huffman code in JPEG scan")
                    nbits -= packed & 31
                    rs = packed >> 5
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                if nbits < r:
                                    br.acc = acc
                                    br.nbits = nbits
                                    fill()
                                    acc = br.acc
                                    nbits = br.nbits
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                            break  # rest of block via the EOB sweep
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid magnitude in AC refinement scan"
                            )
                        if nbits < 1:
                            br.acc = acc
                            br.nbits = nbits
                            fill()
                            acc = br.acc
                            nbits = br.nbits
                        nbits -= 1
                        val = p1 if (acc >> nbits) & 1 else m1
                    # advance over r zero-history positions, applying
                    # correction bits at already-nonzero ones
                    while k <= se:
                        cv = c[k]
                        if cv != 0:
                            if nbits < 1:
                                br.acc = acc
                                br.nbits = nbits
                                fill()
                                acc = br.acc
                                nbits = br.nbits
                            nbits -= 1
                            b = (acc >> nbits) & 1
                            if b and (cv & p1) == 0:
                                c[k] = cv + (p1 if cv >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s:
                        if k > se:
                            raise ValueError(
                                "progressive AC refinement run past band end"
                            )
                        c[k] = val
                    elif k > se:
                        # ZRL: the advance loop exhausted the band
                        # without landing on its 16th zero-history
                        # position (a legal ZRL always breaks at
                        # k <= se) — corrupt, same class as the
                        # coded-value overrun above and the
                        # first-pass ZRL check: refuse loudly rather
                        # than silently dropping the remainder
                        raise ValueError(
                            "progressive AC refinement run past band end"
                        )
                    k += 1
            if eobrun:
                while k <= se:  # EOB covers this block's remainder too
                    cv = c[k]
                    if cv != 0:
                        if nbits < 1:
                            br.acc = acc
                            br.nbits = nbits
                            fill()
                            acc = br.acc
                            nbits = br.nbits
                        nbits -= 1
                        b = (acc >> nbits) & 1
                        if b and (cv & p1) == 0:
                            c[k] = cv + (p1 if cv >= 0 else m1)
                    k += 1
                eobrun -= 1
    br.acc = acc
    br.nbits = nbits


def _reconstruct_progressive(prog, qt):
    """Dequantize the accumulated coefficient planes and run the
    shared IDCT/assemble/color tail. Refuses if any coefficient
    position was never coded by a first-pass scan — a partial
    progression would decode to silently-wrong pixels."""
    for ci, cb in enumerate(prog["coef_bits"]):
        if any(b < 0 for b in cb):
            raise ValueError(
                "progressive JPEG leaves coefficients uncoded "
                "(incomplete spectral coverage at EOI)"
            )
    infos = []
    planes = []
    for (cid, h, v, tq, bw, _bh, _nbw, _nbh), cf in zip(
        prog["layout"], prog["coef"]
    ):
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        zz = np.array(cf, dtype=np.int64)  # (nblocks, 64) zigzag
        nat = np.zeros((zz.shape[0], 8, 8), dtype=np.int64)
        nat[:, _ZZ_ROWS, _ZZ_COLS] = zz
        infos.append((h, v, bw))
        planes.append(nat * qt[tq].reshape(1, 8, 8))
    return _reconstruct(
        infos, planes, prog["width"], prog["height"],
        prog["hmax"], prog["vmax"],
    )


# ------------------------------------------------------------ encoder


class _BitWriter:
    """Huffman bit sink. ``write`` only buffers (code, length) pairs;
    the actual bit packing (MSB-first concatenation, byte stuffing of
    0xFF per T.81 §B.1.1.5) happens vectorized in one NumPy pass per
    byte-aligned segment — the per-symbol big-int shifting of the
    previous implementation dominated encoder profiles (~12k ``write``
    calls per 72-block image)."""

    __slots__ = ("chunks", "codes", "lens")

    def __init__(self):
        self.chunks = bytearray()  # completed (stuffed) bytes
        # Hot encode loops append to these two lists DIRECTLY (bound
        # .append), bypassing the write() call overhead; the invariant
        # is simply len(codes) == len(lens) with every length >= 1.
        self.codes: list[int] = []
        self.lens: list[int] = []

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.codes.append(code)
        self.lens.append(length)

    def _pack(self) -> None:
        """Pack the buffered symbols (total length a multiple of 8)
        into ``chunks``, applying byte stuffing. Bit-exact with the
        old per-symbol loop: symbol i's bits occupy stream positions
        [Σlens[:i], Σlens[:i+1]) MSB-first, masked to its length."""
        if not self.lens:
            return
        lens = np.asarray(self.lens, dtype=np.int64)
        codes = np.asarray(self.codes, dtype=np.int64)
        ends = np.cumsum(lens)
        total = int(ends[-1])
        # per-bit shift: for symbol i, bits come out code >> (len-1) .. code >> 0
        shifts = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
        bits = ((np.repeat(codes, lens) >> shifts) & 1).astype(np.uint8)
        by = np.packbits(bits)
        ff = np.flatnonzero(by == 0xFF)
        if len(ff):
            by = np.insert(by, ff + 1, 0)  # byte stuffing
        self.chunks += by.tobytes()
        self.codes.clear()
        self.lens.clear()

    def _align(self) -> None:
        """1-pad to a byte boundary (T.81 padding rule). The bit count
        is computed lazily here — only pack boundaries need it."""
        nb = sum(self.lens) & 7
        if nb:
            pad = 8 - nb
            self.codes.append((1 << pad) - 1)
            self.lens.append(pad)

    def restart(self, n: int) -> None:
        """Byte-align with 1-padding and emit RSTn (T.81 §F.1.2.3)."""
        self._align()
        self._pack()
        self.chunks += bytes([0xFF, 0xD0 + (n % 8)])

    def flush(self) -> bytes:
        self._align()
        self._pack()
        return bytes(self.chunks)


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) per T.81 §F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _quantize(coefs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away integer quantization (deterministic)."""
    a = np.abs(coefs)
    out = (2 * a + q) // (2 * q)
    return np.where(coefs < 0, -out, out)


def _encode_component_blocks(img: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples by edge replication, split into (n, 8, 8)
    int64 blocks in row-major block order."""
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph != h or pw != w:
        img = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        img.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.int64)
    )


def _write_block(writer, zz: list, pred: int, dc_codes, ac_codes) -> int:
    """Encode one quantized block given as a ZIGZAG-order Python list
    of 64 ints (callers bulk-zigzag + ``.tolist()`` all blocks at once
    — plain-int indexing is several times faster than per-element
    NumPy scalar access in this hot loop); returns new DC pred."""
    ca = writer.codes.append
    la = writer.lens.append
    dc = zz[0]
    t, code = _magnitude(dc - pred)
    c, ln = dc_codes[t]
    ca(c)
    la(ln)
    if t:
        ca(code)
        la(t)
    last_nz = 63
    while last_nz > 0 and zz[last_nz] == 0:
        last_nz -= 1
    run = 0
    zrl = ac_codes[0xF0]
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ca(zrl[0])  # ZRL
            la(zrl[1])
            run -= 16
        if v > 0:
            t = v.bit_length()
            code = v
        else:
            t = (-v).bit_length()
            code = v + (1 << t) - 1
        c, ln = ac_codes[(run << 4) | t]
        ca(c)
        la(ln)
        ca(code)
        la(t)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        ca(c)
        la(ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _qtable_of(qtable) -> np.ndarray:
    """Build + validate an encoder quantization table. T.81 baseline
    tables are 8-bit values in [1, 255]; a ZERO entry would make
    ``_quantize``'s integer divide silently zero the coefficient
    (NumPy emits only a RuntimeWarning), decoding to a constant-128
    frame — silent corruption, not the loud refusal this module
    promises. Default: all ones (near-lossless)."""
    if qtable is None:
        return np.ones((8, 8), dtype=np.int64)
    q = np.asarray(qtable, dtype=np.int64).reshape(8, 8)
    if (q < 1).any() or (q > 255).any():
        raise ValueError(
            "quantization table entries must be in [1, 255] (zero "
            "would silently zero coefficients; >255 does not fit the "
            "8-bit DQT emitted here)"
        )
    return q


def _dqt_seg(tq: int, table: np.ndarray) -> bytes:
    zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
    if zz.max() > 255:
        raise ValueError("only 8-bit quantization tables are encoded")
    return _seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(
        0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    )


def jpeg_encode_gray(
    px, width: int, height: int, qtable=None, restart_interval: int = 0
) -> bytes:
    """Minimal REAL baseline JPEG encoder, grayscale: FDCT + quantize
    + Annex-K Huffman coding. ``px`` is (height, width) int-like in
    [0, 255]; ``qtable`` an 8×8 int array (default: all ones —
    near-lossless, the planted-fixture setting where only DCT rounding
    noise survives the round trip); ``restart_interval`` > 0 emits DRI
    + RSTn markers every N MCUs (exercises the decoder's restart
    path). Output decodes with :func:`jpeg_pixels` (and any
    standards-compliant decoder)."""
    img = np.asarray(px, dtype=np.int64).reshape(height, width)
    if img.min() < 0 or img.max() > 255:
        raise ValueError("pixel values outside [0, 255]")
    q = _qtable_of(qtable)
    blocks = _encode_component_blocks(img) - 128
    coefs = _fdct_blocks(blocks)
    quant = _quantize(coefs, q.reshape(1, 8, 8))
    dc_codes = _encode_codes(*_STD_DC_LUM)
    ac_codes = _encode_codes(*_STD_AC_LUM)
    zz_rows = quant[:, _ZZ_ROWS, _ZZ_COLS].tolist()  # bulk zigzag once
    writer = _BitWriter()
    pred = 0
    rst = 0
    for b in range(len(zz_rows)):
        if restart_interval and b and b % restart_interval == 0:
            writer.restart(rst)
            rst += 1
            pred = 0
        pred = _write_block(writer, zz_rows[b], pred, dc_codes, ac_codes)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q)
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]),
    )
    out += _dht_seg(0, 0, *_STD_DC_LUM)
    out += _dht_seg(1, 0, *_STD_AC_LUM)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_ycbcr(
    rgb, width: int, height: int, qtable=None, subsample: bool = False
) -> bytes:
    """REAL baseline color JPEG encoder: JFIF RGB→YCbCr, optional 4:2:0
    chroma subsampling (2×2 box mean), FDCT + quantize + Annex-K
    Huffman tables (luma tables for Y, chroma tables for Cb/Cr). One
    shared quantization table keeps the fixture story simple. ``rgb``
    is (height, width, 3) int-like in [0, 255]."""
    arr = np.asarray(rgb, dtype=np.int64).reshape(height, width, 3)
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("pixel values outside [0, 255]")
    q = _qtable_of(qtable)
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    s = 1 << 16
    half = s // 2
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = ((-11059 * r - 21709 * g + 32768 * b + half) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + half) >> 16) + 128
    np.clip(y, 0, 255, out=y)
    np.clip(cb, 0, 255, out=cb)
    np.clip(cr, 0, 255, out=cr)
    if subsample:
        ph, pw = -(-height // 2) * 2, -(-width // 2) * 2
        cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
        crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
        cb = (cbp.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) + 2) >> 2
        cr = (crp.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) + 2) >> 2
        hy = vy = 2
    else:
        hy = vy = 1
    # per-component padded block planes in MCU-interleaved scan order
    mcu_w, mcu_h = 8 * hy, 8 * vy
    mcux, mcuy = -(-width // mcu_w), -(-height // mcu_h)

    def comp_blocks(img: np.ndarray, h: int, v: int) -> np.ndarray:
        th, tw = mcuy * v * 8, mcux * h * 8
        ih, iw = img.shape
        img = np.pad(img, ((0, th - ih), (0, tw - iw)), mode="edge")
        blocks = _encode_component_blocks(img) - 128
        return _quantize(_fdct_blocks(blocks), q.reshape(1, 8, 8))

    yq = comp_blocks(y, hy, vy)[:, _ZZ_ROWS, _ZZ_COLS].tolist()
    cbq = comp_blocks(cb, 1, 1)[:, _ZZ_ROWS, _ZZ_COLS].tolist()
    crq = comp_blocks(cr, 1, 1)[:, _ZZ_ROWS, _ZZ_COLS].tolist()
    dc_l = _encode_codes(*_STD_DC_LUM)
    ac_l = _encode_codes(*_STD_AC_LUM)
    dc_c = _encode_codes(*_STD_DC_CHR)
    ac_c = _encode_codes(*_STD_AC_CHR)
    writer = _BitWriter()
    preds = [0, 0, 0]
    ybw = mcux * hy  # Y blocks per row
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vy):
                for bx in range(hy):
                    idx = (my * vy + by) * ybw + (mx * hy + bx)
                    preds[0] = _write_block(writer, yq[idx], preds[0], dc_l, ac_l)
            idx = my * mcux + mx
            preds[1] = _write_block(writer, cbq[idx], preds[1], dc_c, ac_c)
            preds[2] = _write_block(writer, crq[idx], preds[2], dc_c, ac_c)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q)
    hv_y = (hy << 4) | vy
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", height, width)
        + bytes([3, 1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht_seg(0, 0, *_STD_DC_LUM)
    out += _dht_seg(1, 0, *_STD_AC_LUM)
    out += _dht_seg(0, 1, *_STD_DC_CHR)
    out += _dht_seg(1, 1, *_STD_AC_CHR)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------- progressive encoder
#
# The Annex K "typical" AC tables carry no EOBn symbols (0x10..0xE0)
# — they are baseline tables; progressive scans code end-of-band runs
# longer than 1 with EOBn, which is why libjpeg switches to custom
# tables in progressive mode. This flat canonical table assigns every
# symbol the progressive AC encoder can emit — (run 0..15) × (size
# 0..10), i.e. run/size values, ZRL (0xF0), and EOBn (r<<4 | 0) — a
# 9-bit code each (176 codes of 512; no all-ones code, so the T.81
# padding rule holds). Compression is ~2× worse than an optimized
# table, which is irrelevant for fixtures and round-trip tests.
_PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)

#
# Real multi-scan T.81 Annex G bitstreams so progressive fixtures and
# round-trip tests run through the real refinement decoder. Scan
# scripts use TWO successive-approximation levels for AC and one for
# DC, with split first-pass spectral bands refined by a single
# whole-band scan — covering every decoder scan kind (DC first at
# Al>0, DC refinement, AC first with EOB runs across split bands, AC
# refinement with correction bits and cross-block EOB accumulation).


def _emit_eobrun(writer, ac_codes, eobrun: int, pending: list[int]) -> int:
    """Flush an accumulated end-of-band run (+ the correction bits it
    covers, refinement scans only); returns the reset run count."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        c, ln = ac_codes[nbits << 4]
        writer.codes.append(c)
        writer.lens.append(ln)
        if nbits:
            writer.codes.append(eobrun & ((1 << nbits) - 1))
            writer.lens.append(nbits)
        if pending:
            writer.codes.extend(pending)
            writer.lens.extend([1] * len(pending))
            pending.clear()
    return 0


def _prog_encode_dc_scan(writer, seq, dc_codes_by_slot, ah, al) -> None:
    """DC scan over ``seq`` = iterable of (component_slot, zigzag
    block). First pass: Huffman DIFFs of the point-transformed values
    (arithmetic >> Al, T.81 G.1.2.1); refinement: one raw bit Al per
    block — the decoder ORs it in, exact for negatives in
    twos-complement."""
    ca = writer.codes.append
    la = writer.lens.append
    if ah == 0:
        preds: dict[int, int] = {}
        for si, zz in seq:
            v = zz[0] >> al
            t, code = _magnitude(v - preds.get(si, 0))
            c, ln = dc_codes_by_slot[si][t]
            ca(c)
            la(ln)
            if t:
                ca(code)
                la(t)
            preds[si] = v
    else:
        for _si, zz in seq:
            ca((zz[0] >> al) & 1)
            la(1)


def _prog_encode_ac_first(writer, blocks, ac_codes, ss, se, al) -> None:
    """AC first pass (T.81 G.1.2.2): run/size coding of the point-
    transformed band (sign·(|v| >> Al)), all-zero bands folded into
    cross-block EOB runs."""
    ca = writer.codes.append
    la = writer.lens.append
    zrl = ac_codes[0xF0]
    eobrun = 0
    for zz in blocks:
        r = 0
        for v in zz[ss : se + 1]:
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            if v < 0:
                t = -t
            if eobrun:
                eobrun = _emit_eobrun(writer, ac_codes, eobrun, [])
            while r > 15:
                ca(zrl[0])
                la(zrl[1])
                r -= 16
            if t > 0:
                nb = t.bit_length()
                code = t
            else:
                nb = (-t).bit_length()
                code = t + (1 << nb) - 1
            c, ln = ac_codes[(r << 4) | nb]
            ca(c)
            la(ln)
            ca(code)
            la(nb)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(writer, ac_codes, eobrun, [])
    _emit_eobrun(writer, ac_codes, eobrun, [])


def _prog_encode_ac_refine(writer, blocks, ac_codes, ss, se, al) -> None:
    """AC refinement (T.81 G.1.2.3): newly-nonzero coefficients
    (|v| >> Al == 1) emit run/1 symbols + sign, already-nonzero ones
    buffer correction bits that ride behind the next emitted symbol;
    ZRLs only when a newly-nonzero coefficient still follows in the
    block (otherwise the tail folds into the EOB run, whose buffered
    correction bits ride behind the EOBn symbol)."""
    ca = writer.codes.append
    la = writer.lens.append
    codes_extend = writer.codes.extend
    lens_extend = writer.lens.extend
    zrl = ac_codes[0xF0]
    run1 = [ac_codes[(r << 4) | 1] for r in range(16)]
    eobrun = 0
    pending: list[int] = []  # correction bits covered by pending EOB run
    for zz in blocks:
        band = zz[ss : se + 1]
        absv = [abs(v) >> al for v in band]
        eob = ss - 1  # index of last newly-nonzero coefficient
        for j in range(len(absv) - 1, -1, -1):
            if absv[j] == 1:
                eob = ss + j
                break
        r = 0
        br_bits: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            k = ss + j
            while r > 15 and k <= eob:
                if eobrun:
                    eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
                ca(zrl[0])
                la(zrl[1])
                r -= 16
                if br_bits:
                    codes_extend(br_bits)
                    lens_extend([1] * len(br_bits))
                    br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            if eobrun:
                eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
            c, ln = run1[r]
            ca(c)
            la(ln)
            ca(1 if band[j] >= 0 else 0)
            la(1)
            if br_bits:
                codes_extend(br_bits)
                lens_extend([1] * len(br_bits))
                br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            pending.extend(br_bits)
            if eobrun == 0x7FFF or len(pending) > 937:
                eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
    _emit_eobrun(writer, ac_codes, eobrun, pending)


def _prog_scan_segments(scans, zz_planes, layouts, dc_codes, ac_codes,
                        comp_ids, table_slots,
                        restart_interval: int = 0,
                        mcu_order=None,
                        blocks_per_mcu: int = 1) -> bytes:
    """Emit SOS header + entropy data for each scan in ``scans`` =
    [(slots, ss, se, ah, al)]. ``zz_planes[si]`` is that component's
    (nblocks, 64) quantized zigzag plane over the padded MCU grid;
    ``layouts[si] = (bw, nbw, nbh)`` gives padded row stride and the
    actual block grid for non-interleaved scans; interleaved DC scans
    take ``mcu_order`` — the precomputed (slot, block) MCU-interleaved
    sequence, ``blocks_per_mcu`` entries per MCU (required iff any
    scan is interleaved). A nonzero ``restart_interval`` splits every
    scan into intervals of that many MCUs, each encoded with fresh
    predictors/EOB state and separated by byte-aligned RSTn markers
    (T.81 §G.1.2 restart semantics fall out of per-chunk
    re-encoding)."""
    # Bulk-convert each component plane to nested Python lists once:
    # the per-coefficient scan loops below are several times faster on
    # plain ints than on NumPy scalar accesses (same values exactly).
    zz_planes = [
        p.tolist() if hasattr(p, "tolist") else p for p in zz_planes
    ]
    if mcu_order is not None:
        mcu_order = [
            (si, r.tolist() if hasattr(r, "tolist") else r)
            for si, r in mcu_order
        ]
    out = bytearray()
    for slots, ss, se, ah, al in scans:
        body = bytearray([len(slots)])
        for si in slots:
            td, ta = table_slots[si]
            body += bytes([comp_ids[si], (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(body))
        writer = _BitWriter()
        interleaved = ss == 0 and len(slots) > 1
        if ss == 0:
            if interleaved:
                if mcu_order is None:
                    raise ValueError(
                        "interleaved progressive scan needs mcu_order"
                    )
                seq = mcu_order
            else:
                si = slots[0]
                bw, nbw, nbh = layouts[si][:3]
                seq = [
                    (si, zz_planes[si][y * bw + x])
                    for y in range(nbh)
                    for x in range(nbw)
                ]
        else:
            si = slots[0]
            bw, nbw, nbh = layouts[si][:3]
            seq = [
                zz_planes[si][y * bw + x]
                for y in range(nbh)
                for x in range(nbw)
            ]
        per_mcu = blocks_per_mcu if interleaved else 1
        chunk = restart_interval * per_mcu if restart_interval else len(seq)
        chunk = max(chunk, 1)
        rst = 0
        for start in range(0, len(seq), chunk):
            if start:
                writer.restart(rst)
                rst += 1
            part = seq[start : start + chunk]
            if ss == 0:
                _prog_encode_dc_scan(writer, part, dc_codes, ah, al)
            elif ah == 0:
                _prog_encode_ac_first(writer, part, ac_codes[slots[0]],
                                      ss, se, al)
            else:
                _prog_encode_ac_refine(writer, part, ac_codes[slots[0]],
                                       ss, se, al)
        out += writer.flush()
    return bytes(out)


def jpeg_encode_progressive_gray(px, width: int, height: int,
                                 qtable=None, scans=None,
                                 restart_interval: int = 0) -> bytes:
    """REAL progressive (SOF2) grayscale encoder. Default scan
    script: DC first at Al=1 → AC bands 1-5 and 6-63 first-pass at
    Al=2 → two whole-band AC refinements (Ah=2→Al=1, Ah=1→Al=0) → DC
    refinement (Ah=1→Al=0) — successive approximation AND spectral
    selection, decoding bit-exactly to the same pixels as
    :func:`jpeg_encode_gray` of the same input (the coefficients are
    identical; only the entropy-coding order differs). ``scans``
    overrides the script with ``[(slots, Ss, Se, Ah, Al)]`` tuples
    (``slots`` is always ``[0]`` here) so property tests can exercise
    arbitrary legal progressions; the DECODER's per-coefficient
    progression tracker is the validity check — an illegal script
    produces a stream it refuses."""
    img = np.asarray(px, dtype=np.int64).reshape(height, width)
    if img.min() < 0 or img.max() > 255:
        raise ValueError("pixel values outside [0, 255]")
    q = _qtable_of(qtable)
    blocks = _encode_component_blocks(img) - 128
    quant = _quantize(_fdct_blocks(blocks), q.reshape(1, 8, 8))
    zz = quant[:, _ZZ_ROWS, _ZZ_COLS]
    nbw, nbh = -(-width // 8), -(-height // 8)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q)
    out += _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]),
    )
    out += _dht_seg(0, 0, *_STD_DC_LUM)
    out += _dht_seg(1, 0, *_PROG_AC)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if scans is None:
        scans = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 1, 63, 1, 0),
            ([0], 0, 0, 1, 0),
        ]
    out += _prog_scan_segments(
        scans, [zz], [(nbw, nbw, nbh)],
        [_encode_codes(*_STD_DC_LUM)], [_encode_codes(*_PROG_AC)],
        comp_ids=[1], table_slots=[(0, 0)],
        restart_interval=restart_interval,
    )
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_progressive_ycbcr(
    rgb, width: int, height: int, qtable=None, subsample: bool = False,
    restart_interval: int = 0, scans=None
) -> bytes:
    """REAL progressive (SOF2) color encoder — the
    :func:`jpeg_encode_ycbcr` pixel pipeline (JFIF RGB→YCbCr, optional
    4:2:0 subsampling) under a progressive scan script: interleaved
    3-component DC first at Al=1, per-component whole-band AC first
    passes at Al=1, per-component AC refinements to Al=0, interleaved
    DC refinement. With ``subsample`` the non-interleaved LUMA scans
    walk the ACTUAL luma block grid (e.g. width 72: 9 blocks/row)
    while the interleaved DC scans walk the padded MCU grid (stride
    10) — the grid-divergence case the decoder must get right; the
    chroma grids (h=v=1) never diverge, since
    ceil(ceil(w/2)/8) == ceil(w/16) == the MCU count."""
    arr = np.asarray(rgb, dtype=np.int64).reshape(height, width, 3)
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("pixel values outside [0, 255]")
    q = _qtable_of(qtable)
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    s = 1 << 16
    half = s // 2
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = ((-11059 * r - 21709 * g + 32768 * b + half) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + half) >> 16) + 128
    np.clip(y, 0, 255, out=y)
    np.clip(cb, 0, 255, out=cb)
    np.clip(cr, 0, 255, out=cr)
    if subsample:
        ph, pw = -(-height // 2) * 2, -(-width // 2) * 2
        cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
        crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
        cb = (cbp.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) + 2) >> 2
        cr = (crp.reshape(ph // 2, 2, pw // 2, 2).sum(axis=(1, 3)) + 2) >> 2
        hy = vy = 2
    else:
        hy = vy = 1
    mcux, mcuy = -(-width // (8 * hy)), -(-height // (8 * vy))

    def comp_plane(img: np.ndarray, h: int, v: int) -> np.ndarray:
        th, tw = mcuy * v * 8, mcux * h * 8
        ih, iw = img.shape
        img = np.pad(img, ((0, th - ih), (0, tw - iw)), mode="edge")
        blocks = _encode_component_blocks(img) - 128
        quant = _quantize(_fdct_blocks(blocks), q.reshape(1, 8, 8))
        return quant[:, _ZZ_ROWS, _ZZ_COLS]

    planes = [comp_plane(y, hy, vy), comp_plane(cb, 1, 1),
              comp_plane(cr, 1, 1)]
    # actual (non-interleaved) grids + padded strides per component
    hmax, vmax = hy, vy
    samp = [(hy, vy), (1, 1), (1, 1)]
    layouts = []
    for h, v in samp:
        bw = mcux * h
        cw = -(-(width * h) // hmax)    # component size in samples
        ch = -(-(height * v) // vmax)
        layouts.append((bw, -(-cw // 8), -(-ch // 8)))
    # shared MCU-interleaved DC block order (blocks_per_mcu entries
    # per MCU: Σ h·v over components)
    mcu_order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for si, (h, v) in enumerate(samp):
                bw = mcux * h
                for by in range(v):
                    for bx in range(h):
                        mcu_order.append(
                            (si, planes[si][(my * v + by) * bw + mx * h + bx])
                        )
    dc_codes = [_encode_codes(*_STD_DC_LUM), _encode_codes(*_STD_DC_CHR),
                _encode_codes(*_STD_DC_CHR)]
    prog_ac = _encode_codes(*_PROG_AC)
    ac_codes = [prog_ac, prog_ac, prog_ac]
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q)
    hv_y = (hy << 4) | vy
    out += _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", height, width)
        + bytes([3, 1, hv_y, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht_seg(0, 0, *_STD_DC_LUM)
    out += _dht_seg(1, 0, *_PROG_AC)
    out += _dht_seg(0, 1, *_STD_DC_CHR)
    out += _dht_seg(1, 1, *_PROG_AC)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if scans is None:
        scans = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 1),
            ([0], 6, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0, 1, 2], 0, 0, 1, 0),
        ]
    out += _prog_scan_segments(
        scans, planes, layouts, dc_codes, ac_codes,
        comp_ids=[1, 2, 3], table_slots=[(0, 0), (1, 1), (1, 1)],
        restart_interval=restart_interval,
        mcu_order=mcu_order,
        blocks_per_mcu=sum(h * v for h, v in samp),
    )
    out += b"\xff\xd9"
    return bytes(out)
