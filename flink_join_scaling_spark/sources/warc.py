"""WARC (ISO 28500) container source — the on-disk format crawl
corpora actually arrive in (Common Crawl-class archives), one step
upstream of :mod:`~flink_join_scaling_spark.operators.html_extract`:
WARC file → response records → HTTP split → raw HTML, completing the
crawl-ingestion chain (container → record → content → clean text).

Dependency-free record walk over the public WARC/1.x layout: each
record is a CRLF-terminated header block (``WARC/1.0`` version line +
``Name: value`` headers, ``Content-Length`` mandatory) followed by
exactly ``Content-Length`` payload bytes and a blank-line separator;
``WARC-Type: response`` payloads are HTTP responses (status line +
headers + CRLF CRLF + body). The parser is STRICT — truncated
records, missing Content-Length, or a malformed version line raise a
loud ValueError rather than resynchronizing (a silently skipped
record is a silently shrunk corpus).

Scale shape: one WARC file per input row (production:
``spark.read.format("binaryFile")`` over the archive directory, one
partition per file — the :mod:`sources.media` pattern), exploded to
records in ONE Arrow ``mapInPandas`` pass; archive bytes never
shuffle and never visit the driver. ``.warc.gz`` member framing IS in
scope (r14 verdict What's-missing #1): Common Crawl ships one gzip
member per record, ``binaryFile`` does NOT transparently gunzip, so
:func:`parse_warc_bytes` detects the gzip magic and walks the
concatenated members with stdlib zlib (``wbits=47``), applying the
same strict record framing to each decompressed member — a record may
not span members, and trailing garbage after a member is loud.

Body decode policy (records carry a ``body`` STRING column): framing
stays strict, decode is tolerant — real archives mix charsets and
binary payloads, and one bad body must not kill the whole archive's
task. A ``charset=`` parameter on the HTTP ``Content-Type`` wins
(``errors="replace"``; unknown codec names fall through); when the
header declares none and the payload is HTML, the HTML5 prescan rule
applies — the first 1024 bytes are sniffed for ``<meta charset=…>``
/ ``http-equiv`` (r16, the r15 verdict's task 3: real servers
routinely omit the header charset and declare it in markup; without
the sniff a Shift-JIS or windows-1252 page took the latin-1 fallback
and mojibake'd); otherwise strict UTF-8 is tried and non-UTF-8 bytes
fall back to latin-1, which maps every byte and never raises (and is
lossless to re-encode, so binary payloads such as images survive the
string column byte-exact until the content-type filter drops them
downstream).

The synthetic fixture (:func:`attach_synth_warc`) packs each
``group_size`` consecutive documents into one WARC blob — a warcinfo
record and, per document, a request record (both must be SKIPPED by
type) plus a response record wrapping the
:func:`~flink_join_scaling_spark.operators.html_extract.synth_html`
page for ``http://example.com/doc/{doc_id}`` — so the end-to-end
extraction (``q_extract_warc``) stays SQL-statable while the Spark
side must walk the real container, split real HTTP, and classify
real markup.
"""

from __future__ import annotations

import gzip
import hashlib
import re
import zlib
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "parse_warc_bytes",
    "parse_warc_records",
    "html_responses",
    "extract_redirects",
    "resolve_redirect_chains",
    "synth_warc",
    "synth_warc_record_blobs",
    "attach_synth_warc",
]

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
#: feed size for the gz member walk — module-level so tests can
#: shrink it to force member headers/trailers across chunk seams
_GZ_CHUNK = 1 << 18
#: charset parameter on a Content-Type value — tolerates bare,
#: double-quoted AND single-quoted spellings (charset='shift_jis'
#: appears in real archives; the r15 advisor flagged that a
#: double-quote-only pattern silently fell through to the
#: UTF-8/latin-1 path and mojibake'd non-latin payloads)
_CHARSET_RE = re.compile(r"charset=[\"']?([A-Za-z0-9_.:\-]+)[\"']?", re.I)

#: HTML5 prescan pieces (``_sniff_meta_charset``): ``<meta`` tags and
#: their attributes are tokenized within the 1024-byte window so only
#: a real ``charset`` ATTRIBUTE — or the ``charset=`` parameter of a
#: ``content`` attribute on an ``http-equiv="Content-Type"`` meta —
#: is honored (r16 review finding: a bare ``charset=`` byte-regex
#: also matched prose inside a description meta's content value and
#: inside comments, mis-decoding whole pages).
#: quote-aware tag capture: a '>' INSIDE a quoted attribute value
#: must not truncate the tag (r16 review repro: <meta data-x="a>b"
#: charset="shift_jis"> lost its declaration). The alternation's
#: branches start on disjoint characters, so the scan is linear —
#: no catastrophic backtracking on hostile windows.
_META_TAG_RE = re.compile(
    rb"<meta\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*", re.I
)
_ATTR_RE = re.compile(rb"([a-zA-Z-]+)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)")
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)


def _sniff_meta_charset(window: bytes) -> str | None:
    """The HTML5 §13.2.3.2 prescan, approximated faithfully over the
    first 1024 payload bytes: strip comments (an unterminated comment
    hides everything after its opener — the spec skips to a ``-->``
    that would lie beyond the window), then for each ``<meta`` tag
    read its attributes and take the first encoding from a
    ``charset`` attribute or an ``http-equiv="Content-Type"``'s
    ``content`` parameter. The spec's label remaps apply: a sniffed
    utf-16 label means the markup was ASCII-compatible after all →
    decode as utf-8; ``x-user-defined`` → windows-1252."""
    window = _COMMENT_RE.sub(b"", window)
    cut = window.find(b"<!--")
    if cut >= 0:
        window = window[:cut]
    for m in _META_TAG_RE.finditer(window):
        attrs: dict[str, bytes] = {}
        for a in _ATTR_RE.finditer(m.group(0)):
            name = a.group(1).decode("ascii").lower()
            if name not in attrs:
                attrs[name] = a.group(2).strip(b"\"'")
        label: str | None = None
        if "charset" in attrs:
            label = attrs["charset"].decode("ascii", "replace")
        elif (
            attrs.get("http-equiv", b"").lower() == b"content-type"
            and "content" in attrs
        ):
            cm = _CHARSET_RE.search(attrs["content"].decode("latin-1"))
            if cm:
                label = cm.group(1)
        if label:
            label = label.strip().lower()
            if label in ("utf-16", "utf-16le", "utf-16be"):
                return "utf-8"
            if label == "x-user-defined":
                return "windows-1252"
            return label
    return None


def _gzip_members(payload: bytes) -> Iterator[bytes]:
    """Walk concatenated gzip members (the ``.warc.gz``
    record-per-member convention) with stdlib zlib. ``wbits=47``
    accepts the gzip wrapper; each ``decompressobj`` stops at its
    member's end with the remaining archive in ``unused_data``.
    Strict like the record walk: a truncated member or non-gzip bytes
    between members raise rather than resynchronize. The archive is
    fed through zero-copy memoryview slices of bounded size — handing
    each member the whole remaining tail (``payload[pos:]``) would
    copy it per member, AND zlib would materialize the post-member
    remainder into ``unused_data`` per member: O(members × size) both
    ways on the exact record-per-member layout this walk exists for
    (~100k members in a real 1 GB archive). With bounded chunks every
    archive byte is fed exactly once and ``unused_data`` is at most
    one chunk."""
    chunk_size = _GZ_CHUNK
    mv = memoryview(payload)
    pos = 0
    n = len(payload)
    while pos < n:
        if mv[pos:pos + 2] != _GZIP_MAGIC:
            raise ValueError(
                f"expected gzip member at offset {pos}, got "
                f"{bytes(mv[pos:pos + 8])!r}"
            )
        d = zlib.decompressobj(47)
        out: List[bytes] = []
        p = pos
        while not d.eof:
            if p >= n:
                raise ValueError(
                    f"truncated gzip member at offset {pos}"
                )
            piece = mv[p:p + chunk_size]
            out.append(d.decompress(piece))
            p += len(piece)
        yield b"".join(out) + d.flush()
        pos = p - len(d.unused_data)


def _decode_body(body: bytes, content_type: str | None) -> str:
    """Tolerant body decode (module docstring): HTTP-declared charset
    → HTML5 meta prescan over the first 1024 bytes (HTML payloads
    only) → strict UTF-8 → latin-1, each fallible step falling
    through (``errors="replace"`` on declared codecs, LookupError on
    unknown codec names) — never raises, so one binary or mislabeled
    payload cannot kill the archive's task."""
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            try:
                return body.decode(m.group(1), errors="replace")
            except LookupError:
                pass  # unknown codec name → the undeclared path
        if "html" in content_type.lower():
            label = _sniff_meta_charset(body[:1024])
            if label:
                try:
                    return body.decode(label, errors="replace")
                except LookupError:
                    pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


def _parse_header_block(block: bytes, what: str) -> dict[str, str]:
    """``Name: value`` lines → dict with case-insensitive (lowered)
    keys. ASCII per spec; loud on a line without a colon."""
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed {what} header line: {line[:60]!r}")
        headers[name.decode("ascii").strip().lower()] = value.decode(
            "ascii", errors="replace"
        ).strip()
    return headers


def parse_warc_bytes(payload: bytes) -> List[dict]:
    """Walk one WARC file's bytes into a list of record dicts:
    ``{warc_type, uri, http_status, content_type, body}``. Non-HTTP
    record payloads (warcinfo, metadata) carry ``http_status=None``
    and their raw payload text as ``body``; request records are
    HTTP-split like responses (headers stripped, ``http_status``
    stays None — requests have no status line) and callers filter
    them by type. Framing is strict (see module docstring); body
    decode is tolerant (:func:`_decode_body`). ``.warc.gz`` bytes
    (gzip magic) are walked member-by-member, each member parsed
    under the same strict framing — a record spanning two members is
    a truncation error, exactly as the per-record-member convention
    implies."""
    if payload[:2] == _GZIP_MAGIC:
        out: List[dict] = []
        for member in _gzip_members(payload):
            out.extend(_parse_warc_stream(member))
        return out
    return _parse_warc_stream(payload)


def _parse_warc_stream(payload: bytes) -> List[dict]:
    out: List[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos:pos + 5] != b"WARC/":
            raise ValueError(
                f"expected WARC version line at offset {pos}, got "
                f"{payload[pos:pos + 20]!r}"
            )
        hdr_end = payload.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC record header")
        version_end = payload.find(_CRLF, pos)
        headers = _parse_header_block(
            payload[version_end + 2:hdr_end], "WARC"
        )
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["content-length"])
        if clen < 0:
            # a negative length would walk pos BACKWARD into the
            # record's own bytes and re-parse payload as records —
            # exactly the silent mis-parse the strict contract forbids
            raise ValueError(f"negative WARC Content-Length: {clen}")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("truncated WARC record payload")
        raw = payload[body_start:body_start + clen]
        wtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri")
        status: int | None = None
        ctype: str | None = None
        location: str | None = None
        body = raw
        # HTTP-split both message shapes: responses open with the
        # protocol token (``HTTP/1.1 200 OK``), requests END their
        # request line with it (``GET /x HTTP/1.1``) — a request
        # payload never starts with ``HTTP/``, so each type needs its
        # own detection
        first_line = raw.split(_CRLF, 1)[0]
        is_http = (
            wtype == "response" and raw[:5] == b"HTTP/"
        ) or (
            wtype == "request" and b" HTTP/" in first_line
        )
        if is_http:
            http_end = raw.find(_SEP)
            if http_end < 0:
                raise ValueError("HTTP payload without header terminator")
            start_line, _, hdr_block = raw[:http_end].partition(_CRLF)
            if wtype == "response":
                parts = start_line.split(b" ", 2)
                if len(parts) < 2:
                    raise ValueError(
                        f"malformed HTTP status line: {start_line[:60]!r}"
                    )
                status = int(parts[1])
            http_headers = _parse_header_block(hdr_block, "HTTP")
            ctype = http_headers.get("content-type")
            # the redirect-aliasing input (RFC 9110 §10.2.2): kept
            # raw here — it may be relative; resolution against the
            # record URI is extract_redirects' job
            location = http_headers.get("location")
            body = raw[http_end + 4:]
        out.append(
            {
                "warc_type": wtype,
                "uri": uri,
                "http_status": status,
                "content_type": ctype,
                "http_location": location,
                "body": _decode_body(body, ctype),
            }
        )
        pos = body_start + clen
        # records are separated by exactly one blank line (2x CRLF)
        if payload[pos:pos + 4] == _SEP:
            pos += 4
        elif pos != n:
            raise ValueError(
                f"missing record separator at offset {pos}: "
                f"{payload[pos:pos + 8]!r}"
            )
    return out


def parse_warc_records(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Explode WARC file blobs into records — one Arrow ``mapInPandas``
    pass, one output row per record: ``(uri, warc_type, http_status,
    content_type, body)``. Archive bytes never shuffle; downstream
    stages (HTML extraction, dedup) see only record-sized rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows: List[Tuple] = []
            for blob in pdf[payload_col]:
                for r in parse_warc_bytes(bytes(blob)):
                    rows.append(
                        (
                            r["uri"],
                            r["warc_type"],
                            r["http_status"],
                            r["content_type"],
                            r["http_location"],
                            r["body"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "uri", "warc_type", "http_status", "content_type",
                    "http_location", "body",
                ],
            ).astype({"http_status": "Int64"})

    return df.select(payload_col).mapInPandas(
        run,
        "uri string, warc_type string, http_status long, "
        "content_type string, http_location string, body string",
    )


def html_responses(records: DataFrame) -> DataFrame:
    """THE keep-filter of the crawl-ingestion chain: HTTP-200
    ``text/html`` response records of a :func:`parse_warc_records`
    frame as ``(uri, html)`` pages — warcinfo/request/redirect
    records drop by type/status here. One function, every face
    (``q_extract_warc``, ``q_extract_warc_gz``,
    ``streaming.filters.stream_ingest_warc``), so the acceptance
    rule cannot drift between them (r16 review: the filter existed
    as three inline copies). Pure JVM predicate — runs before any
    Arrow stage downstream."""
    from pyspark.sql import functions as F

    return records.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select("uri", F.col("body").alias("html"))


def extract_redirects(records: DataFrame) -> DataFrame:
    """Redirect-edge extraction (r16, r15 verdict task 5): the
    ``(uri → location)`` aliasing pairs every crawl graph consumes —
    3xx ``Location`` headers are the canonical-URL aliasing input
    upstream of ``q_dedup_canonical_rank`` and the canonicalizer
    (two spellings a server itself declares equivalent). Input is
    :func:`parse_warc_records` output (or its streaming face); rows
    are HTTP-3xx response records carrying a ``Location``; output is
    ``(uri, http_status, location, target)`` where ``location`` is
    the raw header value and ``target`` resolves it against the
    record URI per RFC 3986 §5 (RFC 9110 §10.2.2 allows relative
    Location values; an unresolvable pair keeps ``target`` = raw).

    Scale shape: a JVM filter prunes to the 3xx slice BEFORE the
    Arrow resolution pass, so only redirect-sized rows — never
    bodies, never archives — cross into Python; stateless and
    append-safe, so the same function is the streaming face's
    engine."""
    from pyspark.sql import functions as F

    from flink_join_scaling_spark.operators.html_extract import (
        resolve_href,
    )

    slim = records.where(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(300, 399)
        & F.col("http_location").isNotNull()
    ).select("uri", "http_status", F.col("http_location").alias("location"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["target"] = [
                resolve_href(u, loc) if isinstance(u, str) and u else loc
                for u, loc in zip(pdf["uri"], pdf["location"])
            ]
            yield pdf

    return slim.mapInPandas(
        run,
        "uri string, http_status long, location string, target string",
    )


def resolve_redirect_chains(
    edges: DataFrame,
    max_hops: int = 8,
    uri_col: str = "uri",
    target_col: str = "target",
) -> DataFrame:
    """Collapse multi-hop redirect chains to their final targets —
    the step after :func:`extract_redirects` every crawl graph runs:
    ``a→b``, ``b→c`` must alias BOTH a and b to c, or downstream
    canonical-URL dedup merges only half the chain. Output:
    ``(uri, final_target, hops, resolved)`` per distinct source URI;
    ``resolved=false`` marks chains longer than ``max_hops`` and
    CYCLES (``x→y→x`` — real crawls contain them; browsers give up
    exactly the same way, typically after ~20 hops, fetch specs say
    20, curl defaults to 50 — callers pick the budget), and on such
    rows ``hops`` is NULL — the jumping rounds leave only an
    artifact count there, never a chain length.

    Algorithm: POINTER JUMPING over the functional graph (one
    outgoing edge per source — duplicate observations of a URI keep
    the lexicographically-least target for determinism):
    ``⌈log2(max_hops)⌉`` rounds of self-join double the hop span
    each round, so an 8-hop budget costs 3 edge-sized shuffles —
    never a per-hop loop, never a driver walk. The same
    doubling-contraction idea as ``operators.dedup``'s distributed
    ``connected_components`` lane, specialized to out-degree-1
    graphs where it needs no convergence check. A URI whose final
    pointer still lands on another SOURCE after the rounds has an
    unexhausted chain (too long, or cyclic) and is flagged rather
    than half-resolved. Batch-only, like ``connected_components``
    (iterative self-joins have no incremental streaming form);
    at crawl scale every frame here is redirect-sized, orders of
    magnitude below the page corpus."""
    import math

    from pyspark.sql import functions as F

    m = (
        edges.select(
            F.col(uri_col).alias("_src"), F.col(target_col).alias("_t")
        )
        .where(F.col("_src").isNotNull() & F.col("_t").isNotNull())
        .groupBy("_src")
        .agg(F.min("_t").alias("_t"))
    )
    cur = m.select(
        "_src",
        F.col("_t").alias("_dst"),
        F.lit(1).cast("long").alias("_hops"),
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        hop = cur.select(
            F.col("_src").alias("_dst"),
            F.col("_dst").alias("_dst2"),
            F.col("_hops").alias("_h2"),
        )
        cur = cur.join(hop, "_dst", "left").select(
            "_src",
            F.coalesce("_dst2", F.col("_dst")).alias("_dst"),
            (F.col("_hops") + F.coalesce("_h2", F.lit(0))).alias("_hops"),
        )
    # a final pointer that is still some chain's SOURCE means the
    # budget did not exhaust the chain (length > max_hops, or cycle)
    keys = m.select(F.col("_src").alias("_dst"), F.lit(True).alias("_k"))
    resolved = F.col("_k").isNull() & (F.col("_hops") <= max_hops)
    return cur.join(keys, "_dst", "left").select(
        F.col("_src").alias(uri_col),
        F.col("_dst").alias("final_target"),
        # hops is a true chain length ONLY when resolved — on a
        # flagged row the doubling rounds leave an artifact count
        # (a self-loop would read 2^rounds), so emit NULL instead
        # of a meaningless number
        F.when(resolved, F.col("_hops")).alias("hops"),
        resolved.alias("resolved"),
    )


# ---------------------------------------------------------------- #
# synthetic fixture                                                  #
# ---------------------------------------------------------------- #

def _record(wtype: str, payload: bytes, extra: dict[str, str]) -> bytes:
    rid = hashlib.md5(
        f"warc_{wtype}_{extra.get('WARC-Target-URI', '')}".encode()
    ).hexdigest()
    headers = {
        "WARC-Type": wtype,
        "WARC-Record-ID": f"<urn:uuid:{rid}>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        **extra,
        "Content-Length": str(len(payload)),
    }
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("ascii") for k, v in headers.items()
    )
    return head + _CRLF + payload + _SEP


#: Article-text suffix of the planted meta-charset pages — contains
#: ``€`` (cp1252 0x80), a byte that is INVALID standalone UTF-8 and
#: decodes to the C1 control U+0080 under the latin-1 fallback, so
#: only the HTML5 meta prescan recovers the true character: any
#: regression in the sniff flips the driver hash of
#: ``q_extract_warc_gz``.
META_CHARSET_MARKER = " price: €99"


def synth_warc_record_blobs(
    group: List[Tuple[int, str]],
    plant_meta_charset: bool = False,
    plant_redirects: bool = False,
) -> List[bytes]:
    """The individual record blobs (each WITH its trailing blank-line
    separator) behind :func:`synth_warc` — a warcinfo record, then per
    (doc_id, text) document a request and a response record. Exposed
    so tests can gzip each blob into its own member, reproducing the
    Common Crawl ``.warc.gz`` record-per-member layout exactly.

    ``plant_meta_charset`` (r16): every ``doc_id % 10 == 3`` document
    is served as a **windows-1252** page whose HTTP ``Content-Type``
    declares NO charset — the encoding is declared only by an
    injected ``<meta charset="windows-1252">`` tag, and the article
    text gains :data:`META_CHARSET_MARKER` (``€`` = 0x80, invalid
    standalone UTF-8, a C1 control under latin-1), so the HTML5
    prescan path in :func:`_decode_body` is what the driver hash
    value-checks. ``plant_redirects`` (r16): every ``doc_id % 4 ==
    1`` document additionally gets a 301 response record at
    ``…/old/{doc_id}`` whose RELATIVE ``Location: /doc/{doc_id}``
    must resolve against the record URI — the
    :func:`extract_redirects` fixture. Both default OFF so existing
    fixtures stay byte-identical."""
    from flink_join_scaling_spark.operators.html_extract import synth_html

    blobs: List[bytes] = [
        _record(
            "warcinfo",
            b"software: fjss-synth/1.0\r\nformat: WARC File Format 1.0\r\n",
            {"Content-Type": "application/warc-fields"},
        )
    ]
    for doc_id, text in group:
        uri = f"http://example.com/doc/{doc_id}"
        req = (
            b"GET /doc/" + str(doc_id).encode() + b" HTTP/1.1\r\n"
            b"Host: example.com\r\nUser-Agent: fjss-crawler/1.0\r\n\r\n"
        )
        blobs.append(
            _record(
                "request", req,
                {
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http;msgtype=request",
                },
            )
        )
        if plant_redirects and doc_id % 4 == 1:
            redirect = (
                b"HTTP/1.1 301 Moved Permanently\r\n"
                b"Location: /doc/" + str(doc_id).encode() + b"\r\n"
                b"Content-Length: 0\r\n\r\n"
            )
            blobs.append(
                _record(
                    "response", redirect,
                    {
                        "WARC-Target-URI":
                            f"http://example.com/old/{doc_id}",
                        "Content-Type":
                            "application/http;msgtype=response",
                    },
                )
            )
        if plant_meta_charset and doc_id % 10 == 3:
            page = synth_html(doc_id, text + META_CHARSET_MARKER)
            page = page.replace(
                "<head>", '<head><meta charset="windows-1252">', 1
            )
            html_bytes = page.encode("cp1252")
            ctype = b"Content-Type: text/html\r\n"
        else:
            html_bytes = synth_html(doc_id, text).encode("utf-8")
            ctype = b"Content-Type: text/html; charset=utf-8\r\n"
        resp = (
            b"HTTP/1.1 200 OK\r\n" + ctype
            + b"Content-Length: " + str(len(html_bytes)).encode() + b"\r\n"
            b"\r\n" + html_bytes
        )
        blobs.append(
            _record(
                "response", resp,
                {
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http;msgtype=response",
                },
            )
        )
    return blobs


def synth_warc(
    group: List[Tuple[int, str]],
    plant_meta_charset: bool = False,
    plant_redirects: bool = False,
) -> bytes:
    """One deterministic WARC file for a group of (doc_id, text)
    documents: a warcinfo record, then per document a request record
    (skipped by type downstream) and a response record whose HTTP
    body is the :func:`synth_html` page for
    ``http://example.com/doc/{doc_id}``; plant flags per
    :func:`synth_warc_record_blobs`. The final-record layout rule —
    no separator after the last record — lives HERE only."""
    return b"".join(
        synth_warc_record_blobs(
            group,
            plant_meta_charset=plant_meta_charset,
            plant_redirects=plant_redirects,
        )
    )[:-4]


def attach_synth_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_size: int = 10,
    gzip_members: bool = False,
    plant_meta_charset: bool = False,
    plant_redirects: bool = False,
) -> DataFrame:
    """(warc_id, payload) blobs packing each ``group_size`` consecutive
    ids' documents into one WARC file — the archive-directory stand-in
    (this container ships no .warc files). The grouping shuffle
    carries (id, ~500 B text) rows and is FIXTURE SCAFFOLDING only:
    production reads existing archives via ``binaryFile`` with zero
    shuffles. Documents sort by id within a blob so the fixture bytes
    are deterministic. ``gzip_members=True`` emits the Common Crawl
    ``.warc.gz`` layout instead — every record its own gzip member
    (``mtime=0`` so the bytes stay deterministic)."""
    from pyspark.sql import functions as F

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        group = [(int(i), t) for i, t in zip(pdf[id_col], pdf[text_col])]
        if gzip_members:
            blob = b"".join(
                gzip.compress(b, mtime=0)
                for b in synth_warc_record_blobs(
                    group,
                    plant_meta_charset=plant_meta_charset,
                    plant_redirects=plant_redirects,
                )
            )
        else:
            blob = synth_warc(
                group,
                plant_meta_charset=plant_meta_charset,
                plant_redirects=plant_redirects,
            )
        return pd.DataFrame(
            {"warc_id": [int(pdf["__warc_id"].iloc[0])], "payload": [blob]}
        )

    return (
        df.select(id_col, text_col)
        .withColumn(
            "__warc_id", F.floor(F.col(id_col) / group_size).cast("long")
        )
        .groupBy("__warc_id")
        .applyInPandas(build, "warc_id long, payload binary")
    )
