"""Sitemap ingestion (sitemaps.org protocol, the format RFC 9309's
``Sitemap:`` lines point at) — the frontier-SEEDING stage beside the
robots policy filter: a crawl starts from the URLs a host publishes,
then expands through ``extract_links``; both feeds meet in the same
canonicalize → robots-filter → dedup pipeline.

Dependency-free, tolerant, hostile-input-safe parsing:

- **No XML library.** Sitemap bytes are remote-host-controlled and
  real-world files are routinely malformed; stdlib ``xml.etree`` is
  documented vulnerable to entity-expansion blowups. A bounded
  regex block-walk over ``<url>`` / ``<sitemap>`` elements extracts
  ``<loc>`` (required) and ``<lastmod>`` (optional), tolerating
  namespace prefixes, attribute noise, CDATA, and junk between
  blocks. The alternation is prefix-disjoint — linear scan, no
  catastrophic backtracking.
- **Index vs urlset** (the protocol's two roots): a
  ``<sitemapindex>`` yields ``kind='sitemap'`` rows (children for
  the fetcher to follow — recursion is a FETCH concern, so it stays
  with the crawler), a ``<urlset>`` yields ``kind='url'`` rows.
- **Spec limits enforced as refusal bounds**: ≤ 50,000 entries per
  file and ≤ 64 MiB decompressed; gzipped payloads (``.xml.gz`` is
  ubiquitous) decompress through a BOUNDED stdlib-zlib loop so a
  zip bomb dies at the cap instead of exhausting executor memory.

Scale shape: one Arrow ``mapInPandas`` pass over (sitemap_url,
payload) rows — the :mod:`sources.warc` container discipline;
payload bytes never shuffle and only (loc, lastmod)-sized rows come
back.
"""

from __future__ import annotations

import re
import zlib
from html import unescape
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "parse_sitemap",
    "sitemap_entries",
]

_GZIP_MAGIC = b"\x1f\x8b"
#: protocol limit: a sitemap file may carry at most 50k entries
_MAX_ENTRIES = 50_000
#: protocol limit is 50 MiB uncompressed; we allow a little slack
_MAX_DECOMPRESSED = 64 * 1024 * 1024

#: entry blocks are walked by SPLITTING on closing tags and taking
#: the text after the last opening tag in each piece — strictly
#: linear over the document, where a naive ``<url>(.*?)</url>``
#: finditer degrades quadratically on a hostile file of unclosed
#: opens (remote-controlled input, the robots-matcher lesson)
_CLOSE_SPLIT_RE = re.compile(
    r"</(?:[A-Za-z0-9_.\-]+:)?(?:url|sitemap)\s*>", re.I
)
_OPEN_RE = re.compile(
    r"<(?:[A-Za-z0-9_.\-]+:)?(?:url|sitemap)\b[^>]*>", re.I
)
_LOC_RE = re.compile(
    r"<(?:[A-Za-z0-9_.\-]+:)?loc\b[^>]*>\s*(?:<!\[CDATA\[)?(.*?)"
    r"(?:\]\]>)?\s*</(?:[A-Za-z0-9_.\-]+:)?loc\s*>",
    re.I | re.S,
)
_LASTMOD_RE = re.compile(
    r"<(?:[A-Za-z0-9_.\-]+:)?lastmod\b[^>]*>\s*(.*?)\s*"
    r"</(?:[A-Za-z0-9_.\-]+:)?lastmod\s*>",
    re.I | re.S,
)
_INDEX_ROOT_RE = re.compile(rb"<\s*(?:[A-Za-z0-9_.\-]+:)?sitemapindex\b", re.I)


def _gunzip_bounded(payload: bytes) -> bytes:
    """Decompress a gzip payload with a hard output cap — a zip bomb
    refuses loudly at ``_MAX_DECOMPRESSED`` instead of exhausting the
    task's memory. Bounded-chunk feed, the warc member-walk
    discipline."""
    d = zlib.decompressobj(47)
    out: List[bytes] = []
    total = 0
    pos = 0
    mv = memoryview(payload)
    while pos < len(payload) and not d.eof:
        piece = d.decompress(mv[pos:pos + (1 << 18)], _MAX_DECOMPRESSED)
        pos += 1 << 18
        total += len(piece)
        out.append(piece)
        if d.unconsumed_tail or total > _MAX_DECOMPRESSED:
            raise ValueError(
                f"sitemap decompresses past {_MAX_DECOMPRESSED} bytes "
                "— refusing a possible decompression bomb"
            )
    return b"".join(out)


def parse_sitemap(payload: bytes) -> Tuple[str, List[Tuple[str, str | None]]]:
    """One sitemap file's bytes → ``(kind, [(loc, lastmod), ...])``
    where ``kind`` is ``'index'`` (children are sitemaps) or
    ``'urlset'``. Gzip payloads are transparently (boundedly)
    decompressed; text decodes as UTF-8 with ``errors='replace'``
    (the spec mandates UTF-8; a stray byte must not kill the task);
    entities in ``<loc>`` unescape (``&amp;`` is ubiquitous in query
    URLs); entries beyond the spec's 50k cap refuse loudly."""
    if payload[:2] == _GZIP_MAGIC:
        payload = _gunzip_bounded(payload)
    elif len(payload) > _MAX_DECOMPRESSED:
        raise ValueError(
            f"sitemap exceeds {_MAX_DECOMPRESSED} bytes — refusing"
        )
    kind = "index" if _INDEX_ROOT_RE.search(payload[:4096]) else "urlset"
    text = payload.decode("utf-8", errors="replace")
    entries: List[Tuple[str, str | None]] = []
    for piece in _CLOSE_SPLIT_RE.split(text)[:-1]:
        start = None
        for om in _OPEN_RE.finditer(piece):
            start = om.end()  # the LAST open before this close wins
        if start is None:
            continue  # stray closing tag with no open: junk
        block = piece[start:]
        lm = _LOC_RE.search(block)
        if not lm:
            continue  # a block without <loc> is junk, skip it
        loc = unescape(lm.group(1).strip())
        if not loc:
            continue
        mm = _LASTMOD_RE.search(block)
        entries.append((loc, mm.group(1).strip() if mm else None))
        if len(entries) > _MAX_ENTRIES:
            raise ValueError(
                f"sitemap carries more than {_MAX_ENTRIES} entries — "
                "beyond the protocol limit, refusing"
            )
    return kind, entries


def sitemap_entries(
    df: DataFrame,
    url_col: str = "sitemap_url",
    payload_col: str = "payload",
) -> DataFrame:
    """Explode fetched sitemap files into frontier rows —
    ``(sitemap_url, kind, loc, lastmod)`` with ``kind='sitemap'``
    for index children (the fetcher follows them) and ``kind='url'``
    for page URLs (they join ``extract_links`` output in the
    canonicalize → robots-filter → dedup pipeline). One map-only
    Arrow pass; payload bytes never shuffle. Stateless, so the same
    pass runs under ``readStream`` over a landing directory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows: List[Tuple] = []
            for u, blob in zip(pdf[url_col], pdf[payload_col]):
                kind, entries = parse_sitemap(bytes(blob))
                child = "sitemap" if kind == "index" else "url"
                for loc, lastmod in entries:
                    rows.append((u, child, loc, lastmod))
            yield pd.DataFrame(
                rows,
                columns=[url_col, "kind", "loc", "lastmod"],
            )

    return df.select(url_col, payload_col).mapInPandas(
        run, f"{url_col} string, kind string, loc string, lastmod string"
    )
