"""Sitemap ingestion (sources/sitemap.py): urlset/index parsing,
tolerant handling of real-world malformations, hostile-input bounds
(zip bomb, entry cap, unclosed-tag floods), and the Spark explode
face."""

from __future__ import annotations

import gzip

import pytest

from flink_join_scaling_spark.sources import sitemap as sm

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://site.org/page?a=1&amp;b=2</loc>
    <lastmod>2026-01-02</lastmod>
  </url>
  <url><loc> https://site.org/plain </loc></url>
  <url><priority>0.5</priority></url>
  <url><loc><![CDATA[https://site.org/cdata]]></loc></url>
</urlset>
"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://site.org/sitemap-1.xml.gz</loc>
    <lastmod>2026-02-03T04:05:06Z</lastmod></sitemap>
  <sitemap><loc>https://site.org/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_urlset_parse_entities_cdata_lastmod():
    kind, entries = sm.parse_sitemap(URLSET)
    assert kind == "urlset"
    assert entries == [
        ("https://site.org/page?a=1&b=2", "2026-01-02"),
        ("https://site.org/plain", None),
        ("https://site.org/cdata", None),
    ]


def test_index_parse_and_namespace_prefixes():
    kind, entries = sm.parse_sitemap(INDEX)
    assert kind == "index"
    assert entries == [
        ("https://site.org/sitemap-1.xml.gz", "2026-02-03T04:05:06Z"),
        ("https://site.org/sitemap-2.xml.gz", None),
    ]
    # namespace-prefixed spelling (real-world exports)
    pre = (
        b'<sm:urlset xmlns:sm="x"><sm:url><sm:loc>http://h/a</sm:loc>'
        b"</sm:url></sm:urlset>"
    )
    assert sm.parse_sitemap(pre) == ("urlset", [("http://h/a", None)])


def test_gzip_payload_and_bomb_refusal(monkeypatch):
    gz = gzip.compress(URLSET, mtime=0)
    assert sm.parse_sitemap(gz)[1][0][0].endswith("b=2")
    # a decompression bomb refuses loudly at the cap
    monkeypatch.setattr(sm, "_MAX_DECOMPRESSED", 1 << 16)
    bomb = gzip.compress(b"<urlset>" + b"\x00" * (1 << 20), mtime=0)
    with pytest.raises(ValueError, match="decompression bomb"):
        sm.parse_sitemap(bomb)
    # an uncompressed oversized payload refuses too
    with pytest.raises(ValueError, match="exceeds"):
        sm.parse_sitemap(b"x" * ((1 << 16) + 1))


def test_entry_cap_refuses(monkeypatch):
    monkeypatch.setattr(sm, "_MAX_ENTRIES", 3)
    body = b"<urlset>" + b"".join(
        b"<url><loc>http://h/%d</loc></url>" % i for i in range(5)
    ) + b"</urlset>"
    with pytest.raises(ValueError, match="more than 3 entries"):
        sm.parse_sitemap(body)


def test_malformed_input_is_tolerated_and_linear():
    import time

    # junk between blocks, stray closers, unclosed opens
    messy = (
        b"garbage <url><loc>http://h/kept</loc></url> tail"
        b"</url><url><loc>"
    )
    assert sm.parse_sitemap(messy) == ("urlset", [("http://h/kept", None)])
    # a flood of unclosed <url> opens must parse in linear-ish time
    # (the quadratic finditer shape this parser deliberately avoids)
    flood = b"<urlset>" + b"<url>" * 200_000 + b"</urlset>"
    t0 = time.monotonic()
    kind, entries = sm.parse_sitemap(flood)
    assert entries == [] and time.monotonic() - t0 < 5.0
    # empty and binary junk never raise
    assert sm.parse_sitemap(b"") == ("urlset", [])
    assert sm.parse_sitemap(bytes(range(256)))[1] == []


def test_spark_explode_face(spark):
    rows = [
        ("https://site.org/sitemap.xml", bytearray(URLSET)),
        ("https://site.org/sitemap_index.xml", bytearray(INDEX)),
        (
            "https://site.org/sitemap.xml.gz",
            bytearray(gzip.compress(URLSET, mtime=0)),
        ),
    ]
    df = spark.createDataFrame(rows, "sitemap_url string, payload binary")
    out = sm.sitemap_entries(df)
    got = [
        (r.sitemap_url, r.kind, r.loc, r.lastmod) for r in out.collect()
    ]
    assert (
        "https://site.org/sitemap_index.xml", "sitemap",
        "https://site.org/sitemap-1.xml.gz", "2026-02-03T04:05:06Z",
    ) in got
    urls = [g for g in got if g[1] == "url"]
    assert len(urls) == 6  # 3 entries from each urlset spelling
    # plan shape: map-only, payloads never shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
