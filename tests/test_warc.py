"""WARC container source (sources/warc.py): strict record-walk
semantics against hand-built and fixture bytes, loud refusals on
malformed archives, and the Spark explode face."""

from __future__ import annotations

import gzip

import pytest

from flink_join_scaling_spark.sources import warc as wc

DOCS = [(1, "alpha beta gamma " * 5), (2, "delta epsilon zeta " * 5)]


def test_synth_warc_round_trip_structure():
    recs = wc.parse_warc_bytes(wc.synth_warc(DOCS))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "request", "response"
    ]
    assert recs[0]["http_status"] is None
    assert "software: fjss-synth" in recs[0]["body"]
    for (doc_id, text), req, resp in zip(DOCS, recs[1::2], recs[2::2]):
        assert req["uri"] == resp["uri"] == f"http://example.com/doc/{doc_id}"
        assert req["http_status"] is None  # requests carry no status
        assert req["body"] == ""  # HTTP-split: headers stripped, no body
        assert resp["http_status"] == 200
        assert resp["content_type"].startswith("text/html")
        assert text.strip() in resp["body"]  # the planted article


def test_hand_built_record_parses():
    body = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
    raw = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/y\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body
    )
    [r] = wc.parse_warc_bytes(raw)
    assert r["http_status"] == 404
    assert r["content_type"] == "text/plain"
    assert r["body"] == "gone"
    assert r["uri"] == "http://x/y"


def test_strict_refusals():
    good = wc.synth_warc(DOCS)
    cases = [
        (b"NOTWARC/1.0\r\n\r\n", "expected WARC version line"),
        (b"WARC/1.0\r\nWARC-Type: response\r\n", "truncated WARC record header"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n", "missing Content-Length"),
        # a negative length would walk backward and re-parse payload
        # bytes as sibling records — must refuse, not mis-parse
        (
            b"WARC/1.0\r\nContent-Length: -4\r\n\r\n"
            b"WARC/1.0\r\nContent-Length: 2\r\n\r\nhi",
            "negative WARC Content-Length",
        ),
        (good[:-10], "truncated WARC record payload"),
        # payload shorter than declared -> next walk lands mid-bytes
        (
            b"WARC/1.0\r\nContent-Length: 4\r\n\r\nabcdXtrailing",
            "missing record separator",
        ),
        (
            b"WARC/1.0\r\nbadheaderline\r\nContent-Length: 0\r\n\r\n",
            "malformed WARC header line",
        ),
        (
            b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 11\r\n\r\n"
            b"HTTP/1.1\r\n\r\n"[:-4] + b"\r\n\r\n",
            "HTTP payload without header terminator",
        ),
    ]
    for raw, msg in cases:
        with pytest.raises(ValueError, match=msg):
            wc.parse_warc_bytes(raw)


def test_warc_gz_member_per_record_round_trip():
    # the Common Crawl layout: every record its own gzip member,
    # members concatenated — parse must see the same records as the
    # uncompressed archive
    blobs = wc.synth_warc_record_blobs(DOCS)
    gz = b"".join(gzip.compress(b, mtime=0) for b in blobs)
    assert gz[:2] == b"\x1f\x8b"
    recs = wc.parse_warc_bytes(gz)
    plain = wc.parse_warc_bytes(wc.synth_warc(DOCS))
    assert recs == plain
    assert len(recs) == 5


def test_warc_gz_multi_record_member_and_single_member():
    # the member convention is per-record but NOT mandated by the spec:
    # a member holding several whole records must parse too, as must a
    # whole-file single member
    blobs = wc.synth_warc_record_blobs(DOCS)
    multi = gzip.compress(b"".join(blobs[:3]), mtime=0) + gzip.compress(
        b"".join(blobs[3:]), mtime=0
    )
    whole = gzip.compress(b"".join(blobs), mtime=0)
    plain = wc.parse_warc_bytes(wc.synth_warc(DOCS))
    assert wc.parse_warc_bytes(multi) == plain
    assert wc.parse_warc_bytes(whole) == plain


def test_warc_gz_chunk_seams(monkeypatch):
    """The bounded-chunk walk at pathological feed sizes: every chunk
    size from 1 byte up forces gzip member headers, deflate data, and
    8-byte trailers to straddle chunk seams — the paths the 256 KiB
    production chunk never exercises on small fixtures. Parse must be
    byte-identical at every size, and truncation must stay loud."""
    blobs = wc.synth_warc_record_blobs(DOCS)
    gz = b"".join(gzip.compress(b, mtime=0) for b in blobs)
    expected = wc.parse_warc_bytes(gz)
    for size in (1, 2, 3, 5, 7, 8, 9, 16, 31, 64, 1009):
        monkeypatch.setattr(wc, "_GZ_CHUNK", size)
        assert wc.parse_warc_bytes(gz) == expected, size
        with pytest.raises(ValueError, match="truncated gzip member"):
            wc.parse_warc_bytes(gz[:-3])
    monkeypatch.setattr(wc, "_GZ_CHUNK", 1 << 18)


def test_warc_gz_strict_refusals():
    blobs = wc.synth_warc_record_blobs(DOCS)
    gz = b"".join(gzip.compress(b, mtime=0) for b in blobs)
    # truncated final member
    with pytest.raises(ValueError, match="truncated gzip member"):
        wc.parse_warc_bytes(gz[:-6])
    # non-gzip bytes between members: loud, no resync
    with pytest.raises(ValueError, match="expected gzip member"):
        wc.parse_warc_bytes(gz + b"JUNK")
    # a record split MID-BYTES across two members is a per-member
    # truncation, exactly what the strict contract demands
    rec = blobs[0]
    split = gzip.compress(rec[:40], mtime=0) + gzip.compress(
        rec[40:], mtime=0
    )
    with pytest.raises(ValueError, match="truncated WARC record"):
        wc.parse_warc_bytes(split)


def test_body_decode_charset_and_binary_tolerance():
    # declared charset wins
    latin = "café résumé".encode("latin-1")
    resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=latin-1\r\n\r\n" + latin
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/l\r\n"
        b"Content-Length: " + str(len(resp)).encode() + b"\r\n\r\n" + resp
    )
    [r] = wc.parse_warc_bytes(raw)
    assert r["body"] == "café résumé"

    # undeclared non-UTF-8 text falls back to latin-1, never raises
    resp2 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        + "naïve".encode("latin-1")
    )
    raw2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(resp2)).encode() + b"\r\n\r\n" + resp2
    )
    [r2] = wc.parse_warc_bytes(raw2)
    assert r2["body"] == "naïve"

    # a binary payload (invalid UTF-8 everywhere) must not kill the
    # archive; latin-1 keeps it byte-exact for re-encoding
    png = bytes(range(256)) * 4
    resp3 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n" + png
    )
    raw3 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(resp3)).encode() + b"\r\n\r\n" + resp3
    )
    [r3] = wc.parse_warc_bytes(raw3)
    assert r3["content_type"] == "image/png"
    assert r3["body"].encode("latin-1") == png

    # unknown declared codec falls through to the undeclared path
    resp4 = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=x-bogus-9\r\n\r\nplain"
    )
    raw4 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: " + str(len(resp4)).encode() + b"\r\n\r\n" + resp4
    )
    [r4] = wc.parse_warc_bytes(raw4)
    assert r4["body"] == "plain"


def _response_record(resp: bytes, uri: bytes = b"http://x/r") -> bytes:
    # trailing blank-line separator included, like synth blobs; a
    # caller joining several records strips the final one with [:-4]
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Length: " + str(len(resp)).encode() + b"\r\n\r\n"
        + resp + b"\r\n\r\n"
    )


def test_single_quoted_charset_parameter():
    # charset='shift_jis' (single quotes) appears in real archives —
    # the r15 advisor case: a double-quote-only pattern mojibake'd it
    body = "日本語".encode("shift_jis")
    resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset='shift_jis'\r\n\r\n" + body
    )
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert r["body"] == "日本語"


def test_meta_charset_prescan():
    # HTTP header declares no charset; HTML5 prescan finds the meta
    # tag within the first 1024 bytes (all three spellings)
    for meta in (
        b'<meta charset="shift_jis">',
        b"<meta charset='shift_jis'>",
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=shift_jis">',
    ):
        body = (
            b"<html><head>" + meta + b"</head><body>"
            + "日本語のページ".encode("shift_jis") + b"</body></html>"
        )
        resp = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        [r] = wc.parse_warc_bytes(_response_record(resp))
        assert "日本語のページ" in r["body"], meta

    # an HTTP-declared charset WINS over a conflicting meta tag
    body = (
        b'<html><head><meta charset="shift_jis"></head><body>'
        + "café".encode("latin-1") + b"</body></html>"
    )
    resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=latin-1\r\n\r\n" + body
    )
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "café" in r["body"]

    # prescan window: a meta tag past the first 1024 bytes is NOT
    # honored (the HTML5 rule) — the body takes the latin-1 fallback
    body = (
        b"<html><head>" + b"<!--" + b"x" * 1100 + b"-->"
        + b'<meta charset="shift_jis"></head><body>'
        + "日本".encode("shift_jis") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" not in r["body"]

    # non-HTML payloads are never sniffed: the same bytes under
    # text/plain take the strict-UTF-8 → latin-1 path
    body = b'<meta charset="shift_jis">' + "日本".encode("shift_jis")
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" not in r["body"]
    assert r["body"].startswith('<meta charset="shift_jis">')


def test_meta_charset_prescan_is_attribute_aware():
    """The r16 review repros: 'charset=' in PROSE (a description
    meta's content value) or inside a comment must not win, and the
    HTML5 label remaps apply (a sniffed utf-16 label means the
    markup was ASCII-compatible → decode utf-8; x-user-defined →
    windows-1252)."""
    # prose false positive: the page is plain UTF-8 and must stay so
    body = (
        b'<html><head><meta name="description" '
        b'content="how charset=utf-16 works"></head><body>'
        + "héllo wörld".encode("utf-8") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "héllo wörld" in r["body"]

    # commented-out meta is invisible to the prescan
    body = (
        b'<html><head><!-- <meta charset="shift_jis"> --></head>'
        b"<body>" + "日本".encode("shift_jis") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" not in r["body"]

    # an UNTERMINATED comment hides everything after its opener
    body = (
        b'<html><head><!-- <meta charset="shift_jis">'
        b"<body>" + "日本".encode("shift_jis")
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" not in r["body"]

    # spec remap: a sniffed utf-16 label decodes as utf-8
    body = (
        b'<html><head><meta charset="utf-16"></head><body>'
        + "héllo".encode("utf-8") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "héllo" in r["body"]

    # spec remap: x-user-defined → windows-1252
    body = (
        b'<html><head><meta charset="x-user-defined"></head><body>'
        + "€".encode("cp1252") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "€" in r["body"]

    # http-equiv form still honored with attributes in either order
    body = (
        b'<html><head><meta content="text/html; charset=shift_jis" '
        b'http-equiv="Content-Type"></head><body>'
        + "日本".encode("shift_jis") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" in r["body"]

    # a '>' INSIDE a quoted attribute value must not truncate the
    # tag and lose a following charset attribute (r16 review repro)
    body = (
        b'<html><head><meta data-x="a>b" charset="shift_jis"></head>'
        b"<body>" + "日本".encode("shift_jis") + b"</body></html>"
    )
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    [r] = wc.parse_warc_bytes(_response_record(resp))
    assert "日本" in r["body"]


def test_extract_redirects_resolution(spark):
    # hand-built archive: relative Location (must resolve against the
    # record URI), absolute Location (kept), a 200 with Location
    # (ignored — not a redirect), and a 3xx WITHOUT Location (no row)
    recs_bytes = b"".join([
        _response_record(
            b"HTTP/1.1 301 Moved Permanently\r\n"
            b"Location: /new/a\r\nContent-Length: 0\r\n\r\n",
            uri=b"http://site.org/old/a",
        ),
        _response_record(
            b"HTTP/1.1 302 Found\r\n"
            b"Location: https://other.org/b?x=1\r\n"
            b"Content-Length: 0\r\n\r\n",
            uri=b"http://site.org/old/b",
        ),
        _response_record(
            b"HTTP/1.1 200 OK\r\nLocation: /ignored\r\n"
            b"Content-Type: text/html\r\n\r\nok",
            uri=b"http://site.org/ok",
        ),
        _response_record(
            b"HTTP/1.1 304 Not Modified\r\nContent-Length: 0\r\n\r\n",
            uri=b"http://site.org/cached",
        ),
    ])[:-4]
    df = spark.createDataFrame(
        [(0, bytearray(recs_bytes))], "warc_id long, payload binary"
    )
    out = {
        r.uri: (r.http_status, r.location, r.target)
        for r in wc.extract_redirects(
            wc.parse_warc_records(df)
        ).collect()
    }
    assert out == {
        "http://site.org/old/a": (301, "/new/a", "http://site.org/new/a"),
        "http://site.org/old/b": (
            302, "https://other.org/b?x=1", "https://other.org/b?x=1"
        ),
    }


def test_resolve_redirect_chains(spark):
    """Pointer-jumping chain collapse: multi-hop chains resolve to
    the final target with exact hop counts, cycles and over-budget
    chains are FLAGGED (never half-resolved), and log2 rounds — not
    per-hop loops — cover the budget."""
    E = [
        # 3-hop chain: a → b → c → d
        ("a", "b"), ("b", "c"), ("c", "d"),
        # single hop
        ("solo", "end"),
        # 2-cycle and self-loop
        ("x", "y"), ("y", "x"), ("self", "self"),
        # duplicate observation of one source: deterministic min wins
        ("dup", "t2"), ("dup", "t1"),
    ]
    edges = spark.createDataFrame(E, "uri string, target string")
    out = {
        r.uri: (r.final_target, r.hops, r.resolved)
        for r in wc.resolve_redirect_chains(edges, max_hops=8).collect()
    }
    assert out["a"] == ("d", 3, True)
    assert out["b"] == ("d", 2, True)
    assert out["c"] == ("d", 1, True)
    assert out["solo"] == ("end", 1, True)
    assert out["dup"] == ("t1", 1, True)
    assert out["x"][2] is False and out["y"][2] is False
    assert out["self"][2] is False
    # flagged rows carry NO hop count (the jumping artifact would
    # read 2^rounds for a self-loop — review finding)
    assert out["x"][1] is None and out["self"][1] is None
    assert len(out) == 8  # one row per distinct source

    # budget semantics: a 7-hop chain resolves under max_hops=8 but
    # is flagged under max_hops=5 even though the jump rounds cover it
    chain = [(f"n{i}", f"n{i + 1}") for i in range(7)]
    cdf = spark.createDataFrame(chain, "uri string, target string")
    ok = {
        r.uri: (r.final_target, r.hops, r.resolved)
        for r in wc.resolve_redirect_chains(cdf, max_hops=8).collect()
    }
    assert ok["n0"] == ("n7", 7, True)
    tight = {
        r.uri: r.resolved
        for r in wc.resolve_redirect_chains(cdf, max_hops=5).collect()
    }
    assert tight["n0"] is False and tight["n3"] is True

    # composition with the fixture face: planted single-hop redirects
    # come back fully resolved with hops=1
    docs = spark.createDataFrame(
        [(i, f"body text {i} " * 5) for i in range(8)],
        "doc_id long, text string",
    )
    red = wc.extract_redirects(
        wc.parse_warc_records(
            wc.attach_synth_warc(
                docs, "doc_id", "text", group_size=4,
                plant_redirects=True,
            )
        )
    )
    res = wc.resolve_redirect_chains(red).collect()
    assert {r.uri for r in res} == {
        "http://example.com/old/1", "http://example.com/old/5"
    }
    assert all(r.resolved and r.hops == 1 for r in res)


def test_planted_fixture_faces():
    # plants OFF → byte-identical to the r15 fixture layout
    group = [(3, "short"), (5, "x " * 30), (13, "y " * 30)]
    assert wc.synth_warc_record_blobs(group) == wc.synth_warc_record_blobs(
        group, plant_meta_charset=False, plant_redirects=False
    )

    # meta-charset plant: doc_id % 10 == 3 pages serve windows-1252
    # with NO header charset and the € marker intact after decode
    blobs = wc.synth_warc_record_blobs(group, plant_meta_charset=True)
    recs = wc.parse_warc_bytes(b"".join(blobs)[:-4])
    resp = {r["uri"]: r for r in recs if r["warc_type"] == "response"}
    for doc_id in (3, 13):
        r = resp[f"http://example.com/doc/{doc_id}"]
        assert r["content_type"] == "text/html"  # no charset param
        assert wc.META_CHARSET_MARKER in r["body"]
        assert "€99" in r["body"]
    assert "charset=utf-8" in resp["http://example.com/doc/5"][
        "content_type"
    ]

    # redirect plant: doc_id % 4 == 1 docs gain a 301 at /old/…
    blobs = wc.synth_warc_record_blobs(group, plant_redirects=True)
    recs = wc.parse_warc_bytes(b"".join(blobs)[:-4])
    reds = [r for r in recs if r["http_status"] == 301]
    assert [r["uri"] for r in reds] == [
        "http://example.com/old/5", "http://example.com/old/13"
    ]
    assert [r["http_location"] for r in reds] == ["/doc/5", "/doc/13"]


def test_warc_gz_spark_explode_face(spark):
    # the production .warc.gz shape end-to-end through mapInPandas
    import pandas as pd

    groups = [DOCS, [(7, "eta theta iota " * 5)]]
    rows = [
        (i, b"".join(
            gzip.compress(b, mtime=0)
            for b in wc.synth_warc_record_blobs(g)
        ))
        for i, g in enumerate(groups)
    ]
    blobs = spark.createDataFrame(rows, "warc_id long, payload binary")
    recs = wc.parse_warc_records(blobs, "payload")
    by_type = {
        r["warc_type"]: r["n"]
        for r in recs.groupBy("warc_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_type == {"warcinfo": 2, "request": 3, "response": 3}
    uris = {r.uri for r in recs.where("warc_type = 'response'").collect()}
    assert uris == {f"http://example.com/doc/{i}" for i in (1, 2, 7)}


def test_attach_synth_warc_gz_members_equivalent(spark):
    # the gzip_members fixture face yields the SAME records as the
    # plain face — only the container framing differs
    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * 5) for i in range(12)],
        "doc_id long, text string",
    )
    plain = wc.parse_warc_records(
        wc.attach_synth_warc(docs, "doc_id", "text", group_size=5)
    )
    gz = wc.parse_warc_records(
        wc.attach_synth_warc(
            docs, "doc_id", "text", group_size=5, gzip_members=True
        )
    )
    key = ["uri", "warc_type", "http_status", "content_type", "body"]

    def rows(df):  # None-safe sort key (warcinfo rows carry nulls)
        return sorted(
            (tuple(r) for r in df.select(key).collect()),
            key=lambda t: tuple(str(x) for x in t),
        )

    assert rows(plain) == rows(gz)


def test_records_separated_by_blank_line():
    two = wc.synth_warc([DOCS[0]]) + b"\r\n\r\n" + wc.synth_warc([DOCS[1]])
    recs = wc.parse_warc_bytes(two)
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response"
    ] * 2


def test_spark_explode_face(spark):
    docs = spark.createDataFrame(
        [(i, f"document body text number {i} " * 4) for i in range(25)],
        "doc_id long, text string",
    )
    blobs = wc.attach_synth_warc(docs, "doc_id", "text", group_size=10)
    assert blobs.count() == 3  # ids 0-9, 10-19, 20-24
    recs = wc.parse_warc_records(blobs, "payload")
    assert dict(recs.dtypes) == {
        "uri": "string", "warc_type": "string", "http_status": "bigint",
        "content_type": "string", "http_location": "string",
        "body": "string",
    }
    by_type = {
        r["warc_type"]: r["n"]
        for r in recs.groupBy("warc_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_type == {"warcinfo": 3, "request": 25, "response": 25}
    uris = {
        r.uri for r in recs.where("warc_type = 'response'").collect()
    }
    assert uris == {f"http://example.com/doc/{i}" for i in range(25)}


def _reference_chain_walk(mapping, src, max_hops):
    """Independent per-source reference for resolve_redirect_chains:
    follow the functional graph step by step. Resolved iff the chain
    reaches a non-source node within max_hops steps; cycles and
    longer chains are flagged, matching the operator's contract."""
    cur, hops = src, 0
    while cur in mapping and hops <= max_hops + 1:
        cur = mapping[cur]
        hops += 1
    if cur in mapping:
        return (None, None, False)
    return (cur, hops, hops <= max_hops)


def test_resolve_redirect_chains_differential_random_graph(spark):
    """Seeded random functional graph (chains, merging trees, cycles,
    self-loops) — the pointer-jumping resolver must agree with an
    independent step-by-step walk on EVERY source: same resolved
    flag always, same (final_target, hops) whenever resolved."""
    import random

    rng = random.Random(20260816)
    nodes = [f"u{i}" for i in range(300)]
    mapping = {}
    for i, n in enumerate(nodes):
        if rng.random() < 0.7:
            # bias targets forward so long chains and terminals form;
            # ~10% of edges point backward to create cycles
            j = rng.randrange(i + 1, min(i + 12, len(nodes) + 40))
            tgt = nodes[j] if j < len(nodes) else f"terminal{j}"
            if rng.random() < 0.1:
                tgt = nodes[rng.randrange(0, i + 1)]
            mapping[n] = tgt
    for mh in (3, 8):
        edges = spark.createDataFrame(
            list(mapping.items()), "uri string, target string"
        )
        got = {
            r.uri: (r.final_target, r.hops, r.resolved)
            for r in wc.resolve_redirect_chains(
                edges, max_hops=mh
            ).collect()
        }
        assert set(got) == set(mapping)
        for src in mapping:
            ft, hops, res = _reference_chain_walk(mapping, src, mh)
            g = got[src]
            assert g[2] == res, (mh, src, g, (ft, hops, res))
            if res:
                assert (g[0], g[1]) == (ft, hops), (mh, src, g)
