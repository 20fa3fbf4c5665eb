"""WARC container source (sources/warc.py): strict record-walk
semantics against hand-built and fixture bytes, loud refusals on
malformed archives, and the Spark explode face."""

from __future__ import annotations

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
        "content_type": "string", "body": "string",
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
