"""Hypothesis property layer for the crawl-ingestion parsers (r14):
the media-codec discipline (tests/test_media_properties.py) applied
to the HTML extractor and the WARC record walk. Both invariants are
exact: the planted article must come back character-identical through
escape → parse → unescape → collapse whatever whitespace/entity mix
the source text carries, and the WARC walk must recover every record
of every randomly-packed archive byte-exactly. Pure Python per
example (no Spark job)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_join_scaling_spark.operators import html_extract as hx
from flink_join_scaling_spark.sources import warc as wc

SET = settings(max_examples=30, deadline=None)

_WS = " \t\n\v\f\r"

#: visible ASCII + whitespace + the HTML-active chars the escaper must
#: neutralize; long enough floor so the article clears the length rule
_TEXT = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789<>&\"'`!?.,:;()[]{}/=+-*#@%$^|~_" + _WS
    ),
    min_size=30,
    max_size=400,
)


def _collapse(s: str) -> str:
    return re.sub(r"[ \t\n\v\f\r]+", " ", s).strip(" ")


@given(doc_id=st.integers(0, 10**9), text=_TEXT)
@SET
def test_synth_html_extraction_round_trip(doc_id, text):
    """Whatever whitespace runs and markup-active characters the
    source text carries, the extractor returns exactly its collapsed
    form for article pages — and nothing for the planted
    boilerplate-only pages (doc_id % 7 == 0)."""
    page = hx.synth_html(doc_id, text)
    kept, total = hx._classify_blocks(page, 25, 0.35)
    expected = _collapse(text)
    has_article = 1 if (doc_id % 7 and expected) else 0
    assert total == 4 + doc_id % 3 + has_article
    if has_article and len(expected) >= 25:
        assert kept == [expected]
    else:
        assert kept == []


@given(
    blocks=st.lists(
        st.tuples(st.booleans(), _TEXT), min_size=1, max_size=8
    )
)
@SET
def test_extractor_keeps_exactly_the_link_sparse_long_blocks(blocks):
    """Hand-composed pages: per block, fully-linked text must drop,
    link-free text must keep iff it clears the length rule — the two
    classification axes hold under any block mix."""
    html_parts, expected = [], []
    for linked, text in blocks:
        safe = hx._html.escape(text)
        if linked:
            html_parts.append(f"<div><a>{safe}</a></div>")
        else:
            html_parts.append(f"<p>{safe}</p>")
            c = _collapse(text)
            if len(c) >= 25:
                expected.append(c)
    kept, total = hx._classify_blocks("".join(html_parts), 25, 0.35)
    assert kept == expected
    assert total == sum(1 for _, t in blocks if _collapse(t))


@given(
    ids=st.lists(
        st.integers(0, 10**6), min_size=1, max_size=6, unique=True
    ),
    texts=st.lists(_TEXT, min_size=6, max_size=6),
)
@SET
def test_warc_pack_walk_round_trip(ids, texts):
    """Any group of documents packed into one archive walks back out
    record-exact: warcinfo first, then an alternating request/response
    per document in input order, each response carrying its URI, a
    200, text/html, and the exact synth_html page bytes."""
    group = [(i, t) for i, t in zip(sorted(ids), texts)]
    recs = wc.parse_warc_bytes(wc.synth_warc(group))
    assert recs[0]["warc_type"] == "warcinfo"
    body_recs = recs[1:]
    assert len(body_recs) == 2 * len(group)
    for (doc_id, text), req, resp in zip(
        group, body_recs[0::2], body_recs[1::2]
    ):
        uri = f"http://example.com/doc/{doc_id}"
        assert (req["warc_type"], req["uri"]) == ("request", uri)
        assert (resp["warc_type"], resp["uri"]) == ("response", uri)
        assert resp["http_status"] == 200
        assert resp["content_type"].startswith("text/html")
        assert resp["body"] == hx.synth_html(doc_id, text)


@given(
    cut=st.integers(1, 200),
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=3, unique=True),
)
@SET
def test_warc_truncation_always_refuses(cut, ids):
    """Cutting ANY tail off a valid archive must raise, never return a
    silently shorter record list with a parsed prefix ending exactly
    at a record boundary being the one legal exception."""
    good = wc.synth_warc([(i, "word " * 30) for i in sorted(ids)])
    cut = min(cut, len(good) - 1)
    truncated = good[:-cut]
    n_full = len(wc.parse_warc_bytes(good))
    try:
        recs = wc.parse_warc_bytes(truncated)
    except ValueError:
        return
    # parse succeeded: legal only if the cut landed exactly on a
    # record boundary (+ separator), yielding a strict prefix
    assert len(recs) < n_full


#: labels the prescan must recognize, with the HTML5 remaps applied
_LABELS = [
    ("utf-8", "utf-8"),
    ("Shift_JIS", "shift_jis"),
    ("windows-1252", "windows-1252"),
    ("ISO-8859-1", "iso-8859-1"),
    ("UTF-16", "utf-8"),          # spec remap: markup was ASCII
    ("utf-16le", "utf-8"),
    ("x-user-defined", "windows-1252"),
]


@given(
    pair=st.sampled_from(_LABELS),
    quote=st.sampled_from(['"', "'", ""]),
    order=st.booleans(),
    pad=st.sampled_from(["", " ", "  ", "\t"]),
    extra=st.sampled_from(
        ["", '<meta name="viewport" content="width=1">',
         '<meta name="d" content="charset=koi8-r prose">',
         "<!-- <meta charset=koi8-r> -->"]
    ),
    http_equiv=st.booleans(),
)
@SET
def test_meta_prescan_finds_label_whatever_the_spelling(
    pair, quote, order, pad, extra, http_equiv
):
    """Quoting style, attribute order, surrounding whitespace,
    decoy metas ('charset=' in description prose) and comments must
    not move the sniff: the FIRST real declaration wins, with the
    HTML5 utf-16/x-user-defined remaps applied. The decoys
    deliberately name a DIFFERENT codec (koi8-r) so any false
    positive changes the answer."""
    label, want = pair
    q = quote
    if http_equiv:
        # the content parameter needs its quotes when it has a ';'
        q = q or '"'
        meta = (
            f"<meta{pad} http-equiv={q}Content-Type{q} "
            f"content={q}text/html; charset={label}{q}>"
        )
        if order:
            meta = (
                f"<meta{pad} content={q}text/html; charset={label}{q} "
                f"http-equiv={q}Content-Type{q}>"
            )
    else:
        meta = f"<meta{pad} charset{pad}={pad}{q}{label}{q}{pad}>"
    window = f"<html><head>{extra}{meta}</head>".encode("ascii")
    assert wc._sniff_meta_charset(window) == want


@given(data=st.binary(min_size=0, max_size=1024))
@SET
def test_meta_prescan_total_over_random_bytes(data):
    """The prescan never raises on arbitrary bytes (binary payloads
    mislabeled text/html are routine in real archives) and only ever
    returns a string label."""
    out = wc._sniff_meta_charset(data)
    assert out is None or isinstance(out, str)
