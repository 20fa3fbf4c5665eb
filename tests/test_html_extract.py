"""HTML main-content extraction (operators/html_extract.py): the
pure-Python segment+classify core against hand-written pages, the
fixture's planted structure, and the Spark faces (census / apply)
including the map-only plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.operators import html_extract as hx

LONG = "word " * 20  # 100 collapsed chars: clears the length rule


def _blocks(html_text: str):
    p = hx._BlockParser()
    p.feed(html_text)
    p.close()
    return p.blocks


def _kept(html_text: str):
    kept, _ = hx._classify_blocks(
        html_text, hx._MIN_BLOCK_CHARS, hx._MAX_LINK_DENSITY
    )
    return kept


def test_script_style_head_subtrees_invisible():
    html_text = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><script>if (a<b) alert('x');</script>"
        f"<p>{LONG}</p><noscript>enable js</noscript></body></html>"
    )
    assert _kept(html_text) == [LONG.strip()]
    # and the skipped text contributes no block at all
    assert len(_blocks(html_text)) == 1


def test_head_implicit_close_when_end_tag_omitted():
    """HTML5 makes </head> optional: <body> (or any non-head-content
    start tag) implicitly closes an open head — a page omitting
    </head> must extract the SAME blocks and links as one that
    doesn't (the r15 ADVICE finding: the old counter kept skipping
    for the whole document)."""
    with_close = (
        "<html><head><title>T</title><style>x{}</style></head>"
        f"<body><p>{LONG}</p><a href='/x'>x</a></body></html>"
    )
    without_close = with_close.replace("</head>", "")
    assert _kept(without_close) == _kept(with_close) == [LONG.strip()]
    # no <body> either: a bare block tag also closes the head
    divs_only = (
        f"<html><head><title>T</title><div><p>{LONG}</p></div></html>"
    )
    assert _kept(divs_only) == [LONG.strip()]
    # a non-whitespace CHARACTER token also closes the head (r16
    # review repro: bare text with no wrapping start tag)
    bare_text = (
        f"<html><head><title>T</title>{LONG}<p>{LONG}</p></html>"
    )
    assert _kept(bare_text) == [LONG.strip(), LONG.strip()]
    # ...but whitespace-only data keeps the head open
    ws_only = (
        f"<html><head><title>T</title>\n  <body><p>{LONG}</p></html>"
    )
    assert _kept(ws_only) == [LONG.strip()]
    # and the link parser applies the same character-token rule
    p2 = hx._LinkParser()
    p2.feed(
        '<html><head><title>T</title>text<a href="y">l</a></html>'
    )
    p2.close()
    assert p2.hrefs == ["y"]

    # link parser: same rule, and <base> still captures at head depth
    page = (
        '<html><head><base href="https://b.org/dir/">'
        '<meta charset="utf-8">'
        f'<body><a href="x">l</a><p>{LONG}</p></body></html>'
    )
    p = hx._LinkParser()
    p.feed(page)
    p.close()
    assert p.base == "https://b.org/dir/"
    assert p.hrefs == ["x"]


def test_stray_skip_end_tag_does_not_unskip_head():
    """A stray </style> (no open style) inside an open head must NOT
    reveal head content — the old decrement-any-skip-endtag counter
    did exactly that; the r16 stack ignores unmatched end tags."""
    html_text = (
        f"<html><head></style><title>{LONG}</title></head>"
        f"<body><p>{LONG}</p></body></html>"
    )
    assert _kept(html_text) == [LONG.strip()]
    # and a template nested in head keeps the head open across its
    # flow-content children (template content is inert)
    nested = (
        "<html><head><template><div>x</div></template>"
        f"<title>skip me {LONG}</title></head>"
        f"<body><p>{LONG}</p></body></html>"
    )
    assert _kept(nested) == [LONG.strip()]


def test_entities_unescaped_like_a_browser():
    html_text = f"<p>fish &amp; chips &lt;tag&gt; {LONG}</p>"
    [got] = _kept(html_text)
    assert got.startswith("fish & chips <tag> ")


def test_link_density_drops_long_link_heavy_blocks():
    # long enough to clear the length rule, but links dominate
    links = " ".join(f'<a href="/{i}">menu entry {i}</a>' for i in range(8))
    html_text = f"<div>{links}</div><p>{LONG}</p>"
    assert _kept(html_text) == [LONG.strip()]


def test_length_rule_drops_short_link_free_blocks():
    html_text = f"<div>Share this page</div><p>{LONG}</p>"
    assert _kept(html_text) == [LONG.strip()]


def test_nested_anchors_and_partial_link_blocks():
    # 50 link chars out of ~125 → density ~0.4 > 0.35 → boilerplate
    half = (
        f"<p><a><span>{'x' * 50}</span></a> {'y ' * 37}</p>"
    )
    assert _kept(half) == []
    # 20 link chars out of ~120 → density ~0.17 → content
    some = f"<p><a>{'x' * 20}</a> {'y ' * 50}</p>"
    assert len(_kept(some)) == 1


def test_unterminated_block_flushes_at_close():
    assert _kept(f"<p>{LONG}") == [LONG.strip()]


def test_malformed_html_never_raises():
    for doc in (
        "", "plain text no tags at all " * 5,
        "<p><div></p></div><a></b><", "<<<>>>", "<p " + "a" * 100,
        f"</article>{LONG}<p></p>",
    ):
        hx._classify_blocks(doc, 25, 0.35)  # must not raise


def test_whitespace_collapse_matches_oracle_class():
    html_text = "<p>a\t\tb\n\nc\x0b d\x0c e\r f" + " g" * 30 + "</p>"
    [got] = _kept(html_text)
    assert got.startswith("a b c d e f g g")
    assert "\t" not in got and "\n" not in got


def test_synth_html_planted_structure():
    for i in (0, 1, 2, 3, 7, 13, 14, 21):
        page = hx.synth_html(i, "the quick brown fox " * 4)
        kept, total = hx._classify_blocks(page, 25, 0.35)
        assert total == 4 + i % 3 + (1 if i % 7 else 0), i
        if i % 7:
            assert kept == [("the quick brown fox " * 4).strip()], i
        else:
            assert kept == [], i


def test_synth_html_escapes_markup_in_text():
    page = hx.synth_html(1, "a <b> & 'c' " + "pad " * 10)
    [got] = _kept(page)
    assert got.startswith("a <b> & 'c' ")


def test_spark_census_and_apply_faces(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} body text " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text")
    census = {
        r.doc_id: (r.n_blocks, r.n_kept, r.main_len)
        for r in hx.extract_blocks(pages, "doc_id", "html").collect()
    }
    assert len(census) == 20
    for i in range(20):
        exp_text = (f"document number {i} body text " * 3).strip()
        has = 1 if i % 7 else 0
        assert census[i] == (
            4 + i % 3 + has, has, has * len(exp_text)
        ), i
    clean = {
        r.doc_id: r.main_text
        for r in hx.extract_main_text(pages, "doc_id", "html").collect()
    }
    assert set(clean) == {i for i in range(20) if i % 7}
    assert clean[1] == ("document number 1 body text " * 3).strip()


def test_extraction_plan_is_map_only(spark):
    """The whole fixture→census pipeline carries exactly ONE exchange
    — the fixture-attach id repartition (load-bearing, documented) —
    and none after the parse stage: HTML payloads never shuffle."""
    docs = spark.createDataFrame(
        [(i, "t " * 40) for i in range(4)], "doc_id long, text string"
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text")
    plan = (
        hx.extract_blocks(pages, "doc_id", "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_extracted_text_feeds_existing_corpus_surface(spark):
    """The apply face's output plugs into the text-analysis stack
    unchanged (the ingestion→analysis composition the stage exists
    for)."""
    from flink_join_scaling_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} " * 4) for i in range(6)],
        "doc_id long, text string",
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text")
    clean = hx.extract_main_text(pages, "doc_id", "html")
    toks = clean.select(
        "doc_id", tx.n_tokens_ws(F.col("main_text")).alias("n_tok")
    ).collect()
    assert all(r.n_tok == 20 for r in toks)
    assert len(toks) == 5  # doc 0 is the boilerplate-only page


# ------------------------------------------------- link extraction


def test_link_parser_skips_pseudo_links_and_script_subtrees():
    p = hx._LinkParser()
    p.feed(
        '<a href="#top">t</a><a href="mailto:x@y">m</a>'
        '<a href="JAVASCRIPT:void(0)">j</a><a name="anchor">no href</a>'
        '<a href="/ok">k</a><script>var s = \'<a href="/no">\';</script>'
        '<a href="//cdn.example.com/lib">proto-rel</a>'
        '<a href="tel:+123">t</a><a href="">empty</a>'
    )
    p.close()
    assert p.hrefs == ["/ok", "//cdn.example.com/lib"]


def test_resolve_href_rfc3986_cases():
    cases = [
        ("http://a.com/doc/5", "/x", "http://a.com/x"),
        ("http://a.com/doc/5", "y", "http://a.com/doc/y"),
        ("http://a.com/doc/5", "//b.com/z", "http://b.com/z"),
        ("http://a.com/doc/5", "https://c.com/w", "https://c.com/w"),
        ("http://a.com", "y", "http://a.com/y"),  # origin-only base
        ("notabase", "/x", "/x"),  # non-absolute base: pass through
        # §5.2.4 dot-segment walk on the merged path
        ("http://a.com/doc/5", "../img/p.png", "http://a.com/img/p.png"),
        ("http://a.com/doc/5", "./y", "http://a.com/doc/y"),
        ("http://a.com/a/b/c", "../../z", "http://a.com/z"),
        ("http://a.com/doc/5", "/x/../y/./z", "http://a.com/y/z"),
        # .. never climbs above the root
        ("http://a.com/doc/5", "/../../x", "http://a.com/x"),
        ("http://a.com/", "../..", "http://a.com/"),
        # trailing dot segments keep the directory form
        ("http://a.com/a/b/c", "..", "http://a.com/a/"),
        ("http://a.com/a/b/c", ".", "http://a.com/a/b/"),
        # query strings are opaque — no walk inside them
        ("http://a.com/doc/5", "../y?u=/a/../b", "http://a.com/y?u=/a/../b"),
        ("http://a.com/doc/5", "/p/../q#s/../t", "http://a.com/q#s/../t"),
        # §5.2.2: carried-scheme and protocol-relative references get
        # the dot walk too — one graph node per target page
        (
            "http://a.com/doc/5",
            "http://example.com/doc/../about",
            "http://example.com/about",
        ),
        ("http://a.com/doc/5", "//b.com/x/./y?q=1", "http://b.com/x/y?q=1"),
        ("http://a.com/doc/5", "https://c.com", "https://c.com"),
        # §5.3 empty-path rows: query-only keeps the base PATH
        # (pagination links), empty href is the base itself
        ("http://a.com/doc/5", "?page=2", "http://a.com/doc/5?page=2"),
        ("http://a.com/doc/5", "", "http://a.com/doc/5"),
        # bases CARRY queries in this pipeline (canonicalize_url
        # preserves them): ?href REPLACES the base query, a joined
        # path never absorbs base query/fragment text, and an empty
        # reference drops only the base fragment
        ("http://a.com/page?a=1", "?page=2", "http://a.com/page?page=2"),
        ("http://a.com/page?u=/a/", "x", "http://a.com/x"),
        ("http://a.com/d/p?q=1", "y", "http://a.com/d/y"),
        ("http://a.com/d/p?q=1#f", "", "http://a.com/d/p?q=1"),
        ("http://a.com/d/p#f", "/z", "http://a.com/z"),
        # origin-only base with a query: the path is still "/"
        ("http://a.com?x=1", "/y", "http://a.com/y"),
        ("http://a.com?x=1", "y", "http://a.com/y"),
    ]
    for base, href, exp in cases:
        assert hx.resolve_href(base, href) == exp, (base, href)
        # the stdlib agrees on every query/fragment-bearing-base case
        # except the empty reference, where urllib keeps the base
        # FRAGMENT (a urljoin special case) and RFC 3986 §5.3 drops
        # it (an empty reference carries no fragment)
        from urllib.parse import urljoin

        if ("?" in base or "#" in base) and href != "":
            assert hx.resolve_href(base, href) == urljoin(base, href)


def test_link_parser_skips_whitespace_only_href():
    p = hx._LinkParser()
    p.feed('<a href="   ">blank</a><a href=" /ok ">k</a>')
    p.close()
    assert p.hrefs == ["/ok"]


def test_base_href_overrides_resolution_base(spark):
    # the HTML spec: <base href> (first wins, legally inside <head>)
    # replaces the page URL as the resolution base; a relative base
    # first resolves against the page URL itself
    pages = spark.createDataFrame(
        [
            (
                1,
                '<html><head><base href="https://cdn.org/root/">'
                '<base href="https://second.org/ignored/"></head>'
                '<body><a href="x">r</a><a href="/y">a</a></body></html>',
                "http://a.com/doc/1",
            ),
            (
                2,
                '<html><head><base href="/b/"></head>'
                '<body><a href="z">r</a></body></html>',
                "http://a.com/doc/2",
            ),
            (
                3,
                "<html><body><a href=\"plain\">n</a></body></html>",
                "http://a.com/doc/3",
            ),
        ],
        "doc_id long, html string, page_url string",
    )
    edges = hx.extract_links(pages, "doc_id", "html", base_col="page_url")
    got = {(r.doc_id, r.href) for r in edges.collect()}
    assert got == {
        (1, "https://cdn.org/root/x"),   # path-relative vs <base>
        (1, "https://cdn.org/y"),        # root-relative vs <base> origin
        (2, "http://a.com/b/z"),         # relative <base> vs page URL
        (3, "http://a.com/doc/plain"),   # no <base>: page URL
    }


def test_base_href_edge_cases(spark):
    pages = spark.createDataFrame(
        [
            # the <base href="#"> hack means "the page itself" — the
            # base's fragment is ignored (§5.1), never baked into edges
            (
                1,
                '<html><head><base href="#"></head>'
                '<body><a href="?p=2">next</a></body></html>',
                "http://a.com/doc/1",
            ),
            # <base> inside a template is inert content — a browser
            # never honors it, so neither does the graph
            (
                2,
                '<html><body><template>'
                '<base href="https://evil.example/"></template>'
                '<a href="x">l</a></body></html>',
                "http://a.com/doc/2",
            ),
            # an ABSOLUTE <base> makes the page resolvable even when
            # the page URL column is null
            (
                3,
                '<html><head><base href="https://cdn.org/r/#frag">'
                "</head><body><a href=\"x\">l</a></body></html>",
                None,
            ),
            # relative <base> with no page URL: unusable, hrefs pass
            # through raw rather than being invented
            (
                4,
                '<html><head><base href="/b/"></head>'
                "<body><a href=\"x\">l</a></body></html>",
                None,
            ),
        ],
        "doc_id long, html string, page_url string",
    )
    edges = hx.extract_links(pages, "doc_id", "html", base_col="page_url")
    got = {(r.doc_id, r.href) for r in edges.collect()}
    assert got == {
        (1, "http://a.com/doc/1?p=2"),
        (2, "http://a.com/doc/x"),
        (3, "https://cdn.org/r/x"),
        (4, "x"),
    }


def test_resolve_href_matches_stdlib_urljoin():
    """Cross-check against the stdlib's independent RFC 3986 §5
    implementation over a combinatorial corpus. The ONLY allowed
    divergence class: references that carry their own scheme or
    authority, where urllib skips the §5.2.2 dot-segment walk
    (a known stdlib lenience — T.path = remove_dot_segments(R.path)
    applies to every resolution target) and resolve_href applies it;
    for those, resolve_href must equal urljoin POST-normalized."""
    from urllib.parse import urljoin

    bases = [
        "http://a.com/doc/5", "http://a.com/a/b/c",
        "http://a.com/", "http://a.com",
        "http://a.com/page?a=1", "http://a.com/s/t?u=/a/../v#frag",
    ]
    hrefs = [
        "/x", "y", "./y", "../y", "../../z", "../../../w",
        "//b.com/z", "https://c.com/w", "?page=2", "",
        "/x/../y/./z", "a/../b", "..", ".", "../y?u=/a/../b",
        "/p/../q#s", "x/y/../z", "./", "../", "x/",
        "http://e.com/doc/../about", "//b.com/x/./y?q=1",
        "https://c.com",
    ]
    import re as _re

    def walked(url: str) -> str:
        # INDEPENDENT expectation for the divergence class: split the
        # scheme://authority head off urljoin's output and let
        # urljoin itself run the dot walk by re-resolving the tail as
        # a root-relative reference — no engine code involved
        m = _re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(.*)$", url)
        head, tail = m.group(1), m.group(2)
        return urljoin(head + "/x", tail) if tail else url

    for b in bases:
        for h in hrefs:
            mine, ref = hx.resolve_href(b, h), urljoin(b, h)
            if mine == ref:
                continue
            if h == "":
                # urljoin keeps the base FRAGMENT on an empty
                # reference; §5.3 drops it (empty R has no fragment)
                assert mine == ref.split("#", 1)[0], (b, mine, ref)
                continue
            # divergence must be exactly the carried-scheme/authority
            # dot-walk class, and the walked urljoin output closes it
            assert h.startswith(("http", "//")), (b, h, mine, ref)
            assert mine == walked(ref), (b, h, mine, ref, walked(ref))


def test_remove_dot_segments_rfc_examples():
    # the two worked examples from RFC 3986 §5.2.4 plus edge forms
    assert hx.remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert hx.remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert hx.remove_dot_segments("/a/b/..") == "/a/"
    assert hx.remove_dot_segments("/a/b/.") == "/a/b/"
    assert hx.remove_dot_segments("/./") == "/"
    assert hx.remove_dot_segments("/../") == "/"
    assert hx.remove_dot_segments("..") == ""
    assert hx.remove_dot_segments(".") == ""
    assert hx.remove_dot_segments("/a//b/../c") == "/a//c"
    assert hx.remove_dot_segments("") == ""


def test_spark_link_extraction_face(spark):
    docs = spark.createDataFrame(
        [(i, f"body text for page {i} " * 4) for i in range(9)],
        "doc_id long, text string",
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text").withColumn(
        "page_url",
        F.concat(F.lit("http://example.com/doc/"),
                 F.col("doc_id").cast("string")),
    )
    edges = hx.extract_links(pages, "doc_id", "html", base_col="page_url")
    per_doc = {
        r.doc_id: r.n
        for r in edges.groupBy("doc_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    # 5 root-relative chrome links + the path-relative footer link
    # + 2 per promo block (1 + doc_id % 3 promos); the planted
    # mailto:/#top footer anchors must contribute NO edge
    assert per_doc == {i: 8 + 2 * (i % 3) for i in range(9)}
    doc0 = {r.href for r in edges.where("doc_id = 0").collect()}
    assert doc0 == {
        "http://example.com/", "http://example.com/about",
        "http://example.com/contact", "http://example.com/privacy",
        "http://example.com/terms", "http://example.com/buy0",
        "http://example.com/deal0",
        # legal/cookies joined against the base's /doc/ directory
        "http://example.com/doc/legal/cookies",
    }
    assert not any("mailto" in h or "#" in h for h in doc0)


def test_links_compose_with_url_canonicalizer(spark):
    """The crawl loop: extracted edges feed canonicalize_url
    unchanged — already-canonical spellings are fixed points."""
    from flink_join_scaling_spark.functions.urls import canonicalize_url

    docs = spark.createDataFrame(
        [(1, "page body words " * 5)], "doc_id long, text string"
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text").withColumn(
        "page_url",
        F.concat(F.lit("http://example.com/doc/"),
                 F.col("doc_id").cast("string")),
    )
    edges = hx.extract_links(pages, "doc_id", "html", base_col="page_url")
    out = edges.select(
        "href", canonicalize_url(F.col("href")).alias("c")
    ).collect()
    assert out and all(r.href == r.c for r in out)


def test_crawl_graph_feeds_pagerank(spark):
    """The full crawl-pipeline composition (r14 verdict task 6): the
    r14 ingestion surface (extract_links → canonicalize_url edge
    normalization) feeds the r10 graph surface (the PageRank core
    behind q_dedup_canonical_rank) directly — site chrome targets
    (/, /about, …), linked from EVERY page, must out-rank the leaf
    /doc/{i} pages, exactly how a crawl pipeline picks canonical
    pages from the web graph both stages exist to build."""
    from flink_join_scaling_spark.functions.urls import canonicalize_url
    from flink_join_scaling_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"site page body text {i} " * 5) for i in range(20)],
        "doc_id long, text string",
    )
    pages = hx.attach_synth_html(docs, "doc_id", "text").withColumn(
        "page_url",
        F.concat(F.lit("http://example.com/doc/"),
                 F.col("doc_id").cast("string")),
    )
    edges = (
        hx.extract_links(pages, "doc_id", "html", base_col="page_url")
        .withColumn(
            "src",
            canonicalize_url(
                F.concat(F.lit("http://example.com/doc/"),
                         F.col("doc_id").cast("string"))
            ),
        )
        .withColumn("dst", canonicalize_url(F.col("href")))
        .select("src", "dst")
    )
    ranks = {
        r.node: r.r
        for r in dd.pagerank(edges, "src", "dst", iters=3).collect()
    }
    chrome = [
        "http://example.com/", "http://example.com/about",
        "http://example.com/contact", "http://example.com/privacy",
        "http://example.com/terms",
    ]
    leaves = [f"http://example.com/doc/{i}" for i in range(20)]
    assert all(u in ranks for u in chrome + leaves)
    assert min(ranks[u] for u in chrome) > max(ranks[u] for u in leaves)


def test_redirect_aliasing_consolidates_pagerank(spark):
    """The r16 aliasing loop end to end: planted 301 chains walk the
    REAL container path (parse_warc_records → extract_redirects →
    resolve_redirect_chains), the resulting alias map rewrites link-
    edge targets, and PageRank mass that previously SPLIT across a
    redirect alias and its canonical target consolidates onto the
    final target — the exact consumption path the redirect family
    exists for (upstream of q_dedup_canonical_rank)."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.sources import warc as wc

    def rec(status: int, uri: str, loc: str) -> bytes:
        resp = (
            f"HTTP/1.1 {status} Moved\r\nLocation: {loc}\r\n"
            "Content-Length: 0\r\n\r\n"
        ).encode()
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Length: " + str(len(resp)).encode() + b"\r\n\r\n"
            + resp + b"\r\n\r\n"
        )

    # a 2-hop chain: /old/a -> /mid/a -> /new/a
    blob = (
        rec(301, "http://site.org/old/a", "/mid/a")
        + rec(302, "http://site.org/mid/a", "/new/a")
    )[:-4]
    archives = spark.createDataFrame(
        [(0, bytearray(blob))], "warc_id long, payload binary"
    )
    alias = wc.resolve_redirect_chains(
        wc.extract_redirects(wc.parse_warc_records(archives))
    ).where("resolved")
    got = {r.uri: (r.final_target, r.hops) for r in alias.collect()}
    assert got == {
        "http://site.org/old/a": ("http://site.org/new/a", 2),
        "http://site.org/mid/a": ("http://site.org/new/a", 1),
    }

    # 8 pages link the canonical target's ALIAS or the target itself;
    # 8 pages link an unaliased control page
    E = (
        [(f"http://p{i}.org/", "http://site.org/old/a") for i in range(4)]
        + [(f"http://p{i}.org/", "http://site.org/new/a")
           for i in range(4, 8)]
        + [(f"http://p{i}.org/", "http://site.org/other")
           for i in range(8)]
    )
    edges = spark.createDataFrame(E, "src string, dst string")

    def rank_of(e, node):
        ranks = {r.node: r.r for r in dd.pagerank(e, "src", "dst",
                                                  iters=3).collect()}
        return ranks.get(node, 0.0)

    # without aliasing, the canonical target sees only half its mass
    split = rank_of(edges, "http://site.org/new/a")
    control = rank_of(edges, "http://site.org/other")
    assert split < control

    amap = alias.select(
        F.col("uri").alias("dst"), F.col("final_target").alias("_ft")
    )
    remapped = edges.join(amap, "dst", "left").select(
        "src", F.coalesce("_ft", F.col("dst")).alias("dst")
    )
    merged = rank_of(remapped, "http://site.org/new/a")
    control2 = rank_of(remapped, "http://site.org/other")
    assert abs(merged - control2) < 1e-9  # full consolidation
    assert merged > split
    # the alias node no longer exists as a link target
    assert rank_of(remapped, "http://site.org/old/a") == 0.0
