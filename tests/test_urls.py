"""URL canonicalization (functions/urls.py): the RFC 3986 §6 safe
normalizations plus tracking-parameter removal, pinned case-by-case,
and the crawl-dedup composition (equal canonical ⇒ duplicate group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.functions.urls import canonicalize_url

CASES = [
    # case-fold + default port + tracker + fragment + param sort
    (
        "HTTPS://EXAMPLE.COM:443/path/1?b=2&a=1&utm_source=feed#frag",
        "https://example.com/path/1?a=1&b=2",
    ),
    ("http://Example.com:80/", "http://example.com/"),
    # non-default port survives
    ("http://example.com:8080/x?z=1", "http://example.com:8080/x?z=1"),
    # empty path -> "/"
    ("https://a.com", "https://a.com/"),
    ("https://a.com?utm_campaign=x", "https://a.com/"),
    ("https://a.com/p?fbclid=abc&q=1", "https://a.com/p?q=1"),
    # bare "?" drops; duplicate keys sort stably by full kv string
    ("https://a.com/p?", "https://a.com/p"),
    ("https://a.com/p?a=1&a=0", "https://a.com/p?a=0&a=1"),
    ("https://a.com/p#only-frag", "https://a.com/p"),
    # tracker match is case-sensitive and anchored: UTM_ is kept,
    # and a key merely CONTAINING a tracker name is kept
    ("http://h.com/P/Q?UTM_source=x", "http://h.com/P/Q?UTM_source=x"),
    ("https://a.com/p?xgclid=1", "https://a.com/p?xgclid=1"),
    ("https://a.com/p?gclid=1&msclkid=2&utm_x=3", "https://a.com/p"),
    # valueless tracker key still drops (the (=.*)? arm)
    ("https://a.com/p?utm_source&q=1", "https://a.com/p?q=1"),
    # path case is significant and preserved
    ("https://a.com/CaseSensitive", "https://a.com/CaseSensitive"),
    # percent-encoding normalization (§6.2.2.2): unreserved octets
    # decode, reserved octets keep their triplet with UPPERCASE hex
    (
        "https://a.com/%7euser%2fws?x=%7e1",
        "https://a.com/~user%2Fws?x=~1",
    ),
    (
        "http://a.com/%41%5a%61%7a%30%39%2d%2e%5f%7e",
        "http://a.com/AZaz09-._~",
    ),
    # reserved / non-unreserved stay encoded (space, slash), hex upper
    ("http://a.com/a%20b?x=%2f", "http://a.com/a%20b?x=%2F"),
    # a stray '%' not opening a hex pair passes through verbatim
    ("http://a.com/%zz%", "http://a.com/%zz%"),
    ("http://a.com/100%?q=1", "http://a.com/100%?q=1"),
    # not an absolute URL: pass through unchanged, never invent parts
    ("notaurl", "notaurl"),
    ("/relative/path?a=1", "/relative/path?a=1"),
    # authorities beyond the anchored host grammar (userinfo, IPv6
    # literal) pass through unchanged — never merge distinct sites on
    # a truncated host, never corrupt the bracket form
    ("http://alice@a.com/x?b=2&a=1", "http://alice@a.com/x?b=2&a=1"),
    ("http://alice@b.com/x", "http://alice@b.com/x"),
    ("http://[2001:db8::1]/x#f", "http://[2001:db8::1]/x#f"),
    ("HTTP://[2001:db8::1]:80/", "HTTP://[2001:db8::1]:80/"),
    # malformed port: not a digit run to the authority's end — pass
    # through rather than silently truncate ':80x' / ':8080abc'
    ("http://h.com:80x/p", "http://h.com:80x/p"),
    ("http://h.com:8080abc/p?b=1", "http://h.com:8080abc/p?b=1"),
    # the GRAMMATICAL empty port still normalizes away (§6.2.3)
    ("http://h.com:/p", "http://h.com/p"),
    ("HTTPS://H.com:443/p", "https://h.com/p"),
    # a '?' first appearing INSIDE the fragment is fragment data, not
    # a query (the r15 advisor case): must not collide with a
    # genuinely-queried spelling after fragment removal
    ("http://h.com/p#f?a=1", "http://h.com/p"),
    ("http://h.com/p?a=1#f?b=2", "http://h.com/p?a=1"),
    # dot-segment removal (§6.2.2.3, r16): '..' pops, '.' drops,
    # never above root; trailing dot segment restores the slash
    ("http://h.com/a/../b", "http://h.com/b"),
    ("http://h.com/a/./b/../c", "http://h.com/a/c"),
    ("http://h.com/a/b/c/../../../d", "http://h.com/d"),
    ("http://h.com/../../x", "http://h.com/x"),
    ("http://h.com/..", "http://h.com/"),
    ("http://h.com/a/b/..", "http://h.com/a/"),
    ("http://h.com/a/.", "http://h.com/a/"),
    ("http://h.com/a//../b", "http://h.com/a/b"),
    # encoded dots decode first (§6.2.2.2 before §6.2.2.3)
    ("http://h.com/%2e%2e/a", "http://h.com/a"),
    ("http://h.com/b/%2E/c", "http://h.com/b/c"),
    # dots that are NOT whole segments are data, not dot segments
    ("http://h.com/.hidden/a.b", "http://h.com/.hidden/a.b"),
    ("http://h.com/a/..b/c?x=/../y", "http://h.com/a/..b/c?x=/../y"),
]


def test_pct_normalize_differential_all_octets(spark):
    """Differential check of the pct_normalize JVM expression against
    an independent pure-Python engine (re.sub over the same RFC
    §6.2.2.2 rule) across ALL 256 octets in upper/lower hex plus
    malformed-% contexts — one Spark pass. Idempotence is asserted
    for WELL-FORMED inputs only: on a stray ``%`` a decode can
    assemble an artifact triplet (``%4%41`` → ``%4A`` → ``J``), an
    inherent property of the rule that the reference engine shares —
    the docstring pins the apply-once contract."""
    import re as _re

    from flink_join_scaling_spark.functions.urls import pct_normalize

    def ref(s: str) -> str:
        def fix(m):
            pair = m.group(1).upper()
            code = int(pair, 16)
            if (
                0x41 <= code <= 0x5A
                or 0x61 <= code <= 0x7A
                or 0x30 <= code <= 0x39
                or code in (0x2D, 0x2E, 0x5F, 0x7E)
            ):
                return chr(code)
            return "%" + pair
        return _re.sub(r"%([0-9A-Fa-f]{2})", fix, s)

    cases = [f"/a%{b:02x}b" for b in range(256)]
    cases += [f"/a%{b:02X}b" for b in range(0, 256, 7)]
    cases += [
        "", "%", "%%", "%4", "%4%41", "%%41", "%zz", "100%",
        "%252F", "a%20b%2fc%7E", "%2F%2f%2D%2e", "trailing%",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    out = df.select(
        "s",
        pct_normalize(F.col("s")).alias("once"),
        pct_normalize(pct_normalize(F.col("s"))).alias("twice"),
    ).collect()
    well_formed = _re.compile(r"^(?:[^%]|%[0-9A-Fa-f]{2})*$")
    for r in out:
        assert r.once == ref(r.s), (r.s, r.once, ref(r.s))
        if well_formed.match(r.s):
            assert r.twice == r.once, (r.s, r.once, r.twice)
        else:
            # both engines share the artifact-triplet property
            assert ref(r.once) == r.twice, (r.s, r.once, r.twice)


def test_dot_segment_differential_vs_buffer_walk(spark):
    """Differential check of the remove_dot_segments_col aggregate
    fold (functions/urls.py, the r16 §6.2.2.3 column form) against
    the independent imperative §5.2.4 buffer walk
    (operators/html_extract.py) over seeded random ROOTED paths —
    two implementations written against the RFC text, not each
    other, must agree on every spelling."""
    import random

    from flink_join_scaling_spark.functions.urls import (
        remove_dot_segments_col,
    )
    from flink_join_scaling_spark.operators.html_extract import (
        remove_dot_segments,
    )

    rng = random.Random(20260816)
    toks = ["a", "bb", ".", "..", "", "~x", "c.d", "a.", "..c"]
    paths = [
        "/" + "/".join(
            rng.choice(toks) for _ in range(rng.randint(0, 8))
        )
        for _ in range(500)
    ]
    paths += ["/", "/..", "/.", "/../", "/./", "/a/b/../../../../c"]
    df = spark.createDataFrame([(p,) for p in set(paths)], "p string")
    out = df.select(
        "p", remove_dot_segments_col(F.col("p")).alias("o")
    ).collect()
    for r in out:
        assert r.o == remove_dot_segments(r.p), (
            r.p, r.o, remove_dot_segments(r.p)
        )


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]
    for (u, exp), g in zip(CASES, got):
        assert g == exp, (u, g, exp)


def test_canonicalize_url_null_and_idempotent(spark):
    df = spark.createDataFrame(
        [(None,)] + [(c,) for _, c in CASES], "url string"
    )
    out = [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]
    assert out[0] is None  # null in, null out
    # canonical forms are fixed points
    assert out[1:] == [c for _, c in CASES]


def test_canonical_url_dedup_composition(spark):
    """Equal canonical spelling ⇒ one duplicate group: the planted
    (even, odd) fixture pairs of q_url_canonicalize collapse to
    doc_id // 2 groups of exactly 2 under a plain groupBy — the
    crawl-dedup composition the canonicalizer exists for."""
    from flink_join_scaling_spark import plans

    df = plans.QUERIES["q_url_canonicalize"].fn(
        spark, "/root/testdata/sf0.001"
    )
    groups = df.groupBy("canonical_url").count()
    assert groups.where("count <> 2").count() == 0
    assert groups.count() == df.count() / 2
    # and the messy spellings within a group genuinely differ
    distinct_urls = df.select("url").distinct().count()
    assert distinct_urls == df.count()


def test_canonicalize_plan_is_map_only_jvm(spark):
    """Zero Python, zero exchanges: the whole census is one JVM
    Project over the scan (the array/lambda params are interpreted
    per element — the repo's round-4 HOF caveat — but over ≤4 query
    params per URL, not per token, so the constant is irrelevant)."""
    from flink_join_scaling_spark import plans

    df = plans.QUERIES["q_url_canonicalize"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "Project" in plan and "Scan parquet" in plan
