"""Robots Exclusion Protocol (sources/robots.py): RFC 9309 group
selection, longest-match precedence, wildcard/$ patterns, tolerant
parsing, and the broadcast-closure Spark filter face."""

from __future__ import annotations

import pytest

from flink_join_scaling_spark.sources import robots as rb

BODY = """
# example policy
User-agent: *
Disallow: /private/
Allow: /private/public-note.html
Crawl-delay: 2

User-agent: fjss-crawler
User-agent: fjss-fetcher
Disallow: /internal*
Allow: /internal/docs/
Disallow: /*.pdf$

Sitemap: https://site.org/sitemap.xml
Sitemap: https://site.org/sitemap2.xml
"""


def test_group_selection_and_merging():
    # the * group applies to an unknown agent
    star = rb.parse_robots(BODY, "otherbot/1.0")
    assert not star.allowed("/private/x")
    assert star.allowed("/private/public-note.html")  # longest match
    assert star.allowed("/anything-else")
    assert star.crawl_delay == 2.0
    # the specific group wins for both tokens of the shared block,
    # and the * group's rules do NOT merge in (§2.2.1)
    for agent in ("fjss-crawler/2.0", "mozilla fjss-fetcher"):
        pol = rb.parse_robots(BODY, agent)
        assert pol.allowed("/private/x")  # * rules absent
        assert not pol.allowed("/internal-memo")
        assert pol.allowed("/internal/docs/a.html")
        assert pol.crawl_delay is None
    # sitemaps are file-global
    assert star.sitemaps == rb.parse_robots(BODY, "x").sitemaps
    assert len(star.sitemaps) == 2


def test_rule_precedence_rfc9309():
    body = (
        "User-agent: *\n"
        "Allow: /page\n"
        "Disallow: /page\n"  # tie on octets: Allow wins
        "Disallow: /page/deep\n"
    )
    pol = rb.parse_robots(body, "any")
    assert pol.allowed("/page")
    assert not pol.allowed("/page/deep/x")  # more octets: Disallow
    # no matching rule -> allowed
    assert pol.allowed("/other")


def test_wildcards_and_end_anchor():
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/work\n"
    )
    pol = rb.parse_robots(body, "x")
    assert not pol.allowed("/a/b/doc.pdf")
    assert pol.allowed("/a/b/doc.pdf?download=1")  # $ anchors the end
    assert pol.allowed("/a/pdf-guide")
    assert not pol.allowed("/tmp-123/work")
    assert not pol.allowed("/tmpX/sub/work")
    # regex metacharacters in patterns stay literal
    meta = rb.parse_robots("User-agent: *\nDisallow: /a+b(c)\n", "x")
    assert not meta.allowed("/a+b(c)/d")
    assert meta.allowed("/aab(c)")


def test_tolerant_parsing_and_empty_disallow():
    body = (
        "junk line without colon\n"
        "Unknown-Field: whatever\n"
        "USER-AGENT: *\n"
        "Disallow:\n"  # empty: matches nothing (allow-all)
        "disallow: /x # trailing comment\n"
        "Crawl-delay: fast\n"  # non-numeric: ignored
    )
    pol = rb.parse_robots(body, "any")
    assert pol.allowed("/anything")
    assert not pol.allowed("/x/y")
    assert pol.crawl_delay is None
    # empty file: everything allowed
    empty = rb.parse_robots("", "any")
    assert empty.allowed("/a") and empty.sitemaps == []


def test_spark_filter_face(spark):
    robots = spark.createDataFrame(
        [
            ("site.org", BODY),
            ("other.net", "User-agent: *\nDisallow: /\n"),
            ("[2001:db8::1]", "User-agent: *\nDisallow: /v6\n"),
        ],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [
            ("https://site.org/private/x", 1),
            ("https://SITE.org/private/public-note.html", 2),
            ("https://site.org:8443/ok", 3),
            ("https://alice@site.org/private/x", 4),
            ("https://other.net/anything", 5),
            ("https://norobots.example/x", 6),
            ("http://[2001:db8::1]:8080/v6/page", 7),
            (None, 8),
        ],
        "url string, tag long",
    )
    rows = rb.robots_filter(urls, robots, agent="somebot").collect()
    out = {r.url: (r.allowed, r.crawl_delay) for r in rows}
    # passthrough: the caller's columns survive, no join-back needed
    assert {r.tag for r in rows} == set(range(1, 9))
    # IPv6 bracket form keeps its brackets through the lookup
    assert out["http://[2001:db8::1]:8080/v6/page"][0] is False
    assert out["https://site.org/private/x"] == (False, 2.0)
    # host case-fold, port and userinfo stripped for the lookup
    assert out["https://SITE.org/private/public-note.html"][0] is True
    assert out["https://site.org:8443/ok"] == (True, 2.0)
    assert out["https://alice@site.org/private/x"][0] is False
    assert out["https://other.net/anything"][0] is False
    # no robots served / unparseable url -> allowed (protocol default)
    assert out["https://norobots.example/x"] == (True, None)
    assert out[None][0] is True

    # the specific group applies when the agent matches
    out2 = {
        r.url: r.allowed
        for r in rb.robots_filter(
            urls, robots, agent="fjss-crawler/2.0"
        ).collect()
    }
    assert out2["https://site.org/private/x"] is True

    # plan shape: one Arrow pass over the URL projection, no shuffle
    plan = (
        rb.robots_filter(urls, robots)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_rule_cap_refuses_loudly(spark, monkeypatch):
    monkeypatch.setattr(rb, "_MAX_TOTAL_RULES", 3)
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\n" + "Disallow: /a\n" * 4)],
        "host string, body string",
    )
    urls = spark.createDataFrame([("http://h1/a",)], "url string")
    with pytest.raises(ValueError, match="robots corpus exceeds"):
        rb.robots_filter(urls, robots)


def test_query_included_in_match():
    # §2.2.2: the pattern matches path + query
    body = "User-agent: *\nDisallow: /search?q=\n"
    pol = rb.parse_robots(body, "x")
    assert not pol.allowed("/search?q=test")
    assert pol.allowed("/search")


def test_hostile_wildcard_pattern_is_not_redos():
    """robots.txt is remote-host-controlled input: the r16 review's
    ReDoS repro ('*a'*14 + '$' against a long run of 'a') must match
    in linear-ish time — the wildcard walk is not a backtracking
    regex."""
    import time

    body = "User-agent: *\nDisallow: " + "*a" * 14 + "$\n"
    pol = rb.parse_robots(body, "x")
    t0 = time.monotonic()
    assert pol.allowed("/" + "a" * 60 + "b")  # no match → allowed
    assert not pol.allowed("/" + "a" * 60)  # matches → disallowed
    assert time.monotonic() - t0 < 1.0


def test_empty_user_agent_line_is_not_a_wildcard():
    """An empty 'User-agent:' value names no crawler — it must not
    become a matches-everything token that steals selection from the
    '*' group (r16 review repro: it disabled a disallow-all
    policy)."""
    body = "User-agent:\nDisallow: /tmp\n\nUser-agent: *\nDisallow: /\n"
    pol = rb.parse_robots(body, "anybot")
    assert not pol.allowed("/secret")


def test_group_tokens_prefix_match_product_tokens():
    """§2.2.1 discipline: a group token matches by case-insensitive
    PREFIX of a product token, not arbitrary substring — a one-letter
    token aimed at another crawler must not steal selection (r16
    review repro)."""
    body = (
        "User-agent: e\nDisallow: /tmp\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    pol = rb.parse_robots(body, "somebot")
    assert not pol.allowed("/secret")  # '*' group applies
    # but a genuine prefix of the product token does match
    pre = rb.parse_robots(
        "User-agent: some\nDisallow: /only\n\nUser-agent: *\nDisallow: /\n",
        "somebot/1.0",
    )
    assert pre.allowed("/secret") and not pre.allowed("/only/x")


def test_empty_path_with_query_matches_as_root(spark):
    """'https://h?q=1' has the empty path: RFC 9309 matches it as
    '/?q=1', so a 'Disallow: /' host blocks it (r16 review repro:
    the raw '?q=1' bypassed every '/'-prefixed rule)."""
    robots = spark.createDataFrame(
        [("blocked.net", "User-agent: *\nDisallow: /\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [("https://blocked.net?q=1",), ("https://blocked.net",)],
        "url string",
    )
    out = {r.url: r.allowed for r in rb.robots_filter(urls, robots).collect()}
    assert out == {
        "https://blocked.net?q=1": False,
        "https://blocked.net": False,
    }


def test_reserved_column_collision_refused(spark):
    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /\n")], "host string, body string"
    )
    urls = spark.createDataFrame(
        [("http://h/x", True)], "url string, allowed boolean"
    )
    with pytest.raises(ValueError, match="already carries"):
        rb.robots_filter(urls, robots)


def test_cap_counts_unselected_groups_and_body_truncates():
    """The compile cap must count rules in groups the agent never
    selects (a hostile file stacks rules elsewhere), and bodies
    truncate at the RFC's 512 KiB processing floor."""
    body = "User-agent: othercrawler\n" + "Disallow: /a\n" * 7
    pol = rb.parse_robots(body, "mybot")
    assert pol.rules == [] and pol.total_compiled == 7
    # truncation: a disallow-all line past the floor never applies
    huge = (
        "User-agent: *\nDisallow: /tmp\n"
        + "# pad\n" * 90_000
        + "Disallow: /\n"
    )
    assert len(huge) > rb._MAX_BODY_BYTES
    pol2 = rb.parse_robots(huge, "x")
    assert pol2.allowed("/kept") and not pol2.allowed("/tmp/x")
