"""Robots Exclusion Protocol (RFC 9309) — the crawl-POLICY stage that
sits beside WARC ingestion: a crawler may only fetch (and a compliant
corpus pipeline may only keep) URLs the origin's robots.txt allows,
so frontier construction composes ``extract_links`` →
``canonicalize_url`` → THIS filter.

Dependency-free parser + Spark filter face, public-spec semantics:

- **Groups** (§2.1): consecutive ``User-agent:`` lines open a group
  sharing the rules that follow; group selection takes the LONGEST
  user-agent token that is a case-insensitive substring match of the
  caller's product token, falling back to the ``*`` group; per §2.2.1
  only the most specific matching group applies (groups do not merge
  across distinct tokens).
- **Rules** (§2.2.2): ``Allow`` / ``Disallow`` path patterns with
  ``*`` wildcards and a ``$`` end anchor; the match is evaluated
  against the URL's path+query; the rule with the MOST OCTETS in its
  pattern wins, and Allow wins length ties. An empty ``Disallow:``
  matches nothing (the classic allow-all group). No matching rule →
  allowed (§2.2.3).
- **Extras** every real crawler honors: ``Crawl-delay`` (seconds, the
  de-facto extension — not in the RFC but served by a large share of
  hosts) and global ``Sitemap:`` URLs.

Scale shape: robots.txt files are per-HOST and small (the RFC caps
mandatory parsing at 500 KiB) while the URL corpus is the crawl
itself — the same small-against-huge premise as the decontamination
broadcast. The compiled per-host matchers ride the task closure of
ONE Arrow ``mapInPandas`` pass over the URL column; a corpus of
robots rules beyond the documented cap is refused loudly rather than
silently shipped to every task.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "Rule",
    "RobotsPolicy",
    "parse_robots",
    "robots_filter",
]

#: refuse to close over an unbounded rule corpus — past this the
#: broadcast-closure premise is wrong and a join is the right tool
_MAX_TOTAL_RULES = 1_000_000


@dataclass(frozen=True)
class Rule:
    allow: bool
    pattern: str  # raw robots pattern (for reporting)
    parts: tuple  # literal segments split on '*'
    anchored: bool  # trailing '$' end anchor
    octets: int  # specificity = len(pattern) per §2.2.2

    def matches(self, path: str) -> bool:
        """Non-backtracking wildcard walk — NOT a regex, because
        robots.txt bodies are REMOTE-HOST-CONTROLLED input and a
        naive ``*``→``.*`` translation is catastrophically
        backtrackable (``*a*a*a…$`` hangs the matcher — the r16
        review's ReDoS repro). Greedy left-to-right: the first
        literal must be a path prefix, middle literals are found in
        order, and the last literal is a suffix (``$``) or merely
        present (prefix-match semantics otherwise). Linear-ish
        (O(parts × path)), worst case quadratic, never
        exponential."""
        first = self.parts[0]
        if not path.startswith(first):
            return False
        pos = len(first)
        if len(self.parts) == 1:
            return len(path) == pos if self.anchored else True
        for seg in self.parts[1:-1]:
            i = path.find(seg, pos)
            if i < 0:
                return False
            pos = i + len(seg)
        last = self.parts[-1]
        if self.anchored:
            return path.endswith(last) and len(path) - len(last) >= pos
        return path.find(last, pos) >= 0


def _compile_pattern(pattern: str) -> tuple[tuple, bool]:
    """Robots path pattern → (literal segments split on ``*``,
    end-anchored?) for :meth:`Rule.matches`."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    return tuple(body.split("*")), anchored


class RobotsPolicy:
    """One host's parsed policy: the selected group's rules plus the
    file-global sitemaps; ``allowed(path)`` applies the §2.2.2
    longest-match / Allow-wins-ties rule."""

    def __init__(
        self,
        rules: List[Rule],
        crawl_delay: float | None,
        sitemaps: List[str],
        total_compiled: int = 0,
    ) -> None:
        self.rules = rules
        self.crawl_delay = crawl_delay
        self.sitemaps = sitemaps
        #: rules compiled across ALL groups of the file — the
        #: resource-cap accounting unit (the selected group may be
        #: tiny while the file is enormous)
        self.total_compiled = total_compiled

    def allowed(self, path: str) -> bool:
        best: Rule | None = None
        for r in self.rules:
            if r.matches(path):
                if (
                    best is None
                    or r.octets > best.octets
                    or (r.octets == best.octets and r.allow and not best.allow)
                ):
                    best = r
        return True if best is None else best.allow


#: bodies are truncated here before parsing — the RFC only obliges
#: parsers to process 500 KiB, and an unbounded remote body must not
#: buy unbounded driver-side compile work
_MAX_BODY_BYTES = 512 * 1024


def _product_tokens(agent: str) -> List[str]:
    """The agent string's product tokens: the leading
    ``[a-zA-Z_-]+`` run of each whitespace-separated word, lowered —
    the unit RFC 9309 §2.2.1 matches group tokens against."""
    out = []
    for word in agent.lower().split():
        m = re.match(r"[a-z_\-]+", word)
        if m:
            out.append(m.group(0))
    return out


def parse_robots(text: str, agent: str = "*") -> RobotsPolicy:
    """Parse one robots.txt body for ``agent``. Group selection per
    §2.2.1: a group token matches when it is a non-empty
    case-insensitive PREFIX of one of the agent's product tokens
    (the google/robotstxt discipline — NOT arbitrary substring
    containment, which would let a one-letter token aimed at another
    crawler steal selection from ``*``; the r16 review repro); the
    longest matching token wins and ``*`` is the fallback; groups
    sharing a token merge; an EMPTY ``User-agent:`` value names no
    crawler and is dropped (it must not become a match-everything
    token). Unknown lines and comments (``#`` to end of line) are
    ignored — the RFC demands tolerant parsing; only the selected
    group's Crawl-delay applies, while Sitemap lines are
    file-global. Bodies beyond 512 KiB are truncated first (the
    RFC's processing floor — remote input must not buy unbounded
    compile work)."""
    if len(text) > _MAX_BODY_BYTES:
        text = text[:_MAX_BODY_BYTES]
        text = text.rsplit("\n", 1)[0]  # drop the cut line
    tokens = _product_tokens(agent)
    groups: dict[str, dict] = {}
    sitemaps: List[str] = []
    current: List[str] = []
    last_was_ua = False
    n_compiled = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not last_was_ua:
                current = []
            token = value.lower()
            if token:  # an empty UA value names no crawler
                current.append(token)
                groups.setdefault(token, {"rules": [], "delay": None})
            last_was_ua = True
            continue
        last_was_ua = False
        if field in ("allow", "disallow"):
            if field == "disallow" and value == "":
                continue  # empty Disallow matches nothing
            parts, anchored = _compile_pattern(value)
            rule = Rule(
                allow=(field == "allow"),
                pattern=value,
                parts=parts,
                anchored=anchored,
                octets=len(value),
            )
            if current:
                n_compiled += 1
            for token in current:
                groups[token]["rules"].append(rule)
        elif field == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            for token in current:
                groups[token]["delay"] = d
    # §2.2.1 group selection: longest token that prefix-matches a
    # product token of the agent; '*' is the fallback
    chosen = None
    for token in groups:
        if token != "*" and any(pt.startswith(token) for pt in tokens):
            if chosen is None or len(token) > len(chosen):
                chosen = token
    if chosen is None and "*" in groups:
        chosen = "*"
    g = groups.get(chosen, {"rules": [], "delay": None})
    return RobotsPolicy(g["rules"], g["delay"], sitemaps, n_compiled)


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Crawl-policy filter face: annotate every URL row with
    ``allowed`` (and the host's ``crawl_delay``) under the hosts'
    robots.txt bodies. ``urls`` carries ``url_col``; ``robots``
    carries one ``(host, body)`` row per host.

    The policies are parsed ONCE on the driver from the (small,
    per-host) robots corpus, compiled, and ride the task closure of
    one Arrow ``mapInPandas`` pass over the URL column — the
    decontamination-broadcast premise; a rule corpus beyond
    ``_MAX_TOTAL_RULES`` is refused loudly. URLs whose host serves
    no robots.txt are allowed (the protocol's default). The host and
    path are taken from the URL itself (RFC 3986 grammar, the
    ``url_parts`` regexes' Python twins; userinfo/port stripped and
    the IPv6 bracket form kept whole for the policy lookup), with
    the match evaluated on path+query per §2.2.2. Every input column
    passes through unchanged (a FILTER face must not force a
    join-back on a possibly non-unique URL column), with ``allowed``
    and ``crawl_delay`` appended; stateless, so the same pass runs
    under ``readStream``."""
    for reserved in ("allowed", "crawl_delay"):
        if reserved in urls.columns:
            raise ValueError(
                f"urls frame already carries a {reserved!r} column — "
                "robots_filter appends it; rename or drop the "
                "existing one first"
            )
    policies: dict[str, RobotsPolicy] = {}
    total = 0
    for row in robots.select(host_col, body_col).collect():
        if row[host_col] is None or row[body_col] is None:
            continue
        pol = parse_robots(row[body_col], agent)
        # account every rule the file made us COMPILE, not just the
        # selected group's share — the cap bounds driver work and
        # closure size, and a hostile file can stack its rules in
        # groups the agent never selects
        total += pol.total_compiled
        if total > _MAX_TOTAL_RULES:
            raise ValueError(
                f"robots corpus exceeds {_MAX_TOTAL_RULES} compiled "
                "rules — the broadcast-closure premise no longer "
                "holds; partition the crawl by host instead"
            )
        policies[row[host_col].lower()] = pol

    host_re = re.compile(r"^[^:/?#]+://([^/?#]*)")
    # path and query captured separately: an empty path with a query
    # ('https://h?q=1') must match rules as '/?q=1', not '?q=1' —
    # RFC 9309 treats the empty path as '/' (r16 review repro: every
    # '/'-prefixed rule was bypassed)
    path_re = re.compile(r"^[^:/?#]+://[^/?#]*([^?#]*)(\?[^#]*)?")

    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in urls.schema.fields
    )
    out_schema = f"{passthrough}, allowed boolean, crawl_delay double"

    def lookup_host(authority: str) -> str:
        authority = authority.rsplit("@", 1)[-1]
        if authority.startswith("["):  # IPv6 literal: keep brackets
            end = authority.find("]")
            return authority[: end + 1] if end >= 0 else authority
        return authority.split(":", 1)[0]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            allowed, delay = [], []
            for u in pdf[url_col]:
                pol = None
                if isinstance(u, str):
                    hm = host_re.match(u)
                    if hm:
                        pol = policies.get(lookup_host(hm.group(1).lower()))
                if pol is None:
                    allowed.append(True)
                    delay.append(None)
                    continue
                pm = path_re.match(u)
                path = (pm.group(1) or "/") if pm else "/"
                query = (pm.group(2) or "") if pm else ""
                allowed.append(pol.allowed(path + query))
                delay.append(pol.crawl_delay)
            pdf = pdf.copy()
            pdf["allowed"] = pd.Series(allowed, dtype="bool").to_numpy()
            pdf["crawl_delay"] = pd.Series(
                delay, dtype="float64"
            ).to_numpy()
            yield pdf

    return urls.mapInPandas(run, out_schema)
