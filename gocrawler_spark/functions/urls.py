"""URL toolkit as Spark column expressions (JVM-side, codegen-friendly).

Reference semantics: getDomain crawler.go:283-297, getSecondLevelDomain
crawler.go:299-313, isBanned crawler.go:319-331, linkSeemsOk
crawler.go:333-382, CGI canonicalization crawler.go:444-451 (dead code
in the reference — the validator rejects '?'-bearing URLs first; the
engine adds a real RFC-3986-style canonicalizer for the scale path).

All of these are pure column expressions: Catalyst folds them into the
scan-side filter of the wave plan, so ban/validation predicates never
shuffle and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gocrawler_spark.config import REGEX_URL_VALID, CrawlConfig


def host_of(url: Column) -> Column:
    """Hostname, CASE-PRESERVED ('' when unparseable) — Go's
    ``url.Hostname()`` does not lowercase (crawler.go:292), and the
    case reaches real state: domainCounter keys (two spellings of a
    host are two priority buckets), the case-sensitive intra-site
    ``strings.Contains`` drop, and ban matching. The engine-level
    seen-set canonicalizer (``canonicalize``) lowercases separately.
    """
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))


def domain_of(url: Column) -> Column:
    """getDomain: hostname minus one leading 'www.' (crawler.go:294)."""
    return F.regexp_replace(host_of(url), r"^www\.", "")


def second_level_domain_of(url: Column) -> Column:
    """getSecondLevelDomain: last two dot-labels; single-label hosts
    pass through unchanged (Go ReplaceAllString no-match behavior)."""
    h = host_of(url)
    sld = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(sld == "", h).otherwise(sld)


def is_banned(url: Column, domain: Column, cfg: CrawlConfig) -> Column:
    """isBanned: unanchored search on domain + url (crawler.go:319-331)."""
    return domain.rlike(cfg.regex_banned_domains) | url.rlike(
        cfg.regex_link_banned_tokens
    )


def link_seems_ok(url: Column, cfg: CrawlConfig, avoid_custom_check: bool) -> Column:
    """linkSeemsOk: length 13..256 + ParseRequestURI + structural regex
    (+ topical gate), all as column predicates (no UDF).

    The structural regex (crawler.go:354) covers most of Go's
    url.ParseRequestURI (crawler.go:343): its charset excludes spaces,
    control chars, '#', '[' and non-ASCII, and it anchors the scheme.
    The ONE reject it misses is an invalid percent-escape — '%' is in
    the charset but ParseRequestURI errors unescaping '%zz' — so that
    check is stated explicitly."""
    ok = (
        F.length(url).between(13, 256)
        & url.rlike(REGEX_URL_VALID)
        & ~url.rlike("%(?![0-9A-Fa-f]{2})")
    )
    if not avoid_custom_check:
        ok = ok & url.rlike(cfg.regex_link_ok)
    return ok


def canonicalize(url: Column) -> Column:
    """Engine-level RFC-3986-ish canonicalizer (north_rule addition; the
    reference's CGI strip crawler.go:444-451 never fires).

    lowercase scheme+host, strip fragment, strip trailing '?', drop
    default ports. Applied BEFORE the seen-set in scale mode; exact
    reference-parity mode bypasses it (the reference dedups on the raw
    string).
    """
    u = F.regexp_replace(url, r"#.*$", "")  # strip fragment
    u = F.regexp_replace(u, r"\?$", "")  # bare '?'
    # lowercase scheme://host (group 1), keep the rest as-is
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    # default ports are scheme-specific: 80 is only default for http
    # and 443 only for https — a scheme-agnostic strip would conflate
    # e.g. https://h:80 (a distinct origin) with https://h in the
    # seen-set key
    u = F.regexp_replace(u, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    return u


def url_key(url: Column) -> Column:
    """64-bit dedup key for the seen-set: xxhash64 over the canonical
    URL (Spark built-in, JVM-side)."""
    return F.xxhash64(url)
