r"""Sitemap parser (sitemaps.org XML protocol, v0.9).

The reference discovers URLs only by extracting anchors from fetched
pages (collectlinks.All, /root/reference/crawler.go:219); it never
reads sitemaps. A web-scale frontier wants them: a sitemap is the
host's own declaration of its URL inventory plus freshness hints
(``lastmod``/``changefreq``) that feed the Cho & Garcia-Molina λ·age
recrawl ranking (queries/freshness_q.py) without spending a single
fetch on change detection. Discovery chain: ``Sitemap:`` lines in
robots.txt (functions/robots.py) → sitemapindex → urlset → frontier
seeds.

Pure functions, no network — the fetch stage calls them inside its
mapInPandas/applyInPandas batch, one parse per sitemap document.

Implemented semantics (https://www.sitemaps.org/protocol.html):
- ``<urlset>`` files: per ``<url>`` read ``<loc>`` (required; entries
  without one are dropped), ``<lastmod>`` (W3C datetime: date-only or
  full timestamp with zone), ``<changefreq>`` (one of the seven
  protocol values, else None), ``<priority>`` ([0.0, 1.0], protocol
  default 0.5; out-of-range or garbage → default);
- ``<sitemapindex>`` files: per ``<sitemap>`` read child ``<loc>`` and
  optional ``<lastmod>``;
- namespace-agnostic tag matching (files in the wild use the 0.9
  namespace, no namespace, or stray prefixes);
- the protocol's 50,000-entry cap per file is enforced by truncation
  (a conforming generator never exceeds it; a hostile one must not
  blow up the crawler);
- parsing never throws: malformed XML falls back to a regex ``<loc>``
  salvage (loc-only entries), and arbitrary bytes yield an empty
  invalid parse.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone
from xml.etree import ElementTree

MAX_ENTRIES = 50_000  # protocol cap per sitemap file

# changefreq → expected changes/day for the λ·age recrawl model
# (queries/freshness_q.py). "always" is a stronger claim than hourly —
# modeled at 2×hourly; "never" still gets a tiny λ so stale-forever
# pages are eventually revisited rather than frozen out.
CHANGEFREQ_LAMBDA_PER_DAY = {
    "always": 48.0,
    "hourly": 24.0,
    "daily": 1.0,
    "weekly": 1.0 / 7.0,
    "monthly": 1.0 / 30.0,
    "yearly": 1.0 / 365.0,
    "never": 1.0 / 3650.0,
}

_LOC_RX = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


@dataclass(frozen=True)
class SitemapEntry:
    """One ``<url>`` (or ``<sitemap>`` child) record."""

    loc: str
    lastmod_ts: int | None = None  # epoch seconds, UTC
    changefreq: str | None = None  # validated protocol value
    priority: float = 0.5  # protocol default


@dataclass(frozen=True)
class SitemapParse:
    kind: str  # "urlset" | "index" | "invalid"
    entries: tuple[SitemapEntry, ...] = ()
    truncated: bool = False  # hit the 50k protocol cap


def _localname(tag: str) -> str:
    """Tag name with any ``{namespace}`` / ``prefix:`` stripped."""
    if "}" in tag:
        tag = tag.rsplit("}", 1)[1]
    if ":" in tag:
        tag = tag.rsplit(":", 1)[1]
    return tag.lower()


def parse_w3c_datetime(val: str) -> int | None:
    """W3C datetime (the sitemap ``lastmod`` format — ISO 8601 subset)
    → epoch seconds UTC, or None if unparseable. Date-only values mean
    midnight UTC; a naive timestamp is treated as UTC (the protocol
    requires a zone, but absent ones are common in the wild)."""
    s = val.strip()
    if not s:
        return None
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _parse_priority(val: str) -> float:
    try:
        p = float(val.strip())
    except ValueError:
        return 0.5
    return p if 0.0 <= p <= 1.0 else 0.5


def _entry_from_fields(fields: dict[str, str]) -> SitemapEntry | None:
    loc = fields.get("loc", "").strip()
    if not loc:
        return None  # <loc> is the one required element
    cf = fields.get("changefreq", "").strip().lower()
    return SitemapEntry(
        loc=loc,
        lastmod_ts=parse_w3c_datetime(fields.get("lastmod", "")),
        changefreq=cf if cf in CHANGEFREQ_LAMBDA_PER_DAY else None,
        priority=_parse_priority(fields.get("priority", "")),
    )


def parse_sitemap(text: str) -> SitemapParse:
    """Parse one sitemap document (urlset or sitemapindex)."""
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return _salvage(text)
    root_name = _localname(root.tag)
    if root_name == "urlset":
        kind, item_name = "urlset", "url"
    elif root_name == "sitemapindex":
        kind, item_name = "index", "sitemap"
    else:
        return SitemapParse(kind="invalid")
    entries: list[SitemapEntry] = []
    truncated = False
    for item in root:
        if _localname(item.tag) != item_name:
            continue
        if len(entries) >= MAX_ENTRIES:
            truncated = True
            break
        fields = {
            _localname(ch.tag): (ch.text or "")
            for ch in item
            if _localname(ch.tag)
            in ("loc", "lastmod", "changefreq", "priority")
        }
        e = _entry_from_fields(fields)
        if e is not None:
            entries.append(e)
    return SitemapParse(
        kind=kind, entries=tuple(entries), truncated=truncated
    )


def _salvage(text: str) -> SitemapParse:
    """Malformed XML: scrape ``<loc>`` values (loc-only entries). The
    kind is guessed from the earliest root-ish token; with no sitemap
    vocabulary at all the parse is invalid and empty."""
    low = text.lower()
    iu, ii = low.find("<urlset"), low.find("<sitemapindex")
    if iu < 0 and ii < 0:
        return SitemapParse(kind="invalid")
    kind = "urlset" if (ii < 0 or (0 <= iu < ii)) else "index"
    locs = _LOC_RX.findall(text)
    return SitemapParse(
        kind=kind,
        entries=tuple(SitemapEntry(loc=loc) for loc in locs[:MAX_ENTRIES]),
        truncated=len(locs) > MAX_ENTRIES,
    )


def changefreq_lambda(changefreq: str | None) -> float:
    """Expected changes/day for the recrawl priority model; unknown or
    absent changefreq gets the protocol-neutral weekly rate."""
    if changefreq is None:
        return CHANGEFREQ_LAMBDA_PER_DAY["weekly"]
    return CHANGEFREQ_LAMBDA_PER_DAY.get(
        changefreq.lower(), CHANGEFREQ_LAMBDA_PER_DAY["weekly"]
    )
