"""sitemaps.org parser + robots Sitemap: discovery (functions/sitemaps.py)."""

import gocrawler_spark.functions.sitemaps as SM
from gocrawler_spark.functions.robots import parse_robots
from gocrawler_spark.functions.sitemaps import (
    changefreq_lambda,
    parse_sitemap,
    parse_w3c_datetime,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/p1</loc>
    <lastmod>2026-01-05T00:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/p2</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/s0.xml</loc>
           <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.example/s1.xml</loc></sitemap>
</sitemapindex>
"""


def test_urlset_fields():
    p = parse_sitemap(URLSET)
    assert p.kind == "urlset"
    # the loc-less third <url> is dropped (loc is required)
    assert [e.loc for e in p.entries] == [
        "https://a.example/p1",
        "https://a.example/p2",
    ]
    e = p.entries[0]
    assert e.lastmod_ts == 1767571200  # 2026-01-05T00:00:00Z
    assert e.changefreq == "daily"
    assert e.priority == 0.8
    # defaults: no lastmod/changefreq -> None, priority -> 0.5
    d = p.entries[1]
    assert (d.lastmod_ts, d.changefreq, d.priority) == (None, None, 0.5)


def test_index_parse():
    p = parse_sitemap(INDEX)
    assert p.kind == "index"
    assert [e.loc for e in p.entries] == [
        "https://a.example/s0.xml",
        "https://a.example/s1.xml",
    ]
    assert p.entries[0].lastmod_ts == parse_w3c_datetime("2026-02-01")


def test_namespace_agnostic():
    no_ns = "<urlset><url><loc>https://x/p</loc></url></urlset>"
    prefixed = (
        '<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sm:url><sm:loc>https://x/p</sm:loc></sm:url></sm:urlset>"
    )
    for txt in (no_ns, prefixed):
        p = parse_sitemap(txt)
        assert p.kind == "urlset"
        assert [e.loc for e in p.entries] == ["https://x/p"]


def test_w3c_datetime_variants():
    midnight = parse_w3c_datetime("2026-01-01")
    assert midnight == 1767225600
    assert parse_w3c_datetime("2026-01-01T00:00:00Z") == midnight
    assert parse_w3c_datetime("2026-01-01T01:00:00+01:00") == midnight
    # naive timestamps are treated as UTC
    assert parse_w3c_datetime("2026-01-01T00:00:00") == midnight
    assert parse_w3c_datetime("not a date") is None
    assert parse_w3c_datetime("") is None


def test_priority_garbage_and_range():
    txt = (
        "<urlset>"
        "<url><loc>https://x/a</loc><priority>1.5</priority></url>"
        "<url><loc>https://x/b</loc><priority>oops</priority></url>"
        "<url><loc>https://x/c</loc><priority>0.0</priority></url>"
        "</urlset>"
    )
    p = parse_sitemap(txt)
    assert [e.priority for e in p.entries] == [0.5, 0.5, 0.0]


def test_unknown_changefreq_is_none():
    txt = (
        "<urlset><url><loc>https://x/a</loc>"
        "<changefreq>fortnightly</changefreq></url></urlset>"
    )
    assert parse_sitemap(txt).entries[0].changefreq is None


def test_garbage_never_throws_and_salvage():
    assert parse_sitemap("\x00\x01 not xml").kind == "invalid"
    assert parse_sitemap("<html><body>hi</body></html>").kind == "invalid"
    # malformed XML (unclosed tag) but sitemap vocabulary: loc salvage
    broken = (
        "<urlset><url><loc>https://x/p1</loc></url>"
        "<url><loc>https://x/p2</loc>"
    )
    p = parse_sitemap(broken)
    assert p.kind == "urlset"
    assert [e.loc for e in p.entries] == ["https://x/p1", "https://x/p2"]


def test_entry_cap_truncates(monkeypatch):
    monkeypatch.setattr(SM, "MAX_ENTRIES", 3)
    txt = "<urlset>" + "".join(
        f"<url><loc>https://x/p{i}</loc></url>" for i in range(5)
    ) + "</urlset>"
    p = SM.parse_sitemap(txt)
    assert len(p.entries) == 3
    assert p.truncated


def test_robots_sitemap_directive_collection():
    txt = (
        "Sitemap: https://x/before-any-group.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "SITEMAP: https://x/mid.xml\n"
        "User-agent: me\n"
        "Disallow: /p\n"
    )
    r = parse_robots(txt, "me")
    # non-group scope: all occurrences, file order, any case
    assert r.sitemaps == (
        "https://x/before-any-group.xml",
        "https://x/mid.xml",
    )
    # surfaced even when no group matches the agent
    assert parse_robots(txt, "nobody").sitemaps == r.sitemaps
    # a Sitemap line does not terminate a User-agent run's group
    assert r.rules == (("/p", False),)


def test_changefreq_lambda_mapping():
    assert changefreq_lambda("daily") == 1.0
    assert changefreq_lambda("hourly") == 24.0
    assert changefreq_lambda(None) == changefreq_lambda("weekly")
    assert changefreq_lambda("bogus") == changefreq_lambda("weekly")
    assert changefreq_lambda("never") > 0  # never frozen out


def test_discovery_chain_closed_form():
    from gocrawler_spark.queries.sitemap_q import discover_seed_rows

    doc_ids = [0, 3, 7, 10, 14, 21]  # host j=0 docs (all % 7 == 0)
    pdf = discover_seed_rows(0, doc_ids)
    assert len(pdf) == len(doc_ids)
    assert set(pdf["host"]) == {"l0.example"}
    assert set(pdf["n_children"]) == {2}
    by = {
        int(lm): (cf, int(pm), int(lam))
        for lm, cf, pm, lam in zip(
            pdf["lastmod_ts"],
            pdf["changefreq"],
            pdf["priority_milli"],
            pdf["lambda_micro"],
        )
    }
    for doc_id in doc_ids:
        lm = 1767225600 + (doc_id % 28) * 86400
        cf, pm, lam = by[lm]
        assert cf == ("daily", "weekly", "monthly")[doc_id % 3]
        assert pm == ((doc_id % 10) + 1) * 100
        assert lam == {"daily": 1000000, "weekly": 142857, "monthly": 33333}[
            cf
        ]
