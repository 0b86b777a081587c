"""RFC 9309 robots.txt parser semantics (functions/robots.py)."""

from gocrawler_spark.functions.robots import (
    RobotsRules,
    disallow_prefixes_conservative,
    is_allowed,
    parse_robots,
)

SAMPLE = """
# comment line
User-agent: otherbot
Disallow: /

User-agent: testbot
Crawl-delay: 2.5
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*.log$
Disallow: /exact$

User-agent: testbot
Disallow: /second-group
"""


def test_group_selection_exact_beats_star():
    txt = "User-agent: *\nDisallow: /\n\nUser-agent: me\nDisallow: /only\n"
    r = parse_robots(txt, "ME")  # agent match is case-insensitive
    assert r.rules == (("/only", False),)
    assert is_allowed(r, "/anything")
    assert not is_allowed(r, "/only/page")


def test_star_group_applies_when_no_exact():
    txt = "User-agent: *\nDisallow: /blocked\n"
    r = parse_robots(txt, "me")
    assert not is_allowed(r, "/blocked/x")
    assert is_allowed(r, "/open")


def test_no_matching_group_allows_everything():
    txt = "User-agent: otherbot\nDisallow: /\n"
    r = parse_robots(txt, "me")
    assert r.matched_group is False
    assert is_allowed(r, "/anything")


def test_matching_groups_merge():
    r = parse_robots(SAMPLE, "testbot")
    # rules from BOTH testbot groups apply (RFC 9309 §2.2.1)
    assert not is_allowed(r, "/second-group/x")
    assert not is_allowed(r, "/private/secret")


def test_longest_match_allow_override():
    r = parse_robots(SAMPLE, "testbot")
    assert not is_allowed(r, "/private/x")
    assert is_allowed(r, "/private/ok/x")  # longer Allow wins


def test_tie_goes_to_allow():
    txt = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    r = parse_robots(txt, "me")
    assert is_allowed(r, "/dir/x")


def test_wildcard_and_anchor():
    r = parse_robots(SAMPLE, "testbot")
    assert not is_allowed(r, "/tmp/a.log")  # /tmp/*.log$
    assert is_allowed(r, "/tmp/a.log.bak")  # $ anchors the end
    assert not is_allowed(r, "/exact")
    assert is_allowed(r, "/exact/sub")


def test_crawl_delay_first_wins_and_is_ms():
    r = parse_robots(SAMPLE, "testbot")
    assert r.crawl_delay_ms == 2500


def test_empty_disallow_is_allow_all():
    txt = "User-agent: *\nDisallow:\n"
    r = parse_robots(txt, "me")
    assert r.rules == ()
    assert is_allowed(r, "/x")


def test_garbage_never_throws():
    r = parse_robots("\x00\x01 not: a robots file\nDisallow /nope", "me")
    assert is_allowed(r, "/anything")


def test_conservative_prefix_adapter():
    r = parse_robots(SAMPLE, "testbot")
    # allows dropped, wildcard truncated at '*', trailing $ stripped —
    # each resulting prefix over-blocks or equals its source rule
    assert disallow_prefixes_conservative(r) == [
        "/private",
        "/tmp/",
        "/exact",
        "/second-group",
    ]


def test_rules_before_any_group_ignored():
    txt = "Disallow: /early\nUser-agent: *\nDisallow: /late\n"
    r = parse_robots(txt, "me")
    assert is_allowed(r, "/early")
    assert not is_allowed(r, "/late")


def test_text_parser_feeds_politeness_cache(spark):
    """End-to-end wiring: a robots.txt TEXT fetcher → parse_robots →
    conservative prefix adapter → the politeness cache/gate blocks the
    same URLs as is_allowed for prefix-only rule sets."""
    from pyspark.sql import functions as F

    from gocrawler_spark.operators import politeness as PO

    texts = {
        "a.example": (
            "User-agent: *\nCrawl-delay: 1\nDisallow: /priv\nDisallow: /x/\n"
        ),
        "b.example": "User-agent: elsebot\nDisallow: /\n",
    }

    def robots_fn(domain):
        r = parse_robots(texts[domain], "gocrawler")
        return (
            disallow_prefixes_conservative(r),
            r.crawl_delay_ms or 0,
        )

    robots = PO.fetch_missing_robots(
        PO.empty_robots(spark),
        spark.createDataFrame(
            [("a.example",), ("b.example",)], "domain string"
        ),
        wave=1,
        robots_fn=robots_fn,
    )
    wave = spark.createDataFrame(
        [
            ("https://a.example/priv/1", "a.example"),
            ("https://a.example/pub/1", "a.example"),
            ("https://b.example/priv/1", "b.example"),
        ],
        "url string, domain string",
    )
    gated = PO.robots_gate(wave, robots)
    verdicts = {
        r["url"]: r["robots_allowed"]
        for r in gated.select("url", F.col("robots_allowed")).collect()
    }
    assert verdicts == {
        "https://a.example/priv/1": False,
        "https://a.example/pub/1": True,
        "https://b.example/priv/1": True,  # no group matches gocrawler
    }


def test_unknown_or_sitemap_lines_do_not_split_agent_runs():
    """RFC 9309 §2.2.4: records outside the group grammar must not
    interfere — a Sitemap: or unknown line between consecutive
    User-agent lines keeps them in ONE group."""
    txt = (
        "User-agent: a\n"
        "Sitemap: https://x/s.xml\n"
        "User-agent: b\n"
        "Host: example.org\n"  # unknown directive
        "User-agent: c\n"
        "Disallow: /p\n"
    )
    for agent in ("a", "b", "c"):
        r = parse_robots(txt, agent)
        assert r.rules == (("/p", False),), agent
        assert not is_allowed(r, "/p/x")
    assert parse_robots(txt, "a").sitemaps == ("https://x/s.xml",)


def test_conservative_adapter_never_under_blocks_leading_star():
    txt = "User-agent: *\nDisallow: *.pdf$\nDisallow: /ok*\n"
    r = parse_robots(txt, "me")
    # leading-'*' pattern maps to '/', never silently dropped
    assert disallow_prefixes_conservative(r) == ["/", "/ok"]
