"""URL toolkit parity: Spark columns == pyref == reference behaviors
(crawler.go:283-382, 444-451)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from gocrawler_spark.config import covid_profile
from gocrawler_spark.functions import pyref
from gocrawler_spark.functions import urls as U

CFG = covid_profile()

URLS = [
    "https://euractiv.cz/section/politika/news/x",
    "https://www.nature.com/articles/s41586-020",
    "http://short.io",  # 15 chars → passes length gate
    "http://a.io",  # 11 chars → too short (min 13)
    "https://example.com/path?query=1",  # '?' rejected by validator
    "https://example.com/page#frag",  # '#' rejected by validator
    "https://en.wikipedia.org/wiki/Virus",  # banned domain (en.wikipedia)
    "https://github.com/owner/repo",  # banned domain
    "https://ok.example/file.pdf",  # banned token (.pdf)
    "https://ok.example/covid-article",
    "ftp://files.example/covid",  # wrong scheme
    "https://UPPER.example/COVID",  # case-insensitive validator
    "https://sub.deep.example.co.uk:8080/covid-test",
    "not a url at all",
    "https://example.com/" + "a" * 300,  # too long
]


def test_link_seems_ok_matrix(spark):
    df = spark.createDataFrame([Row(i=i, u=u) for i, u in enumerate(URLS)])
    for avoid in (True, False):
        got = {
            r["i"]: r["ok"]
            for r in df.select(
                "i", U.link_seems_ok(F.col("u"), CFG, avoid).alias("ok")
            ).collect()
        }
        for i, u in enumerate(URLS):
            assert got[i] == pyref.link_seems_ok(u, avoid, CFG), (u, avoid)


def test_expected_validator_decisions():
    ok = lambda u: pyref.link_seems_ok(u, True, CFG)
    assert ok("https://euractiv.cz/section/politika/news/x")
    assert not ok("http://a.io")
    assert not ok("https://example.com/path?query=1"), "query URLs must be rejected"
    assert not ok("https://example.com/page#frag")
    assert not ok("ftp://files.example/covid")
    assert ok("https://UPPER.example/COVID")


def test_domain_parity(spark):
    df = spark.createDataFrame([Row(i=i, u=u) for i, u in enumerate(URLS)])
    got = {
        r["i"]: (r["d"], r["sld"])
        for r in df.select(
            "i",
            U.domain_of(F.col("u")).alias("d"),
            U.second_level_domain_of(F.col("u")).alias("sld"),
        ).collect()
    }
    for i, u in enumerate(URLS):
        if not pyref.link_seems_ok(u, True, CFG):
            continue  # parity only matters for URLs that can enter the pool
        assert got[i][0] == pyref.get_domain(u), u
        assert got[i][1] == pyref.get_second_level_domain(u), u


def test_www_strip_and_sld():
    assert pyref.get_domain("https://www.nature.com/a") == "nature.com"
    assert pyref.get_domain("https://sub.nature.com/a") == "sub.nature.com"
    assert pyref.get_second_level_domain("https://sub.deep.example.co.uk/x") == "co.uk"
    assert pyref.get_second_level_domain("http://localhost/x") == "localhost"


def test_is_banned_parity(spark):
    df = spark.createDataFrame([Row(i=i, u=u) for i, u in enumerate(URLS)])
    got = {
        r["i"]: r["b"]
        for r in df.select(
            "i",
            U.is_banned(F.col("u"), U.domain_of(F.col("u")), CFG).alias("b"),
        ).collect()
    }
    for i, u in enumerate(URLS):
        assert got[i] == pyref.is_banned(u, pyref.get_domain(u), CFG), u
    assert got[6] is True  # en.wikipedia.org
    assert got[7] is True  # github.com
    assert got[8] is True  # .pdf


def test_canonicalize(spark):
    rows = [
        Row(u="HTTPS://Example.COM/Path"),
        Row(u="https://example.com/page#frag"),
        Row(u="https://example.com:443/x"),
        Row(u="https://example.com:8080/x"),
    ]
    df = spark.createDataFrame(rows)
    got = [r["c"] for r in df.select(U.canonicalize(F.col("u")).alias("c")).collect()]
    assert got[0] == "https://example.com/Path"
    assert got[1] == "https://example.com/page"
    assert got[2] == "https://example.com/x"
    assert got[3] == "https://example.com:8080/x"


def test_canonicalize_default_ports_are_scheme_specific(spark):
    """:80 strips only from http, :443 only from https — the cross
    pairs are DISTINCT origins and must keep distinct seen-set keys."""
    from pyspark.sql import Row

    rows = [
        Row(u="http://h.example:80/x"),
        Row(u="https://h.example:443/x"),
        Row(u="https://h.example:80/x"),
        Row(u="http://h.example:443/x"),
        Row(u="http://h.example:8080/x"),
    ]
    got = [
        r["c"]
        for r in spark.createDataFrame(rows)
        .select(U.canonicalize(F.col("u")).alias("c"))
        .collect()
    ]
    assert got == [
        "http://h.example/x",
        "https://h.example/x",
        "https://h.example:80/x",
        "http://h.example:443/x",
        "http://h.example:8080/x",
    ]
