"""Lexical crawl-trap detector over hand-built URLs."""

from pyspark.sql import functions as F

from gocrawler_spark.functions.traps import trap_features

CASES = [
    # (url, is_trap, why)
    ("https://a.example/x/y", 0, "clean shallow path"),
    ("https://a.example/p/p/p/p/p", 1, "self-similar tree"),
    ("https://a.example/blog/2023/11/05", 1, "calendar pagination"),
    ("https://a.example/item/9?sessionid=deadbeef", 1, "session mint"),
    ("https://a.example/item/9?sid=1&x=2", 1, "short sid param"),
    ("https://a.example/s?a=1&b=2&c=3&d=4&e=5", 0, "params alone = demote-not-trap"),
    ("https://a.example/a/b/c/d/e/f/g/h/i", 0, "deep but diverse: score 2"),
    ("https://a.example/a/b/a/b/a/b/c/d/e", 1, "deep AND repetitive"),
    ("https://a.example/page-2024", 0, "year not a path segment boundary trap"),
    ("https://a.example/2024/", 1, "year segment at root"),
]


def test_trap_verdicts(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    ft = trap_features(F.col("url"))
    got = df.select("url", ft["is_trap"].alias("t"), ft["trap_score"].alias("s")).collect()
    verdict = {r["url"]: r["t"] for r in got}
    for url, want, why in CASES:
        assert verdict[url] == want, (url, why, verdict[url])


def test_feature_values(spark):
    df = spark.createDataFrame(
        [("https://h.example/p/p/q/p?a=1&b=2",)], "url string"
    )
    ft = trap_features(F.col("url"))
    r = df.select(
        ft["host"].alias("host"), ft["depth"].alias("d"),
        ft["n_repeats"].alias("rep"), ft["n_params"].alias("np"),
    ).collect()[0]
    assert r["host"] == "h.example"
    assert r["d"] == 4 and r["rep"] == 2 and r["np"] == 2
