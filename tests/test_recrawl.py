"""Recrawl wave e2e: cuckoo retirement makes a fetched URL crawlable
again, it is re-fetched EXACTLY once, and the deletable seen-set's
invariants hold through delete + re-insert (round-2 verdict "Next
round" #5 — the cuckoo filter wired into the engine as the consumer
`recrawl_priority` names, not just a standalone operator)."""

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators import cuckoo as CK
from gocrawler_spark.plans.crawl import CrawlEngine
from tests.test_crawl_e2e import _tp


def _probe_map(spark, eng, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r["url"]: r["maybe_seen"]
        for r in CK.probe(
            eng.state.cuckoo, df, n_shards=eng.cuckoo_shards
        ).collect()
    }


def test_retire_refetch_exactly_once(spark):
    eng = CrawlEngine(
        spark, _tp(wave_size=8, per_host_budget=2), use_cuckoo=True
    )
    eng.run(max_steps=3)
    st = eng.state

    fetched = sorted(r["url"] for r in st.pages.select("url").collect())
    assert len(fetched) >= 3
    # seen-set tracks exactly the page-cache keys before retirement
    before = _probe_map(spark, eng, fetched)
    assert all(before.values())

    retired = eng.retire_stalest(1)
    url = retired.collect()[0]["url"]
    assert url == "https://seed.example/start"  # wave-1 fetch is stalest

    # invariants after delete: retired key gone, every other key intact
    after = _probe_map(spark, eng, fetched)
    assert after[url] is False
    assert all(v for u, v in after.items() if u != url)
    # page cache evicted; frontier row reset to pending with seq kept
    assert st.pages.filter(F.col("url") == url).count() == 0
    row = st.frontier.filter(F.col("url") == url).collect()[0]
    assert row["status"] == 0 and row["seq"] == 0

    # one select-everything wave: the retired URL must be re-fetched
    pre_log = st.crawl_log.filter(F.col("url") == url).count()
    eng.cfg = eng.cfg.with_(wave_size=100_000, per_host_budget=0)
    assert eng.step()
    assert (
        eng.state.crawl_log.filter(F.col("url") == url).count()
        == pre_log + 1
    )
    # fetched again exactly once: cache holds ONE fresh row, and the
    # seen-set shows the key again (delete + re-insert round trip)
    assert eng.state.pages.filter(F.col("url") == url).count() == 1
    assert _probe_map(spark, eng, [url])[url] is True


def test_retire_requires_cuckoo(spark):
    eng = CrawlEngine(spark, _tp(wave_size=1))
    eng.run(max_steps=1)
    with pytest.raises(ValueError, match="use_cuckoo"):
        eng.retire(eng.state.pages.select("url"))
