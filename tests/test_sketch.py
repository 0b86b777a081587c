"""CMS heavy-hitter properties: one-sided error and deterministic order."""

from gocrawler_spark.queries.sketch_q import cms_heavy_hitters
from tests.conftest import SF_DIR


def test_cms_overcount_one_sided_and_ordered(spark):
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 32
    # CMS never undercounts, and the emitted arithmetic is consistent
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["est_cms"] == r["exact_cnt"] + r["overcount"] for r in rows)
    # deterministic total order: exact_cnt desc, token desc on ties
    # (reverse=True of the ascending pair — NOT the negated-ord trick,
    # which misorders prefix pairs like 'a'/'aa')
    keys = [(r["exact_cnt"], r["token"]) for r in rows]
    assert keys == sorted(keys, reverse=True)
