"""Bucketed image store: zero-Exchange enrichment joins + equality."""

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators import inference as INF
from gocrawler_spark.plans.image_store import ImageStore
from gocrawler_spark.sources import synthetic_images as SI


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    from gocrawler_spark.plans.bucketed import CONFS
    from tests.conftest import session_confs

    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", wh)
        .getOrCreate()
    )
    overrides = dict(CONFS)
    overrides.update(
        {
            "spark.sql.shuffle.partitions": "8",
            # emulate the 100 TB case: enrichment tables too big to
            # broadcast, so the join must use the co-bucketed SMJ path
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
    )
    with session_confs(s, overrides):
        yield s


def _images(spark, n=40):
    rows = []
    for d in range(n):
        w, h = 16 + d % 9, 16 + d % 7
        px = SI.render_pixels(str(d), w, h)
        rows.append((str(d), SI.encode_png(px), "png"))
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_enrich_join_has_no_exchange_and_matches_plain(spark):
    store = ImageStore(spark, name="t_imgstore", n_buckets=4)
    imgs = _images(spark)
    store.write_payloads(imgs)
    scores = INF.infer_batched(store.payloads(), batch_size=16)
    store.write_enrichment(scores, "scores")

    joined = store.enrich("scores")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the whole join subtree: two in-place bucketed scans, no shuffle
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    # result equality vs the plain (shuffling) join
    plain = imgs.join(
        INF.infer_batched(imgs, batch_size=16), "image_id"
    ).select("image_id", "score_milli")
    got = sorted((r["image_id"], r["score_milli"]) for r in joined.collect())
    want = sorted((r["image_id"], r["score_milli"]) for r in plain.collect())
    assert got == want


def test_multi_enrichment_join_stays_local(spark):
    """payloads ⋈ scores ⋈ meta: still zero Exchange with two
    enrichments joined payload-locally."""
    store = ImageStore(spark, name="t_imgstore2", n_buckets=4)
    imgs = _images(spark, 24)
    store.write_payloads(imgs)
    store.write_enrichment(
        INF.infer_batched(store.payloads(), batch_size=8), "scores"
    )
    store.write_enrichment(
        store.payloads().select("image_id", F.length("bytes").alias("nbytes")),
        "meta",
    )
    joined = store.enrich("scores", "meta")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = joined.select("image_id", "score_milli", "nbytes").collect()
    assert len(rows) == 24 and all(r["nbytes"] > 0 for r in rows)
