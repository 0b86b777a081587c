"""Cluster-structure tests for the image+caption pipeline queries
(image_dedup_clusters is a rows-only driver check — its correctness
evidence lives here)."""

import os

from pyspark.sql import functions as F

from gocrawler_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_twins_cluster_with_their_originals(spark):
    """The synthetic image table renders doc_id % 5 == 1 with the
    previous doc's pixels (lossy) — every such twin must land in the
    same cluster as image doc_id - 1."""
    out = QUERIES["image_dedup_clusters"](spark, SF_DIR)
    cl = {r.image_id: r.cluster_id for r in out.collect()}
    twins = [d for d in range(1, 300, 5) if d > 0]
    missing = [d for d in twins if str(d) not in cl or str(d - 1) not in cl]
    assert not missing, f"twin/original absent from cluster output: {missing}"
    split = [d for d in twins if cl[str(d)] != cl[str(d - 1)]]
    assert not split, f"twins not clustered with originals: {split}"


def test_cluster_canonical_is_min_numeric_id(spark):
    out = QUERIES["image_dedup_clusters"](spark, SF_DIR).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        ids = sorted(int(r.image_id) for r in rows)
        assert int(cid) == ids[0], f"cluster_id {cid} != min member {ids[0]}"
        canon = [r for r in rows if r.is_canonical == 1]
        assert len(canon) == 1 and canon[0].image_id == cid
        for r in rows:
            assert r.cluster_size == len(rows)


def test_caption_groups_share_a_cluster(spark):
    """Every non-singleton exact-caption group (from the oracled
    image_caption_dedup) must be wholly inside one phash+caption
    cluster — the caption star edges guarantee it."""
    dedup = QUERIES["image_caption_dedup"](spark, SF_DIR)
    groups = (
        dedup.filter(F.col("group_size") > 1)
        .select("image_id", "canonical_id")
        .collect()
    )
    assert groups, "test data has no duplicate captions — twin docs expected"
    cl = {
        r.image_id: r.cluster_id
        for r in QUERIES["image_dedup_clusters"](spark, SF_DIR).collect()
    }
    for g in groups:
        assert cl[g.image_id] == cl[g.canonical_id], (
            f"caption group member {g.image_id} split from its "
            f"canonical {g.canonical_id}"
        )


def test_curation_filter_gate_order_and_selectivity(spark):
    """The keep/drop funnel must be internally consistent: keep=1 iff
    reason='ok', reason respects the fixed gate order (a too-small
    image is never reported as a later failure), and every gate is
    non-degenerate on the synthetic table."""
    from gocrawler_spark.queries.image_pipeline_q import (
        _ASPECT_DEN,
        _ASPECT_NUM,
        _MIN_SIDE,
        image_curation_filter,
    )

    rows = image_curation_filter(spark, SF_DIR).collect()
    reasons = {}
    for r in rows:
        assert (r["reason"] == "ok") == (r["keep"] == 1), r
        if min(r["w"], r["h"]) < _MIN_SIDE:
            assert r["reason"] == "too_small", r
        elif _ASPECT_DEN * max(r["w"], r["h"]) > _ASPECT_NUM * min(r["w"], r["h"]):
            assert r["reason"] == "aspect", r
        reasons[r["reason"]] = reasons.get(r["reason"], 0) + 1
    for want in ("too_small", "aspect", "caption_short", "phash_dup", "ok"):
        assert reasons.get(want, 0) > 0, (want, reasons)
