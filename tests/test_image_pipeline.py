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


def test_grid_feat_fixture_matches_operator():
    """The pinned grid-feature VALUES fixture used by the DuckDB oracle
    (fixtures/image_feats.py) must track the renderer + codec + feature
    function exactly — fixture == recompute, no drift."""
    from gocrawler_spark.fixtures import image_feats as IFX

    assert IFX.GRID_FEATS == IFX.regenerate()


def test_embedding_near_dups_are_exactly_the_bucketed_twins(spark):
    """Output pairs must be exactly the twin pairs (d-1, d) whose
    grid-feature vectors land in the same LSH bucket: twins score
    cosine >= 0.9998, every other pair <= 0.968, so the 0.99 threshold
    admits nothing else. Expected set recomputed here in pure numpy
    from the pinned fixture (an implementation independent of both the
    Spark query and the DuckDB oracle)."""
    import numpy as np

    from gocrawler_spark.fixtures.image_feats import GRID_FEATS
    from gocrawler_spark.queries.image_pipeline_q import (
        _IMG_COS_THRESHOLD_MICRO,
        _img_plane_weights,
    )

    X = np.array([r[1:] for r in GRID_FEATS], dtype=np.int64)
    W = _img_plane_weights()
    buckets = (((X @ W.T) > 0).astype(np.int64) << np.arange(8)).sum(axis=1)
    nrm = (X * X).sum(axis=1)
    expected = set()
    for d in range(1, 300, 5):
        if buckets[d] != buckets[d - 1]:
            continue
        cos = (X[d - 1] @ X[d]) / np.sqrt(
            nrm[d - 1].astype(np.float64) * nrm[d]
        )
        if round(cos * 1e6) >= _IMG_COS_THRESHOLD_MICRO:
            expected.add((d - 1, d))
    # the construction guarantees a healthy majority of the 60 twins
    # survive 8-plane bucketing (measured: 58)
    assert len(expected) >= 50
    out = QUERIES["image_embedding_near_dups"](spark, SF_DIR).collect()
    got = {(r.a_id, r.b_id) for r in out}
    assert got == expected
    assert all(r.cos_micro >= _IMG_COS_THRESHOLD_MICRO for r in out)
