"""Unit tests for the training-pipeline queries (pipeline_q): the
connected-components operator on known topologies, and invariants of
the stratified sample / decontamination queries that the SQL oracle
can't state (determinism across partitionings, rate bounds).

Oracle value-equality for all three registered queries is covered by
the parametrized suite in test_queries_oracle.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.queries.pipeline_q import (
    _SAMPLE_RATE,
    connected_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _cc_dict(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }


def test_cc_transitive_chain(spark):
    # 1-2, 2-3, 3-4, 4-5: pairwise evidence never links 1 and 5
    # directly; the component must still be one cluster rooted at 1.
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_two_components_and_edge_order(spark):
    # two components, edges given in arbitrary order/orientation
    got = _cc_dict(spark, [(9, 7), (2, 1), (7, 8), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_cc_cycle_converges(spark):
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_repartitioned_input_same_result(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (4, 3)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    base = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    shuffled = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df.repartition(7)).collect()
    }
    assert base == shuffled == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_stratified_sample_rate_and_determinism(spark):
    from gocrawler_spark.queries import QUERIES

    q = QUERIES["sample_stratified"]
    a = q(spark, SF_DIR).collect()
    b = q(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    import math

    strata = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source", "lang")
        .count()
        .collect()
    )
    want = {
        (r["source"], r["lang"]): math.ceil(r["count"] * _SAMPLE_RATE)
        for r in strata
    }
    got: dict = {}
    for r in a:
        got[(r["source"], r["lang"])] = got.get((r["source"], r["lang"]), 0) + 1
    assert got == {k: v for k, v in want.items() if v > 0}


def test_decontaminate_flags_are_consistent(spark):
    from gocrawler_spark.queries import QUERIES

    rows = QUERIES["decontaminate_overlap"](spark, SF_DIR).collect()
    assert rows, "expected at least one training doc"
    for r in rows:
        assert r["contaminated"] == (1 if r["n_shared"] > 0 else 0)
    # the benchmark source must never appear in the output
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    assert bench_ids.isdisjoint({r["doc_id"] for r in rows})


def test_cc_hybrid_paths_identical(spark):
    """The single-task union-find path and the distributed min-label
    loop emit identical (doc_id, cluster_id) labels."""
    import random

    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
        )
        if a != b
    ] + [(i, i + 1) for i in range(20)]  # a 21-node chain (deep component)
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    uf = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()  # union-find path
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, local_max_edges=0).collect()
    }
    assert uf == dist and len(uf) > 0
