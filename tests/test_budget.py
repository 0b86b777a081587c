"""crawl_budget_allocation scale shape: distributed, one parse pass.

Round-2 verdict "What's wrong" #1: the query used to collect the
O(hosts) in-link aggregate and rebuild the robots dimension in a
driver dict. These tests pin the de-collected shape:

- the full-corpus HTML parse runs EXACTLY ONCE even though the pinned
  aggregate has three consumers (robots dim, 1-row total, join);
- the budget arithmetic itself runs distributed over a 100k-host
  dimension without any driver materialization;
- the query source carries no ``.collect(`` call at all.
"""

import ast
import inspect

import pandas as pd
from pyspark.sql import functions as F

from gocrawler_spark.queries import budget_q
from gocrawler_spark.queries.budget_q import (
    WAVE_FETCHES,
    WAVE_WINDOW_MS,
    allocate_budget,
    robots_delay_dim,
)

from conftest import SF_DIR


def test_no_driver_collect_in_source():
    tree = ast.parse(inspect.getsource(budget_q))
    calls = [
        node.func.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    ]
    assert "collect" not in calls
    assert "toPandas" not in calls


def test_one_parse_pass(spark):
    """The corpus parse feeding the in-link aggregate runs once.

    An accumulator counts parsed documents inside the mapInPandas
    batch; after fully evaluating the query (which consumes the pinned
    aggregate three ways) the count equals the corpus size exactly —
    a second parse pass would double it.
    """
    parsed = spark.sparkContext.accumulator(0)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    from gocrawler_spark.functions import html as HT
    from gocrawler_spark.functions import urls as U
    from gocrawler_spark.queries.html_q import _links_for
    from gocrawler_spark.sources.synthetic_web import render_html

    def edges(batches):
        for pdf in batches:
            urls = []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                markup = render_html(
                    r.text, _links_for(doc_id), title=f"doc {doc_id}"
                )
                _, got = HT.parse_page(markup)
                urls.extend(got)
                parsed.add(1)
            yield pd.DataFrame({"url": urls})

    inl = (
        docs.mapInPandas(edges, "url string")
        .groupBy(U.host_of(F.col("url")).alias("host"))
        .agg(F.count(F.lit(1)).alias("n_inlinks"))
        .localCheckpoint(eager=True)
    )
    out = allocate_budget(inl, robots_delay_dim(inl)).collect()
    assert len(out) == 7
    assert parsed.value == n_docs


def test_allocate_budget_distributed_at_100k_hosts(spark):
    """The arithmetic stage holds at a 100k-host dimension.

    Hosts follow the synthetic naming (l{j}.example) so the real
    robots parser runs per host executor-side; spot-check the closed
    form at two hosts and the global invariant sum(authority_alloc)
    <= WAVE_FETCHES (integer division never over-allocates).
    """
    n = 100_000
    inl = spark.range(n).select(
        F.concat(F.lit("l"), F.col("id"), F.lit(".example")).alias("host"),
        (F.col("id") % 97 + 1).alias("n_inlinks"),
    )
    robots = robots_delay_dim(inl)
    out = allocate_budget(inl, robots)
    total = sum(r["n_inlinks"] for r in inl.select("n_inlinks").collect())

    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("authority_alloc").alias("alloc_sum"),
    ).collect()[0]
    assert agg["n"] == n
    assert agg["alloc_sum"] <= WAVE_FETCHES

    spot = {
        r["host"]: r
        for r in out.where(
            F.col("host").isin("l0.example", "l9.example")
        ).collect()
    }
    assert spot["l0.example"]["crawl_delay_ms"] == 1000
    assert spot["l0.example"]["politeness_cap"] == WAVE_WINDOW_MS // 1000
    assert spot["l9.example"]["crawl_delay_ms"] == 10_000
    j9 = spot["l9.example"]
    assert j9["authority_alloc"] == (j9["n_inlinks"] * WAVE_FETCHES) // total
    assert j9["wave_budget"] == min(j9["politeness_cap"], j9["authority_alloc"])
