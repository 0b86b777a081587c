r"""Anchor-text aggregation under the driver's oracle gate.

The link graph's in-degree (host_inlink_stats) says HOW OFTEN a host
is linked; anchor text says WHAT the web calls it — the classic
ranking signal (anchor terms index the TARGET document). The reference
extracts hrefs only (collectlinks.All, crawler.go:219); this extends
the S2 parser with ``extract_anchors`` (functions/html.py) and
aggregates by target host.

Closed-form construction (same synthetic web as host_inlink_stats):
doc ``doc_id`` links host ``l{j}.example`` for j in [0, doc_id%7] with
anchor text ``host {j} link {doc_id}``. So per host j: one anchor per
linking doc; anchor char length = 12 + len(str(doc_id)) (j is a single
digit); the host's distinct anchor-token set is {"host", "link",
str(j)} ∪ {str(doc_id)...} = 2 + distinct doc count, because doc_id=j
always links host j (j%7 == j ≥ j) so str(j) is already a doc token.

Scale shape: parse is one mapInPandas pass, the two aggregates are
groupBy(host) with map-side combine over O(edges) rows — O(hosts)
output; the token-distinct agg rides the same host partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions import html as HT
from gocrawler_spark.functions import urls as U
from gocrawler_spark.queries import load, register
from gocrawler_spark.queries.html_q import _links_for
from gocrawler_spark.sources.synthetic_web import render_html


@register(
    "anchor_text_stats",
    """
WITH hosts AS (SELECT unnest(range(7)) AS j),
inl AS (
  SELECT h.j, d.doc_id
  FROM hosts h JOIN documents d ON d.doc_id % 7 >= h.j
)
SELECT 'l' || CAST(j AS VARCHAR) || '.example' AS host,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(sum(12 + length(CAST(doc_id AS VARCHAR))) AS BIGINT)
         AS sum_anchor_chars,
       CAST(2 + count(DISTINCT doc_id) AS BIGINT) AS n_distinct_tokens
FROM inl GROUP BY j
ORDER BY host
""",
)
def anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hrefs, texts = [], []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                links = _links_for(doc_id)
                markup = render_html(
                    r.text,
                    links,
                    title=f"doc {doc_id}",
                    anchor_texts=[
                        f"host {j} link {doc_id}"
                        for j in range(len(links))
                    ],
                )
                for href, text in HT.extract_anchors(markup):
                    hrefs.append(href)
                    texts.append(text)
            yield pd.DataFrame({"url": hrefs, "anchor_text": texts})

    anchors = docs.mapInPandas(gen, "url string, anchor_text string")
    # single pass over a single parse lineage: posexplode the tokens
    # and count the per-anchor facts on pos==0 rows only (two separate
    # aggregations would each re-run the full render+extract stage)
    ex = anchors.select(
        U.host_of(F.col("url")).alias("host"),
        F.length("anchor_text").alias("chars"),
        F.posexplode(F.split("anchor_text", " ")).alias("pos", "token"),
    )
    return (
        ex.groupBy("host")
        .agg(
            F.sum(F.when(F.col("pos") == 0, 1).otherwise(0)).alias(
                "n_anchors"
            ),
            F.sum(
                F.when(F.col("pos") == 0, F.col("chars")).otherwise(0)
            ).alias("sum_anchor_chars"),
            F.countDistinct("token").alias("n_distinct_tokens"),
        )
        .select(
            "host", "n_anchors", "sum_anchor_chars", "n_distinct_tokens"
        )
        .orderBy("host")
    )
