"""S2 parser correctness under the driver's oracle gate.

The HTML parser (functions/html.py) cannot be re-implemented in SQL,
but its correctness can still be oracle-checked: render each document
into markup whose structure is a deterministic function of doc_id
(render_html is built to be inverted exactly by the parser), parse it
back, and emit per-doc flags + counts. The DuckDB oracle states what a
CORRECT parse must yield (round-trip flags true, link counts and href
byte totals from the closed-form construction); any parser defect
flips a flag or a count and fails the value hash.

Reference behavior being gated: collectlinks.All + html2text.FromString
(crawler.go:219,235).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gocrawler_spark.functions import html as HT
from gocrawler_spark.queries import load, register
from gocrawler_spark.sources.synthetic_web import render_html

# href = https://l{j}.example/d{doc_id}/p{j}, j in [0, doc_id%7]; with
# j a single digit its length is 23 + len(str(doc_id)).
_OUT_SCHEMA = (
    "doc_id long, round_trip_ok long, links_ok long, n_links long,"
    " sum_href_len long"
)


def _links_for(doc_id: int) -> list[str]:
    return [
        f"https://l{j}.example/d{doc_id}/p{j}" for j in range(doc_id % 7 + 1)
    ]


@register(
    "html_extract_stats",
    """
SELECT doc_id,
       CAST(1 AS BIGINT) AS round_trip_ok,
       CAST(1 AS BIGINT) AS links_ok,
       CAST(doc_id % 7 + 1 AS BIGINT) AS n_links,
       CAST((doc_id % 7 + 1) * (23 + length(CAST(doc_id AS VARCHAR)))
            AS BIGINT) AS sum_href_len
FROM documents
""",
)
def html_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "round_trip_ok", "links_ok", "n_links", "sum_href_len"
            )}
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                links = _links_for(doc_id)
                markup = render_html(r.text, links, title=f"doc {doc_id}")
                text, got_links = HT.parse_page(markup)
                out["doc_id"].append(doc_id)
                out["round_trip_ok"].append(
                    int(text == HT.normalize_ws(r.text))
                )
                out["links_ok"].append(int(got_links == links))
                out["n_links"].append(len(got_links))
                out["sum_href_len"].append(sum(len(x) for x in got_links))
            yield pd.DataFrame(out)

    return docs.mapInPandas(gen, _OUT_SCHEMA)


# ---------------------------------------------------------------------------
# Link-graph transpose: in-link aggregation by TARGET host. The crawl
# engine's F5/A4 in-degree is wave-local (who got linked this wave);
# a search/quality pipeline also needs the corpus-wide transpose —
# per-host in-link counts and anchor-URL volume — the input to host
# authority scores and crawl-budget allocation. The Spark side parses
# the real markup (S2 parser) and explodes the extracted links; the
# oracle states the closed-form in-link structure of the rendered web
# (host l{j}.example is linked by every doc with doc_id % 7 >= j, path
# '/d{doc_id}/p{j}' is 5 + len(doc_id) chars).
#
# Scale shape: parse is one mapInPandas pass, explode is a flatMap (no
# shuffle), the aggregate is one groupBy(host) with map-side combine —
# output is O(hosts), the classic high-fan-in reduction.
from pyspark.sql import functions as F

from gocrawler_spark.functions import urls as U


@register(
    "host_inlink_stats",
    """
WITH hosts AS (SELECT unnest(range(7)) AS j),
inl AS (
  SELECT h.j, d.doc_id
  FROM hosts h JOIN documents d ON d.doc_id % 7 >= h.j
)
SELECT 'l' || CAST(j AS VARCHAR) || '.example' AS host,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src_docs,
       CAST(sum(5 + length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS sum_path_len
FROM inl GROUP BY j
ORDER BY host
""",
)
def host_inlink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, links = [], []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                markup = render_html(
                    r.text, _links_for(doc_id), title=f"doc {doc_id}"
                )
                _, got_links = HT.parse_page(markup)
                for l in got_links:
                    doc_ids.append(doc_id)
                    links.append(l)
            yield pd.DataFrame({"doc_id": doc_ids, "url": links})

    edges = docs.mapInPandas(gen, "doc_id long, url string")
    with_host = edges.withColumn("host", U.host_of(F.col("url")))
    return (
        with_host.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct("doc_id").alias("n_src_docs"),
            F.sum(
                F.length("url") - F.length("host") - F.lit(8)
            ).alias("sum_path_len"),
        )
        .orderBy("host")
    )
