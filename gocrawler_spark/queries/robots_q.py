r"""Robots-parser correctness under the driver's oracle gate.

Same pattern as html_q (the S2 parser gate): the robots.txt GRAMMAR
cannot be re-implemented in SQL, but a correct parse of a
deterministically rendered file has a closed-form verdict. Each host
``l{j}.example`` serves

    User-agent: otherbot
    Disallow: /

    User-agent: gocrawler
    Crawl-delay: {j+1}
    Disallow: /d{j}
    Allow: /d{j}{j}

and each document's URL path is ``/d{doc_id}/p{j}`` with
``j = doc_id % 7`` (the same synthetic web as host_inlink_stats). A
correct RFC 9309 parse must (a) select ONLY the gocrawler group —
merging otherbot's ``Disallow: /`` would disallow everything; (b)
apply longest-match precedence — the 4-char ``Allow: /d{jj}`` beats
the 3-char ``Disallow: /d{j}``; (c) surface Crawl-delay for the
politeness token budget. So per host: crawl_delay_ms = (j+1)·1000 and
disallowed(doc) ⇔ str(doc_id) starts with str(j) AND NOT with
str(j)||str(j) — which is what the oracle states.

Scale shape: one parse per (host, agent) memoized inside the batch
(the robots cache row, operators/politeness.py), verdicts are a
per-row column expression; the aggregate is O(hosts).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions import robots as RB
from gocrawler_spark.queries import load, register

AGENT = "gocrawler"


def synthetic_robots_txt(j: int) -> str:
    return (
        f"# synthetic robots for l{j}.example\n"
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "\n"
        f"User-agent: {AGENT}\n"
        f"Crawl-delay: {j + 1}\n"
        f"Disallow: /d{j}\n"
        f"Allow: /d{j}{j}\n"
    )


@register(
    "robots_parse_verdicts",
    """
WITH checks AS (
  SELECT doc_id, doc_id % 7 AS j,
         CAST(doc_id AS VARCHAR) AS ds,
         CAST(doc_id % 7 AS VARCHAR) AS js
  FROM documents
)
SELECT 'l' || js || '.example' AS host,
       CAST((j + 1) * 1000 AS BIGINT) AS crawl_delay_ms,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN starts_with(ds, js)
                      AND NOT starts_with(ds, js || js)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_disallowed
FROM checks
GROUP BY js, j
ORDER BY host
""",
)
def robots_parse_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed: dict[int, RB.RobotsRules] = {}
        for pdf in batches:
            hosts, delays, dis = [], [], []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                j = doc_id % 7
                rules = parsed.get(j)
                if rules is None:
                    rules = parse_cached = RB.parse_robots(
                        synthetic_robots_txt(j), AGENT
                    )
                    parsed[j] = parse_cached
                hosts.append(f"l{j}.example")
                delays.append(rules.crawl_delay_ms)
                dis.append(
                    0 if RB.is_allowed(rules, f"/d{doc_id}/p{j}") else 1
                )
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "crawl_delay_ms": delays,
                    "disallowed": dis,
                }
            )

    verdicts = docs.mapInPandas(
        gen, "host string, crawl_delay_ms long, disallowed long"
    )
    return (
        verdicts.groupBy("host")
        .agg(
            F.max("crawl_delay_ms").alias("crawl_delay_ms"),
            F.count(F.lit(1)).alias("n_urls"),
            F.sum("disallowed").alias("n_disallowed"),
        )
        .select("host", "crawl_delay_ms", "n_urls", "n_disallowed")
        .orderBy("host")
    )
