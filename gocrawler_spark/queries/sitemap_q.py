r"""Sitemap discovery-chain correctness under the driver's oracle gate.

Same closed-form-verdict pattern as robots_q / html_q: the sitemaps.org
XML grammar can't be re-implemented in SQL, but a correct parse of a
deterministically rendered sitemap tree has a closed-form per-URL
verdict. Each host ``l{j}.example`` (j = doc_id % 7, the same synthetic
web as host_inlink_stats / robots_parse_verdicts) serves:

- ``robots.txt`` with a non-group ``Sitemap:`` line pointing at
  ``/sitemap-index.xml`` (parsed by functions/robots.py — the chain
  starts there, not at a hardcoded URL);
- a ``<sitemapindex>`` with exactly two child urlsets;
- child ``c`` listing ``https://l{j}.example/d{doc_id}`` for the
  host's docs with ``(doc_id // 7) % 2 == c``, each with
  ``lastmod = 2026-01-01T00:00:00Z + (doc_id % 28) days``,
  ``changefreq = [daily, weekly, monthly][doc_id % 3]``,
  ``priority = ((doc_id % 10) + 1) / 10``.

A correct chain must (a) find the index URL in robots.txt, (b) parse
the index to exactly the two children, (c) parse every urlset entry's
loc/lastmod/changefreq/priority, (d) map changefreq through the λ/day
table feeding recrawl_priority (queries/freshness_q.py). The oracle
states the resulting per-host aggregate directly over ``documents``.

Scale shape: one shuffle — groupBy(host) with applyInPandas, exactly
the real fetch layout (one robots + one sitemap tree fetched and
parsed per host, per-URL rows emitted Arrow-batched); the final
aggregate is O(hosts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawler_spark.functions import robots as RB
from gocrawler_spark.functions import sitemaps as SM
from gocrawler_spark.queries import load, register

AGENT = "gocrawler"
_EPOCH_20260101 = 1767225600  # 2026-01-01T00:00:00Z


def render_host_web(j: int, doc_ids: list[int]) -> dict[str, str]:
    """The synthetic host's served files, keyed by URL."""
    base = f"https://l{j}.example"
    robots_txt = (
        f"User-agent: {AGENT}\n"
        "Disallow: /private\n"
        "\n"
        f"Sitemap: {base}/sitemap-index.xml\n"
    )
    files = {f"{base}/robots.txt": robots_txt}
    index_items = []
    for c in (0, 1):
        child_url = f"{base}/sitemap-{c}.xml"
        index_items.append(
            f"  <sitemap><loc>{child_url}</loc>"
            f"<lastmod>2026-01-0{c + 1}</lastmod></sitemap>"
        )
        urls = []
        for doc_id in doc_ids:
            if (doc_id // 7) % 2 != c:
                continue
            day = doc_id % 28
            cf = ("daily", "weekly", "monthly")[doc_id % 3]
            pr = ((doc_id % 10) + 1) / 10
            urls.append(
                "  <url>"
                f"<loc>{base}/d{doc_id}</loc>"
                f"<lastmod>2026-01-{day + 1:02d}T00:00:00Z</lastmod>"
                f"<changefreq>{cf}</changefreq>"
                f"<priority>{pr:.1f}</priority>"
                "</url>"
            )
        files[child_url] = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(urls)
            + "\n</urlset>\n"
        )
    files[f"{base}/sitemap-index.xml"] = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(index_items)
        + "\n</sitemapindex>\n"
    )
    return files


def discover_seed_rows(j: int, doc_ids: list[int]) -> pd.DataFrame:
    """Run the real discovery chain over the rendered host and emit one
    row per discovered URL."""
    files = render_host_web(j, doc_ids)
    base = f"https://l{j}.example"
    rules = RB.parse_robots(files[f"{base}/robots.txt"], AGENT)
    rows: list[tuple[str, int, str | None, int | None, int, int]] = []
    for sm_url in rules.sitemaps:
        idx = SM.parse_sitemap(files.get(sm_url, ""))
        children = (
            [e.loc for e in idx.entries] if idx.kind == "index" else []
        )
        n_children = len(children)
        for child_url in children:
            child = SM.parse_sitemap(files.get(child_url, ""))
            if child.kind != "urlset":
                continue
            for e in child.entries:
                rows.append(
                    (
                        f"l{j}.example",
                        n_children,
                        e.changefreq,
                        e.lastmod_ts,
                        round(e.priority * 1000),
                        round(SM.changefreq_lambda(e.changefreq) * 1e6),
                    )
                )
    return pd.DataFrame(
        rows,
        columns=[
            "host",
            "n_children",
            "changefreq",
            "lastmod_ts",
            "priority_milli",
            "lambda_micro",
        ],
    )


@register(
    "sitemap_seed_stats",
    f"""
WITH d AS (SELECT doc_id, doc_id % 7 AS j FROM documents)
SELECT 'l' || CAST(j AS VARCHAR) || '.example' AS host,
       CAST(2 AS BIGINT) AS n_children,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST({_EPOCH_20260101} + max(doc_id % 28) * 86400 AS BIGINT)
         AS max_lastmod_ts,
       CAST(sum(((doc_id % 10) + 1) * 100) AS BIGINT)
         AS sum_priority_milli,
       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_daily,
       CAST(sum(CASE doc_id % 3 WHEN 0 THEN 1000000
                                WHEN 1 THEN 142857
                                ELSE 33333 END) AS BIGINT)
         AS sum_lambda_micro
FROM d GROUP BY j ORDER BY host
""",
)
def sitemap_seed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 7).alias("j")
    )

    def per_host(pdf: pd.DataFrame) -> pd.DataFrame:
        j = int(pdf["j"].iloc[0])
        return discover_seed_rows(j, [int(x) for x in pdf["doc_id"]])

    seeds = docs.groupBy("j").applyInPandas(
        per_host,
        "host string, n_children long, changefreq string, "
        "lastmod_ts long, priority_milli long, lambda_micro long",
    )
    return (
        seeds.groupBy("host")
        .agg(
            F.max("n_children").alias("n_children"),
            F.count(F.lit(1)).alias("n_urls"),
            F.max("lastmod_ts").alias("max_lastmod_ts"),
            F.sum("priority_milli").alias("sum_priority_milli"),
            F.sum(
                F.when(F.col("changefreq") == "daily", 1).otherwise(0)
            ).alias("n_daily"),
            F.sum("lambda_micro").alias("sum_lambda_micro"),
        )
        .select(
            "host",
            "n_children",
            "n_urls",
            "max_lastmod_ts",
            "sum_priority_milli",
            "n_daily",
            "sum_lambda_micro",
        )
        .orderBy("host")
    )
