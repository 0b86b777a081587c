r"""Sitemap-driven frontier seeding.

The reference seeds its pool only from the YAML bootstrap list
(linkBootstraping, /root/reference/crawler.go:472-478). A web-scale
frontier also seeds from each host's own declared inventory: robots.txt
``Sitemap:`` lines → sitemapindex → urlset (functions/robots.py,
functions/sitemaps.py), which yields not just URLs but priority and
freshness hints. This operator turns that discovery chain into
candidate rows shaped exactly like ``candidate_links`` output, so
``merge_into_frontier`` ingests them unchanged (same dedup, same
Bloom split, same seq assignment) — sitemap seeding is a second
producer into the existing merge, not a second frontier.

Opt-in by design: the exact-parity engine path (plans/crawl.py) never
calls this — the reference has no sitemap behavior to match.

Scale shape: one task per host batch (mapInPandas over the DISTINCT
host frame — tiny relative to the frontier), each running the
robots → index → urlset chain through a pluggable ``fetch_fn`` (no
network in tests; an HTTP pool in production). The per-host sitemap
tree is bounded by ``max_sitemaps`` and the parser's 50k-entry cap, so
a task's memory is O(cap), independent of frontier size. Output feeds
the same merge the link extractor feeds.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawler_spark.config import CrawlConfig
from gocrawler_spark.functions import robots as RB
from gocrawler_spark.functions import sitemaps as SM
from gocrawler_spark.functions import urls as U

# fetch_fn(url) -> body text ('' / None for a miss)
FetchFn = Callable[[str], str | None]


def discover_from_hosts(
    hosts: DataFrame,
    fetch_fn: FetchFn,
    agent: str,
    max_sitemaps: int = 50,
) -> DataFrame:
    """Run the discovery chain for each host in ``hosts`` (one
    ``domain`` column, assumed distinct) and return one row per
    discovered URL:

    ``(url, domain, priority_milli, lastmod_ts, lambda_micro)``

    Chain per host: fetch ``https://{domain}/robots.txt``; take its
    ``Sitemap:`` URLs (falling back to the conventional
    ``/sitemap.xml``); BFS index files into urlsets, visiting at most
    ``max_sitemaps`` sitemap documents (hostile index loops and
    mega-trees are bounded; the number of sitemap docs cut is carried
    on EVERY emitted row of the host in ``n_truncated`` — no silent
    cap for any host that yields rows).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for domain in pdf["domain"]:
                domain = str(domain)
                robots_body = fetch_fn(f"https://{domain}/robots.txt") or ""
                rules = RB.parse_robots(robots_body, agent)
                queue = list(rules.sitemaps) or [
                    f"https://{domain}/sitemap.xml"
                ]
                seen: set[str] = set()
                visited = 0
                truncated = 0
                host_rows: list[tuple] = []
                while queue:
                    sm_url = queue.pop(0)
                    if sm_url in seen:
                        continue
                    seen.add(sm_url)
                    if visited >= max_sitemaps:
                        truncated += 1
                        continue
                    visited += 1
                    body = fetch_fn(sm_url)
                    if not body:
                        continue
                    parsed = SM.parse_sitemap(body)
                    if parsed.kind == "index":
                        queue.extend(e.loc for e in parsed.entries)
                    elif parsed.kind == "urlset":
                        for e in parsed.entries:
                            host_rows.append(
                                (
                                    e.loc,
                                    domain,
                                    round(e.priority * 1000),
                                    e.lastmod_ts,
                                    round(
                                        SM.changefreq_lambda(e.changefreq)
                                        * 1e6
                                    ),
                                )
                            )
                # the FINAL truncation count rides on every emitted
                # row (it is only known once the BFS ends; stamping
                # rows mid-walk would always read 0)
                rows.extend(r + (truncated,) for r in host_rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "domain",
                    "priority_milli",
                    "lastmod_ts",
                    "lambda_micro",
                    "n_truncated",
                ],
            )

    return hosts.select("domain").mapInPandas(
        gen,
        "url string, domain string, priority_milli long, "
        "lastmod_ts long, lambda_micro long, n_truncated long",
    )


def sitemap_candidates(
    discovered: DataFrame,
    cfg: CrawlConfig,
    avoid_custom_check: bool = True,
) -> DataFrame:
    """Shape discovered sitemap URLs as ``merge_into_frontier``
    candidates ``(url, domain, delta, first_at)`` — the exact schema
    ``candidate_links`` emits, so the merge (dedup, Bloom split, seq
    assignment) ingests them unchanged.

    - validation: the same F2/F3 gate as crawled links
      (``link_seems_ok``); host-declared seeds skip the topical
      custom check by default, like the YAML bootstrap seeds do;
    - ordering: ``first_at.parent_seq`` is a per-host synthetic parent
      (xxhash64 of the domain) and ``first_at.pos`` ranks the host's
      URLs by (priority desc, lastmod desc, url) — so ``_assign_seq``'s
      two-level rank stays fully parallel (window partitioned per
      host, offset table one-row-per-host) and a host's best-declared
      URLs enqueue first;
    - ``delta`` = 1 per declared URL (a sitemap is one vote, however
      many files repeat the URL — duplicates are collapsed first,
      keeping the best priority/freshness).
    """
    from pyspark.sql import Window

    ok = discovered.filter(
        U.link_seems_ok(
            F.col("url"), cfg, avoid_custom_check=avoid_custom_check
        )
    )
    firsts = ok.groupBy("url").agg(
        # min, not first: two hosts' sitemaps can declare the same URL
        # (www/apex mirrors) and first() is partition-order-dependent —
        # the synthetic parent (hash of the declaring host) must be
        # deterministic
        F.min("domain").alias("decl_host"),
        F.max("priority_milli").alias("priority_milli"),
        F.max("lastmod_ts").alias("lastmod_ts"),
    ).withColumn(
        # frontier invariant: url DETERMINES domain (candidate_links
        # emits domain_of(url); the bucketed merge joins on
        # (domain, url) relying on it). A sitemap may declare URLs on
        # ANOTHER host (cross-host submission, subdomains) — keying
        # the frontier row on the declaring host would duplicate the
        # row when the same url later arrives through links, and
        # charge politeness to the wrong host. The declaring host
        # keeps its role only as the deterministic parent-seq seed.
        "domain", U.domain_of(F.col("url"))
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("priority_milli").desc(),
        F.col("lastmod_ts").desc_nulls_last(),
        F.col("url"),
    )
    return firsts.select(
        "url",
        "domain",
        F.lit(1).cast("long").alias("delta"),
        F.struct(
            F.xxhash64("decl_host").alias("parent_seq"),
            F.row_number().over(w).alias("pos"),
        ).alias("first_at"),
    )
