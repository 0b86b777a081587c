"""S11: external search-engine indexer sink.

The reference, when the (normally commented-out) ``addUrl`` config is
set, fires a fire-and-forget GET to ``addUrl + url.QueryEscape(url)``
for every doc that survives curation (crawler.go:1384-1396): errors are
printed, never fatal, and the crawl does not wait on the indexer.

Spark-first shape:

- request construction is a column expression (``url_encode`` is
  Java's form-encoding, the same alphabet/space->'+' rule as Go's
  ``url.QueryEscape``), so it rides whole-stage codegen;
- delivery is ``foreachPartition`` executor-side with a pluggable
  transport (this environment has no network by design; tests inject a
  recording transport). Per-URL failures are swallowed like the
  reference's logged-and-continue goroutine;
- the streaming twin wraps the same delivery in ``foreachBatch`` so an
  accepted-docs stream can feed the indexer incrementally.

Scale: no shuffle, no driver round-trip — each partition notifies its
own rows; a slow indexer throttles only the sink stage, not the crawl
(the engine calls this after the wave's state is already pinned).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def request_urls(accepted: DataFrame, add_url: str, url_col: str = "url") -> DataFrame:
    """(url) -> (url, request_url): addUrl + QueryEscape(url)
    (crawler.go:1385)."""
    return accepted.select(
        url_col,
        F.concat(F.lit(add_url), F.url_encode(F.col(url_col))).alias(
            "request_url"
        ),
    )


def notify_indexer(
    accepted: DataFrame,
    add_url: str,
    transport: Callable[[str], None],
    url_col: str = "url",
) -> None:
    """Deliver one GET per accepted URL, executor-side. No-op when
    add_url is empty (the reference's shipped default,
    crawler.yaml:26-27)."""
    if not add_url:
        return

    def _part(rows) -> None:
        for r in rows:
            try:
                transport(r["request_url"])
            except Exception:
                # reference: print and continue (crawler.go:1390-1394)
                pass

    request_urls(accepted, add_url, url_col).foreachPartition(_part)


def indexer_stream_sink(
    accepted_stream: DataFrame,
    add_url: str,
    transport: Callable[[str], None],
    checkpoint_dir: str,
    url_col: str = "url",
):
    """Streaming twin: foreachBatch delivery of each micro-batch's
    accepted URLs. At-least-once (an indexer add is idempotent server-
    side in the reference's design — it's an 'index this URL' hint)."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        notify_indexer(batch, add_url, transport, url_col)

    return (
        accepted_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
