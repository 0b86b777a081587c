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
