"""Regenerate fixtures/stem_map_sf001.csv — the (token, stem) map for
the FULL analyzed vocabulary of the sf0.01 documents table.

The stemmed_corpus_top100 oracle can't stem in SQL (DuckDB's snowball
``stem()`` lives in the fts extension, unavailable offline), so its
DuckDB side joins the corpus frequency against this committed map.
The map itself is produced by ``stem_or_stop`` — the SAME function the
Spark path uses — so this fixture does NOT gate the stemming algorithm;
that gate is ``stem_spec_vocab``, whose expected column is typed from
the published Snowball spec page (independent ground truth). What the
map-join oracle gates is everything around the stemmer: tokenization,
stop filtering, the vocab-level re-aggregation, ordering, and the
driver's hash comparison. Coverage is asserted complete here: a token
missing from the map would silently vanish from the oracle's counts.

Run from the repo root:  python scripts/regen_stem_fixtures.py
"""

from __future__ import annotations

import csv
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gocrawler_spark.functions.stem import stem_or_stop  # noqa: E402
from gocrawler_spark.queries.crawler_q import STOP_RX, TOKS_SQL  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gocrawler_spark", "fixtures", "stem_map_sf001.csv",
)


def main() -> None:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    vocab = [
        r[0]
        for r in con.execute(
            f"""
            WITH an_toks AS (
              SELECT unnest({TOKS_SQL}) AS token
              FROM documents WHERE lang = 'en'
            )
            SELECT DISTINCT token FROM an_toks
            WHERE NOT regexp_matches(token, '{STOP_RX}')
            ORDER BY token
            """
        ).fetchall()
    ]
    assert vocab, "empty vocabulary — wrong sf dir?"
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["token", "stem"])
        for t in vocab:
            w.writerow([t, stem_or_stop(t)])
    print(f"wrote {len(vocab)} (token, stem) rows to {OUT}")


if __name__ == "__main__":
    main()
