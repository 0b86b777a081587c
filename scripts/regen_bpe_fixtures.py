"""Regenerate the pinned `bpe_token_stats` oracle fixtures.

Runs the NAIVE reference BPE (gocrawler_spark/oracle/bpe_naive.py —
algorithmically independent of the engine's incremental implementation
in operators/bpe.py) over the sf0.001 and sf0.01 documents tables and
pins the per-doc stats as CSV. The oracle SQL in queries/text_q.py
selects the fixture matching the corpus at hand by sum(length(text))
(both SFs have 500 docs, so row count cannot discriminate).

    python scripts/regen_bpe_fixtures.py
"""

import csv
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gocrawler_spark.oracle.bpe_naive import naive_doc_stats, naive_train

N_MERGES = 200
MAX_TYPES = 20_000
FIXTURES = os.path.join(
    os.path.dirname(__file__), "..", "gocrawler_spark", "fixtures"
)


def regen(sf_dir: str, out_csv: str) -> None:
    rows = duckdb.sql(
        "SELECT doc_id, text, sum(length(text)) OVER () AS total "
        f"FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    doc_ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    merges = naive_train(texts, N_MERGES, MAX_TYPES)
    stats = naive_doc_stats(doc_ids, texts, merges)
    path = os.path.join(FIXTURES, out_csv)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "n_words", "n_bpe_tokens", "n_chars_in_words"])
        w.writerows(stats)
    print(f"{out_csv}: {len(stats)} rows, total_text_len={rows[0][2]}, "
          f"{len(merges)} merges")


if __name__ == "__main__":
    regen("/root/testdata/sf0.001", "bpe_stats_sf0001.csv")
    regen("/root/testdata/sf0.01", "bpe_stats_sf001.csv")
