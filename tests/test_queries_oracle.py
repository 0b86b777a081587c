"""Run every registered query against its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

import os

import pytest

from gocrawler_spark.queries import ORACLES, QUERIES
from gocrawler_spark.queries.compare import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare(spark, SF_DIR, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_all_queries_have_oracles_or_are_documented():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may omit the oracle; keep the list explicit
    allowed_missing = {
        # iterative BPE merge training over the (scale-factor-dependent)
        # documents text is not SQL-expressible and not pinnable; covered
        # by tests/test_bpe.py (hand-checked merges + python oracle). The
        # decode-path queries all carry pinned-fixture oracles now
        # (fixtures/media_feats.py, fixtures/image_phash.py).
        "bpe_token_stats",
    }
    assert missing == allowed_missing
