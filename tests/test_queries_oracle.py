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
        # binary payload decode / perceptual hashing / feature extraction
        # — not SQL-expressible; covered by round-trip unit tests
        # (tests/test_images.py, tests/test_media.py) + driver rows-only
        "image_validate_summary",
        "image_resize_summary",
        "audio_features_summary",
        # iterative BPE merge training is not SQL-expressible; covered
        # by tests/test_bpe.py (hand-checked merges + python oracle)
        "bpe_token_stats",
        "video_frame_sample_motion",
    }
    assert missing == allowed_missing
