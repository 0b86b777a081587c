"""Regenerate the pinned JPEG roundtrip fixture (no Spark).

Run from the repo root:  python scripts/regen_jpeg_fixtures.py

Prints the ROUNDTRIP list for gocrawler_spark/fixtures/jpeg_roundtrip.py
and diffs it against the committed values; tests/test_jpeg_codec.py
asserts the committed fixture equals a fresh regenerate().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gocrawler_spark.fixtures import jpeg_roundtrip as JR


def main() -> None:
    fresh = JR.regenerate()
    if fresh == JR.ROUNDTRIP:
        print(f"fixture fresh ({len(fresh)} rows)")
        return
    print("fixture STALE — new values:")
    for row in fresh:
        print(f"    {row},")
    sys.exit(1)


if __name__ == "__main__":
    main()
