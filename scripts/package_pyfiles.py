"""Package gocrawler_spark for spark-submit --py-files.

Produces dist/gocrawler_spark.zip containing the package (source +
fixtures), suitable for shipping to executors:

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> --py-files dist/gocrawler_spark.zip \
        scripts/run_crawl.py --steps 100 --output /path/out

Zip entries are written in sorted order with fixed timestamps so the
artifact is byte-reproducible for a given tree.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "gocrawler_spark")


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                continue
            p = os.path.join(root, f)
            entries.append((os.path.relpath(p, REPO), p))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, p in sorted(entries):
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(p, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "gocrawler_spark.zip"
    )
    print(build(out))
