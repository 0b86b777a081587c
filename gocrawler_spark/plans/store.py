"""TableStore — Iceberg-style snapshot/manifest shim over parquet.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics". The sandbox has no Iceberg runtime jar, so this implements
the same contract on plain parquet (SURVEY.md §4: the shim):

- a **snapshot** = every state table written to
  ``{root}/{table}/wave={W}/`` (parquet, partition-dir per wave);
- the **manifest** (``manifest.json``) is the single commit point,
  written LAST via tmp-file + atomic ``os.replace``: a crash anywhere
  before the rename leaves the previous manifest (and therefore the
  previous consistent snapshot) in effect — orphan files from the
  aborted wave are ignored by construction because readers only load
  paths the manifest names;
- per-table lineage in the manifest: wave of origin, row count, and
  the parquet part-files with sizes (per-partition lineage), plus
  free-form engine metrics.

Resume = read manifest → load the named snapshot dirs → hand the
DataFrames back to a fresh CrawlEngine. Kill-and-resume equivalence
is tested in tests/test_resume.py (resumed run == uninterrupted run,
byte-exact state).

Reference analog: the gob file cache checkpoint (crawler.go:103-151)
and the every-50-docs dumps (crawler.go:1285-1345); this is their
table-native generalization.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------

    def _table_dir(self, name: str, wave: int) -> str:
        return os.path.join(self.root, name, f"wave={wave:06d}")

    def write_snapshot(
        self,
        wave: int,
        tables: dict[str, DataFrame],
        metrics: Optional[dict] = None,
    ) -> dict:
        """Write all state tables for `wave`, then commit the manifest
        atomically. Idempotent: re-running the same wave overwrites its
        directories and re-commits."""
        entries = {}
        for name, df in tables.items():
            if df is None:
                continue
            path = self._table_dir(name, wave)
            df.write.mode("overwrite").parquet(path)
            files = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            entries[name] = {
                "path": path,
                "wave": wave,
                "row_count": df.count(),
                "partitions": [
                    {"file": f, "bytes": os.path.getsize(os.path.join(path, f))}
                    for f in files
                ],
            }
        manifest = {
            "format_version": 1,
            "wave": wave,
            "tables": entries,
            "metrics": metrics or {},
        }
        tmp = os.path.join(self.root, f".{MANIFEST}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self.root, MANIFEST))  # commit point
        return manifest

    # ------------------------------------------------------------------

    def read_manifest(self) -> Optional[dict]:
        p = os.path.join(self.root, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def load_snapshot(self, spark: SparkSession) -> Optional[tuple[int, dict]]:
        """(wave, {table: DataFrame}) for the last committed snapshot,
        or None if no manifest exists."""
        m = self.read_manifest()
        if m is None:
            return None
        tables = {
            name: spark.read.parquet(entry["path"])
            for name, entry in m["tables"].items()
        }
        return m["wave"], tables
