"""Bucketed image-payload store: payload-local enrichment joins.

The scale problem: at 100 TB the payload column dominates the table —
any plan that shuffles ``bytes`` to join scores/captions/validation
flags back onto images moves the whole corpus over the network. The
fix is the same one the frontier uses (plans/bucketed.py): store the
payload table AND every enrichment table bucketed by ``image_id`` with
matching bucket counts, so enrichment joins are sort-merge joins of
two in-place scans — ZERO Exchange on either side, asserted in
tests/test_image_store.py. Payload bytes never leave the executor
that scanned them.

This is the Parquet stand-in for the north rule's Iceberg image +
caption table: bucketed managed tables give the same co-partitioned
storage contract (Iceberg: ``bucket(N, image_id)`` partition transform
+ storage-partitioned joins); the writer API below maps 1:1.

Scoring pipelines compose: write payloads once, derive any number of
enrichment tables (inference scores, sharpness, validation) by
scanning payloads in place, write each bucketed the same way, then
join any subset payload-locally.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from gocrawler_spark.plans.bucketed import set_confs


class ImageStore:
    """Payload + enrichment tables, all bucketed by image_id."""

    def __init__(
        self, spark: SparkSession, name: str = "image_store", n_buckets: int = 16
    ):
        set_confs(spark)
        self.spark = spark
        self.name = name
        self.n_buckets = n_buckets

    def _table(self, kind: str) -> str:
        return f"{self.name}__{kind}"

    def _write(self, df: DataFrame, kind: str) -> DataFrame:
        t = self._table(kind)
        # a fresh session's catalog doesn't know about a previous
        # session's managed-table directory — drop the entry AND clear
        # a stale location, or saveAsTable raises LOCATION_ALREADY_EXISTS
        self.spark.sql(f"DROP TABLE IF EXISTS {t}")
        wh = self.spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[5:]
        loc = os.path.join(wh, t.lower())
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
        (
            df.repartition(self.n_buckets, "image_id")
            .write.mode("overwrite")
            .bucketBy(self.n_buckets, "image_id")
            .sortBy("image_id")
            .saveAsTable(t)
        )
        return self.table(kind)

    def write_payloads(self, images: DataFrame) -> DataFrame:
        """One shuffle of the payloads — at ingest time, once; every
        enrichment join afterwards is shuffle-free."""
        return self._write(images, "payloads")

    def write_enrichment(self, df: DataFrame, kind: str) -> DataFrame:
        """``df`` must carry ``image_id``; written bucket-aligned with
        the payload table. An enrichment derived by scanning
        ``payloads()`` is already bucket-partitioned on image_id, so
        this write's repartition is a no-op Exchange at worst."""
        return self._write(df, kind)

    def table(self, kind: str) -> DataFrame:
        return self.spark.table(self._table(kind))

    def payloads(self) -> DataFrame:
        return self.table("payloads")

    def enrich(self, *kinds: str) -> DataFrame:
        """payloads ⋈ enrichment(s) on image_id: sort-merge joins of
        co-bucketed, co-sorted in-place scans — no Exchange, no Sort,
        payload bytes stay put."""
        out = self.payloads()
        for kind in kinds:
            out = out.join(self.table(kind), "image_id")
        return out
