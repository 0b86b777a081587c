"""Lifecycle management for localCheckpoint pins.

The crawl engine truncates lineage between waves with
``localCheckpoint(eager=True)``. Spark never frees those blocks on its
own — the RDDs stay registered in the block manager for the lifetime of
the session, so a long crawl (or a benchmark loop) accumulates one
frontier-sized pin per wave until memory/disk fills (MEMORY_AND_DISK
spills, but 1e4 waves of spilled frontiers is still unbounded growth).

``PinSet.pin`` wraps ``localCheckpoint(eager=True)`` and records which
persistent-RDD ids the pin created. ``retain(live)`` frees every
tracked pin whose DataFrame is not in ``live`` — the engine calls it at
the end of each wave with the current state fields, so intermediate
pins and superseded state from earlier waves are released no matter
which branch the wave took. Freeing uses the JVM-side persistent-RDD
registry (the only public handle to a localCheckpoint's blocks). A
released pin that is read again fails loudly
(CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) rather than silently recomputing —
lifecycle bugs surface immediately.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    m = spark._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def _unpersist_ids(spark: SparkSession, ids: set[int]) -> None:
    m = spark._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        if int(k) in ids:
            m.get(k).unpersist(False)


class PinSet:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        # id(pinned_df) -> (strong ref keeping id() stable, rdd ids)
        self._tracked: dict[int, tuple[DataFrame, set[int]]] = {}

    def pin(self, df: DataFrame) -> DataFrame:
        before = _persistent_ids(self.spark)
        out = df.localCheckpoint(eager=True)
        self._tracked[id(out)] = (out, _persistent_ids(self.spark) - before)
        return out

    def retain(self, live: Iterable[DataFrame | None]) -> None:
        """Free every tracked pin not present (by identity) in `live`."""
        keep = {id(df) for df in live if df is not None}
        dead = [k for k in self._tracked if k not in keep]
        for k in dead:
            _, ids = self._tracked.pop(k)
            _unpersist_ids(self.spark, ids)

    def release_all(self) -> None:
        self.retain(())
