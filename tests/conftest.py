import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    from gocrawler_spark.plans.bucketed import apply_confs

    # fresh warehouse per test session: the in-memory catalog forgets
    # managed tables across JVMs, and saveAsTable refuses to reuse a
    # leftover table directory it no longer knows about
    wh = tempfile.mkdtemp(prefix="spark_wh_")
    # bucketed-table CONFS are applied session-wide from the start —
    # the bucketed frontier / image store constructors set them anyway
    # (they only affect bucketed-table planning), and applying them
    # uniformly here removes the test-ORDER dependence of whichever
    # store-building test would otherwise mutate the shared session
    # first (bench.py's session applies them the same way)
    s = apply_confs(
        SparkSession.builder.master("local[4]")
        .appName("gocrawler-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.warehouse.dir", wh)
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


from contextlib import contextmanager  # noqa: E402


@contextmanager
def session_confs(s, overrides: dict):
    """Snapshot-and-restore runtime SQL confs around a module's tests.

    getOrCreate() reuses the session-wide SparkSession when one is
    alive and silently applies builder SQL confs onto it — so a module
    fixture that sets e.g. autoBroadcastJoinThreshold=-1 via builder
    configs leaks that conf into every later module (it broke
    test_plans' broadcast-shape assertions). Module fixtures must set
    runtime confs through this guard instead."""
    saved = {k: s.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        s.conf.set(k, v)
    try:
        yield s
    finally:
        for k, v in saved.items():
            if v is None:
                s.conf.unset(k)
            else:
                s.conf.set(k, v)
