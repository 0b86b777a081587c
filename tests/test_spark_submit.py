"""Deployment path: package the engine as a --py-files zip and run the
crawl via spark-submit from a directory where the repo source is NOT
importable — the executors and driver must get the code from the zip.
This is the BASELINE.md launch contract (spark-submit --py-files) at
local[4]; on a real cluster only --master changes."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "gocrawler_spark.zip"))
    out = str(tmp_path / "out")
    # copy the entrypoint next to tmp so cwd has no gocrawler_spark/
    script = str(tmp_path / "run_crawl.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "run_crawl.py"), script)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script,
            "--steps", "3",
            "--output", out,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["waves"] == 3
    assert metrics["frontier_rows"] > 1
    assert os.path.exists(os.path.join(out, "frontier"))


def test_fixture_path_readable_from_pyfiles_zip(tmp_path):
    """Fixture files must be readable when the package is imported
    FROM THE ZIP (no repo checkout on the node): __file__-relative
    open() cannot reach inside an archive, which is why fixtures route
    through importlib.resources (gocrawler_spark/fixtures/__init__)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "gs.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from gocrawler_spark.fixtures import fixture_path; "
        "p = fixture_path('crawl_polite_w8.csv'); "
        "line = open(p).readline(); "
        "assert line.startswith('url'), line; "
        "print('OK', p)"
    ) % zip_path
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("OK ")
    # and the extracted path must NOT point inside the archive
    assert ".zip" + os.sep not in r.stdout.split("OK ", 1)[1]
