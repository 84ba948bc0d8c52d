"""End-to-end `spark-submit --py-files` deployment test (north rule): the
engine must run from the packaged zip alone, outside the repo directory."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = (shutil.which("spark-submit")
                or (os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
                    if os.environ.get("SPARK_HOME") else None)
                or ("/opt/spark/bin/spark-submit"
                    if os.path.exists("/opt/spark/bin/spark-submit") else None))


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not found")
def test_submit_with_pyfiles_zip(tmp_path):
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "sparkcheck.zip")
    assert os.path.exists(zip_path)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_smoke.py")],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert "SUBMIT_OK True 2 " in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not found")
def test_submit_incremental_loop(tmp_path, spark):
    """scripts/run_incremental.py via spark-submit --py-files: first call
    validates both snapshots, second call validates nothing new and
    reproduces the identical merged verdicts (resume from the stats store)."""
    import json

    from pyspark.sql import functions as F

    from sparkcheck.io import write_table
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
                   check=True, capture_output=True)
    table = str(tmp_path / "t")
    write_table(spark.range(0, 500).select(
        F.concat(F.lit("u"), F.col("id")).alias("user"),
        (F.col("id") % 101).cast("double").alias("v")), table,
        snapshot_id="s1")
    write_table(spark.range(500, 900).select(
        F.concat(F.lit("u"), F.col("id")).alias("user"),
        (F.col("id") % 101).cast("double").alias("v")), table,
        snapshot_id="s2", mode="append")
    suite_path = str(tmp_path / "suite.json")
    with open(suite_path, "w") as f:
        json.dump({"expectation_suite_name": "inc", "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "user"}},
            {"expectation_type": "expect_column_mean_to_be_between",
             "kwargs": {"column": "v", "min_value": 0, "max_value": 200}},
        ]}, f)
    store = str(tmp_path / "store")

    def run_once():
        proc = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files",
             os.path.join(REPO, "dist", "sparkcheck.zip"),
             os.path.join(REPO, "scripts", "run_incremental.py"),
             "--table", table, "--suite", suite_path, "--store", store],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
        out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        assert out, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
        assert proc.returncode == 0, proc.stdout[-1000:]
        return json.loads(out[-1])

    first = run_once()
    assert first["validated_now"] == ["s1", "s2"]
    assert first["suite_success"] is True
    second = run_once()
    assert second["validated_now"] == []
    assert second["verdicts"] == first["verdicts"]
