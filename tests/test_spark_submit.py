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
