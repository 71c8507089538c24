"""North-rule launch path: the engine runs via ``spark-submit
--py-files <package zip>`` (subprocess, fresh JVM — the exact cluster
submission shape, scaled to local master)."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_flagship():
    import gdal_drivers_spark as g

    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[8]",
            "--py-files", g.package_zip(),
            os.path.join(REPO, "scripts", "submit_job.py"),
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows"] == 8
    assert res["regions"] == [f"r{i}" for i in range(8)]
