"""spark-submit --py-files packaging smoke (north-star deployment path).

Builds the library zip and runs the smoke job through REAL spark-submit in
a clean cwd (so the repo checkout can't leak onto sys.path): the package
must work purely from the shipped archive, on the driver and inside the
pandas-UDF Python workers.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_build_pyfiles_zip_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z1 = build_pyfiles.build(str(tmp_path / "a"))
    z2 = build_pyfiles.build(str(tmp_path / "b"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = zipfile.ZipFile(z1).namelist()
    assert "record_matcher_spark/__init__.py" in names
    assert "record_matcher_spark/operators/scoring.py" in names
    assert not any("__pycache__" in n or "tests/" in n for n in names)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_spark_submit_with_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = build_pyfiles.build(str(tmp_path))
    smoke = os.path.join(tmp_path, "submit_smoke.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_smoke.py"), smoke)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            smoke,
            "/root/testdata/sf0.001",
        ],
        cwd=str(tmp_path),  # away from the repo: only the zip provides the pkg
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["rows"] == 150
    assert out["statuses"].get("MATCHED", 0) >= 100


def test_version_agrees_with_pyproject():
    """__version__ and pyproject's version must not drift apart."""
    import re

    import record_matcher_spark as rms

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as f:
        m = re.search(r'^version\s*=\s*"([^"]+)"', f.read(), re.M)
    assert m, "pyproject.toml has no version"
    assert rms.__version__ == m.group(1)
