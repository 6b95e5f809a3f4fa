#!/usr/bin/env python
"""Build dist/record_matcher_spark.zip for ``spark-submit --py-files``.

The archive contains the pure-Python package only (no tests, no caches),
with fixed timestamps so rebuilding an unchanged tree is byte-identical —
convenient for content-addressed artifact stores on a real cluster.

Usage:
    python scripts/build_pyfiles.py [out_dir]
then:
    spark-submit --py-files dist/record_matcher_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "record_matcher_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PACKAGE}.zip")
    src = os.path.join(REPO, PACKAGE)
    entries = []
    for root, dirs, files in os.walk(src):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                path = os.path.join(root, f)
                entries.append((path, os.path.relpath(path, REPO)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for path, arcname in entries:
            with open(path, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
