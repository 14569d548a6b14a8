#!/usr/bin/env python
"""Build the spark-submit --py-files artifact.

Zips the ``cdx_writer_spark`` package into ``dist/cdx_writer_spark.zip``
(or ``$1`` if given).  The archive is DETERMINISTIC — entries are
sorted and timestamps fixed — so rebuilding an unchanged tree yields a
byte-identical artifact (reproducible ship, content-addressable
caching on the cluster side).

Usage::

    python scripts/package.py [out.zip]
    spark-submit --py-files dist/cdx_writer_spark.zip jobs/cdx_job.py ...

``tests/test_jobs_cli.py`` imports the built zip from a clean
interpreter and drives ``jobs/cdx_job.py`` through spark-submit with
it, so the ship path stays tested.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cdx_writer_spark"
# fixed DOS timestamp (2020-01-01) -> reproducible archive bytes
_STAMP = (2020, 1, 1, 0, 0, 0)


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                exist_ok=True)
    names = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                names.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(names):
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), _STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "cdx_writer_spark.zip")
    print(build(out))
