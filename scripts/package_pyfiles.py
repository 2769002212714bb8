#!/usr/bin/env python
"""Build dist/doccrawler_spark.zip for spark-submit --py-files.

Zips the pure-Python package (no data, no tests) so executors can
import doccrawler_spark.* — the only runtime deps are pyspark, pandas,
pyarrow and numpy, all standard on Spark clusters.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "doccrawler_spark")
OUT = os.path.join(REPO, "dist", "doccrawler_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    names = zipfile.ZipFile(OUT).namelist()
    print(f"wrote {OUT} ({len(names)} modules)")


if __name__ == "__main__":
    main()
