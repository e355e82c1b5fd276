"""Build the spark-submit artifact: dist/texel_spark.zip.

Ship with:
    spark-submit --py-files dist/texel_spark.zip your_job.py
or the engine CLI:
    spark-submit --py-files dist/texel_spark.zip -m texel_spark.cli ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "texel_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "texel_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                # data resources ship with the code: the 14 OGC TMS grid
                # JSONs and the EPSG axis-order registry load relative to
                # __file__, which works from a zip on sys.path
                if not fn.endswith((".py", ".json")):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
