"""Build the ``spark-submit --py-files`` artifact: a zip of the
``proj_spark`` package (code only — no tests, no data).

Deployment contract (north rule: "run via spark-submit --py-files on a
multi-executor cluster"):

  spark-submit --master <cluster> \
      --py-files dist/proj_spark.zip \
      tools/submit_flagship.py --n-images 100000000 --out result.json

The kernels, operators, planner, and Spark-side plumbing are pure code
and need nothing beyond the zip. Registry/grid *data* (EPSG SQL
extracts, NTv2/GTX/GeoTIFF grids, legacy init files) deploys separately
— ship a data directory via ``--archives data.tgz#pdata`` or a shared
filesystem and point ``PROJ_SPARK_DATA`` at it (the analogue of the
reference's PROJ_DATA search path, src/filemanager.cpp) through
``spark.executorEnv.PROJ_SPARK_DATA`` / ``spark.yarn.appMasterEnv``.

Usage: python tools/make_pyfiles_zip.py [out_zip]   (default dist/proj_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(ROOT, "proj_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(filenames):
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, f)
                # fixed timestamp => byte-identical zip for identical
                # sources (reproducible deploys; CI cache-friendly)
                info = zipfile.ZipInfo(
                    os.path.relpath(full, ROOT), date_time=(2020, 1, 1, 0, 0, 0)
                )
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                with open(full, "rb") as fh:
                    z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "dist", "proj_spark.zip")
    print(build(out))
