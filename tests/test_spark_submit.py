"""End-to-end ``spark-submit --py-files`` deployment evidence.

The north rule requires the engine to "run via spark-submit --py-files on
a multi-executor cluster". This test realizes that contract on the one
box available: build dist-style ``proj_spark.zip`` (code only), then
``spark-submit --master local[4] --py-files proj_spark.zip
tools/submit_flagship.py`` from a scratch cwd with no repo checkout on
sys.path — so ``proj_spark`` importability, the kernel chain, the fused
spatial join, and the PROJ_SPARK_DATA registry-data env path (PROJ_DATA
analogue) are all proven through the deployment surface, not the test
harness's sys.path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")


def test_pyfiles_zip_is_code_only_and_reproducible(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import make_pyfiles_zip

    z1 = make_pyfiles_zip.build(str(tmp_path / "a.zip"))
    z2 = make_pyfiles_zip.build(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = zipfile.ZipFile(z1).namelist()
    assert "proj_spark/__init__.py" in names
    assert all(n.startswith("proj_spark/") for n in names)
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)
    # data stays out of the code artifact (ships via PROJ_SPARK_DATA)
    assert not any(n.endswith((".sql", ".gsb", ".gtx", ".tif")) for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_pyfiles_flagship(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import make_pyfiles_zip

    zip_path = make_pyfiles_zip.build(str(tmp_path / "proj_spark.zip"))
    out_path = tmp_path / "result.json"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PROJ_SPARK_DATA"] = os.path.join(ROOT, "tests", "fixtures")
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=4g",
        "--py-files", zip_path,
        os.path.join(ROOT, "tools", "submit_flagship.py"),
        "--n-images", "20000",
        "--epsg-check",
        "--out", str(out_path),
    ]
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-4000:]
    res = json.loads(out_path.read_text())
    assert res["n_images"] == 20000
    assert res["matched_rows"] > 0
    assert set(res["schema"]) >= {"image_id", "caption", "polygon_id"}
    # proj_spark came from the zip, not a checkout
    assert "proj_spark.zip" in res["proj_spark_origin"]
    # ETRS89 -> UTM32N via the EPSG registry loaded through
    # PROJ_SPARK_DATA; anchor from the engine's gie-green tmerc kernel
    e, n = res["epsg_25832_e_n"]
    assert abs(e - 691875.632) < 0.01 and abs(n - 6098907.825) < 0.01
