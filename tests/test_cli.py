"""CLI smoke (reference D3 flag surface, main.cpp:609-769)."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np

from vite_spark import fixtures as fx
from vite_spark.io.vite_binary import write_vite_binary


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "vite_spark.cli", *args],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_louvain_binary_input(tmp_path):
    s, d, w, nv = fx.karate()
    p = str(tmp_path / "karate.bin")
    write_vite_binary(p, s, d, w, nv)
    gt = str(tmp_path / "gt.txt")
    with open(gt, "w") as f:
        for i in range(nv):
            f.write(f"{i} {0 if i < 17 else 1}\n")
    res = _run(["-f", p, "--cores", "4", "-g", gt,
                "--output", str(tmp_path / "out")])
    assert 0.35 < res["final_q"] < 0.42
    assert res["levels"] >= 2
    assert "TEPS" in res and "MODS" in res
    assert res["compare"]["f1"] > 0.4
    lines = open(str(tmp_path / "out.communities")).read().splitlines()
    assert len(lines) == nv


def test_cli_generate_and_triangles(tmp_path):
    res = _run(["-n", "128", "--cores", "4", "--algo", "triangles"])
    assert res["triangles"] > 0


def test_cli_via_spark_submit_pyfiles(tmp_path):
    """The north-rule deployment shape: ship the package as a zip via
    ``spark-submit --py-files`` and run the same CLI from a 2-line driver
    script whose directory does NOT contain the package — so the import
    must resolve through the shipped zip, exactly as on a real cluster."""
    import os
    import shutil
    import zipfile
    from pathlib import Path

    import vite_spark

    pkg_dir = Path(vite_spark.__file__).parent
    zpath = tmp_path / "vite_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in pkg_dir.rglob("*.py"):
            z.write(f, Path("vite_spark") / f.relative_to(pkg_dir))
    driver = tmp_path / "run_vite.py"
    driver.write_text("from vite_spark.cli import main\nmain()\n")

    s, d, w, nv = fx.karate()
    binp = str(tmp_path / "karate.bin")
    write_vite_binary(binp, s, d, w, nv)

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", str(zpath),
         str(driver), "-f", binp, "--cores", "4"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),   # NOT the repo root: the zip must supply the pkg
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert 0.35 < res["final_q"] < 0.42
    assert res["levels"] >= 2
