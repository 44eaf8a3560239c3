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
