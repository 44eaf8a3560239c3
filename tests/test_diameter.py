"""Double-sweep diameter (algos/bfs.py double_sweep_diameter): exact on
trees, a valid lower bound elsewhere."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vite_spark.algos.bfs import double_sweep_diameter


def _edges_df(spark, a, b):
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def test_double_sweep_exact_on_tree(spark):
    """Caterpillar tree: path 0-1-2-3-4-5 with leaves 10,11 hanging off
    vertex 2. Diameter = 5 (10..5); the first sweep from 0 pivots to a
    farthest vertex, the second realizes the true diameter (trees)."""
    a = [0, 1, 2, 3, 4, 2, 2]
    b = [1, 2, 3, 4, 5, 10, 11]
    row = double_sweep_diameter(spark, _edges_df(spark, a, b)).collect()[0]
    assert row["u0"] == 0
    assert row["ecc0"] == 5          # 0→5
    assert row["u1"] == 5            # max dist 5, min id among {5}
    assert row["diameter_lb"] == 5   # exact on trees


def test_double_sweep_cycle_lower_bound(spark):
    """C6: true diameter 3; both sweeps realize 3 (antipodal)."""
    n = 6
    a = list(range(n))
    b = [(i + 1) % n for i in range(n)]
    row = double_sweep_diameter(spark, _edges_df(spark, a, b)).collect()[0]
    assert row["u0"] == 0 and row["u1"] == 3
    assert row["ecc0"] == 3 and row["diameter_lb"] == 3
