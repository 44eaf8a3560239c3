"""community_conductance (eval/compare.py) on hand-computable graphs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vite_spark.eval.compare import community_conductance


def _edges_df(spark, a, b, w=None):
    w = np.ones(len(a)) if w is None else np.asarray(w, dtype=float)
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a], "weight": np.r_[w, w],
    }))


def _labels_df(spark, mapping):
    return spark.createDataFrame(
        pd.DataFrame({"id": list(mapping), "label": [mapping[k] for k in mapping]}))


def test_conductance_barbell(spark):
    """Two triangles joined by one bridge edge, split at the bridge:
    each side has vol = 2·3 + 1 = 7 (6 triangle half-edges + bridge),
    cut = 1, 2m = 14 → φ = 1/7 for both communities."""
    a = np.array([0, 1, 2, 3, 4, 5, 2], dtype=np.int64)
    b = np.array([1, 2, 0, 4, 5, 3, 3], dtype=np.int64)
    edges = _edges_df(spark, a, b)
    labels = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    rows = {r["label"]: r for r in
            community_conductance(edges, labels).collect()}
    assert set(rows) == {0, 1}
    for lab in (0, 1):
        assert rows[lab]["vol"] == 7.0
        assert rows[lab]["cut"] == 1.0
        assert math.isclose(rows[lab]["conductance"], 1 / 7, abs_tol=1e-6)


def test_conductance_whole_graph_and_selfloops(spark):
    """Single community → min(vol, 2m−vol) = 0 → φ = 0.0 by convention;
    self-loops count in vol, never in cut."""
    a = np.array([0, 1, 0], dtype=np.int64)
    b = np.array([1, 2, 0], dtype=np.int64)   # path + self-loop at 0
    edges = _edges_df(spark, a, b, w=[1.0, 1.0, 5.0])
    one = _labels_df(spark, {0: 9, 1: 9, 2: 9})
    r = community_conductance(edges, one).collect()
    assert len(r) == 1
    assert r[0]["label"] == 9
    assert r[0]["vol"] == 14.0          # 2·(1+1) + 2·5 self-loop rows
    assert (r[0]["cut"], r[0]["conductance"]) == (0.0, 0.0)

    # split {0} | {1,2}: vol(0) = 2 self rows (10) + 1 = 11; cut = 1;
    # 2m = 14 → min(11, 3) = 3 on the other side: φ(0) = 1/3
    two = _labels_df(spark, {0: 0, 1: 1, 2: 1})
    rows = {r["label"]: r for r in
            community_conductance(edges, two).collect()}
    assert rows[0]["vol"] == 11.0 and rows[0]["cut"] == 1.0
    assert math.isclose(rows[0]["conductance"], 1 / 3, abs_tol=1e-6)
    assert rows[1]["vol"] == 3.0 and rows[1]["cut"] == 1.0
    assert math.isclose(rows[1]["conductance"], 1 / 3, abs_tol=1e-6)
