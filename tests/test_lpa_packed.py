"""Packed-CSR LPA (kernels/csr_lpa.py) vs the join path: exact label
equality on the integer-weight domain, dispatch gating (non-integer
weights, open inputs), and early-stop parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vite_spark import fixtures as fx
from vite_spark.algos.lpa import label_propagation
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _modes(m):
    return {r.get("mode") for r in m.rows if r.get("kind") == "lpa_superstep"}


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _rand_sym_edges(seed: int, nv: int = 600, ne: int = 2500):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(40 * nv, nv, replace=False))
    a = rng.integers(0, nv, ne)
    b = rng.integers(0, nv, ne)
    m = a != b
    a, b = ids[a[m]], ids[b[m]]
    # include some self-loops (excluded from voting) and multi-edges
    s = np.concatenate([a, b, ids[:20]])
    d = np.concatenate([b, a, ids[:20]])
    w = rng.integers(1, 6, len(s)).astype(np.float64)
    return pd.DataFrame({"src": s, "dst": d, "weight": w})


def test_packed_lpa_matches_join_exactly_karate(spark):
    s, d, w, nv = fx.karate()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    mp, mj = MetricsCollector(), MetricsCollector()
    got = _labels(label_propagation(spark, edges, max_iter=20, metrics=mp))
    assert _modes(mp) == {"csr_sharded_lpa"}
    ref = _labels(label_propagation(
        spark, edges, max_iter=20,
        cfg=EngineConfig(use_csr_kernel=False), metrics=mj))
    assert got == ref
    # identical per-iteration changed counts → identical stop iteration
    cp = [r["changed"] for r in mp.rows if r.get("kind") == "lpa_superstep"]
    cj = [r["changed"] for r in mj.rows if r.get("kind") == "lpa_superstep"]
    assert cp == cj


@pytest.mark.parametrize("seed", [5, 17])
def test_packed_lpa_matches_join_exactly_random(spark, seed):
    edges = spark.createDataFrame(_rand_sym_edges(seed)).persist()
    edges.count()
    mp = MetricsCollector()
    got = _labels(label_propagation(spark, edges, max_iter=10, metrics=mp))
    assert _modes(mp) == {"csr_sharded_lpa"}
    ref = _labels(label_propagation(
        spark, edges, max_iter=10, cfg=EngineConfig(use_csr_kernel=False)))
    assert got == ref
    edges.unpersist()


def test_packed_lpa_noninteger_weights_fall_back(spark):
    """Float-tied votes could resolve differently across summation
    orders — the dispatch routes non-integer weights to the join path."""
    pdf = _rand_sym_edges(9, nv=100, ne=400)
    pdf["weight"] = pdf["weight"] + 0.5
    edges = spark.createDataFrame(pdf)
    m = MetricsCollector()
    label_propagation(spark, edges, max_iter=5, metrics=m)
    assert "csr_sharded_lpa" not in _modes(m)


def test_packed_lpa_open_input_falls_back(spark):
    """A dst that is never a src (vertex set not closed) → join path."""
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1], "dst": [1, 2], "weight": [1.0, 1.0]}))
    m = MetricsCollector()
    got = _labels(label_propagation(spark, edges, max_iter=5, metrics=m))
    assert "csr_sharded_lpa" not in _modes(m)
    assert set(got) == {0, 1, 2}
