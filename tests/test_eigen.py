"""Eigenvector centrality (algos/centrality.py + kernels/csr_pr.py
mode="eigen") vs the join path and the NumPy power iteration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vite_spark.algos.centrality import eigenvector_centrality
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _rand_sym_edges(seed: int, nv: int = 400, ne: int = 2000):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, nv, ne)
    b = rng.integers(0, nv, ne)
    m = a != b
    a, b = a[m], b[m]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    w = rng.integers(1, 5, len(src)).astype(np.float64)
    return src, dst, w


def _numpy_power(src, dst, w, iters, weighted=True):
    ids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d, ww in zip(src, dst, w):
        A[idx[d], idx[s]] += ww if weighted else 1.0
    x = np.ones(len(ids))
    for _ in range(iters):
        x = A @ x
    return ids, x / x.sum()


@pytest.mark.parametrize("weighted", [True, False])
def test_eigen_kernel_and_join_match_numpy(spark, weighted):
    src, dst, w = _rand_sym_edges(5)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst, "weight": w})).persist()
    edges.count()
    ids, want = _numpy_power(src, dst, w, 10, weighted)

    mk = MetricsCollector()
    got = eigenvector_centrality(
        spark, edges, iters=10, weighted=weighted,
        metrics=mk).toPandas().sort_values("id")
    modes = {r.get("mode") for r in mk.rows
             if r.get("kind") == "eigen_superstep"}
    assert modes == {"csr_sharded_eigen"}   # the packed path actually ran
    assert np.array_equal(got["id"].to_numpy(), ids)
    assert np.allclose(got["score"], want, rtol=1e-9)

    ref = eigenvector_centrality(
        spark, edges, iters=10, weighted=weighted,
        cfg=EngineConfig(use_csr_kernel=False)).toPandas().sort_values("id")
    assert np.array_equal(ref["id"].to_numpy(), ids)
    assert np.allclose(ref["score"], want, rtol=1e-9)
    # both paths: same math, float accumulation order only
    assert np.allclose(got["score"], ref["score"], rtol=1e-12, atol=1e-18)
    edges.unpersist()


def test_eigen_open_graph_falls_back_to_join(spark):
    """A dst that never appears as src breaks the kernel's vertex-closed
    precondition → join path, which still scores it (sink gets inflow,
    contributes none)."""
    edges = spark.createDataFrame(pd.DataFrame({
        "src": [0, 1, 0], "dst": [1, 0, 99], "weight": [1.0, 1.0, 2.0]}))
    mk = MetricsCollector()
    got = {r["id"]: r["score"] for r in eigenvector_centrality(
        spark, edges, iters=4, metrics=mk).collect()}
    modes = {r.get("mode") for r in mk.rows
             if r.get("kind") == "eigen_superstep"}
    assert modes == {"join"}
    src = np.array([0, 1, 0]); dst = np.array([1, 0, 99])
    w = np.array([1.0, 1.0, 2.0])
    ids, want = _numpy_power(src, dst, w, 4)
    assert set(got) == set(ids.tolist())
    for v, s in zip(ids, want):
        assert got[v] == pytest.approx(s, rel=1e-12)


def _numpy_katz(src, dst, w, alpha, beta, iters, weighted=True):
    ids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d, ww in zip(src, dst, w):
        A[idx[d], idx[s]] += ww if weighted else 1.0
    x = np.full(len(ids), beta)
    for _ in range(iters):
        x = beta + alpha * (A @ x)
    return ids, x


@pytest.mark.parametrize("weighted", [True, False])
def test_katz_kernel_and_join_match_numpy(spark, weighted):
    from vite_spark.algos.centrality import katz_centrality

    src, dst, w = _rand_sym_edges(11)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst, "weight": w})).persist()
    edges.count()
    ids, want = _numpy_katz(src, dst, w, 0.03, 1.0, 10, weighted)

    mk = MetricsCollector()
    got = katz_centrality(
        spark, edges, alpha=0.03, beta=1.0, iters=10, weighted=weighted,
        metrics=mk).toPandas().sort_values("id")
    modes = {r.get("mode") for r in mk.rows
             if r.get("kind") == "katz_superstep"}
    assert modes == {"csr_sharded_katz"}    # the packed path actually ran
    assert np.array_equal(got["id"].to_numpy(), ids)
    assert np.allclose(got["score"], want, rtol=1e-9)

    ref = katz_centrality(
        spark, edges, alpha=0.03, beta=1.0, iters=10, weighted=weighted,
        cfg=EngineConfig(use_csr_kernel=False),
        metrics=(mj := MetricsCollector())).toPandas().sort_values("id")
    assert {r.get("mode") for r in mj.rows
            if r.get("kind") == "katz_superstep"} == {"join"}
    assert np.array_equal(ref["id"].to_numpy(), ids)
    assert np.allclose(ref["score"], want, rtol=1e-9)
