"""Personalized PageRank (algos/pagerank.py seeds=...) vs the join path
and the NumPy reference, including the dangling→seeds redistribution the
kernel path never sees (open graphs route to the join path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vite_spark.algos.pagerank import pagerank
from vite_spark.config import EngineConfig


def _rand_sym_edges(seed: int, nv: int = 300, ne: int = 1500):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, nv, ne)
    b = rng.integers(0, nv, ne)
    m = a != b
    a, b = a[m], b[m]
    return np.concatenate([a, b]), np.concatenate([b, a])


def _numpy_ppr(src, dst, seeds, iters, damping=0.85):
    ids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n)
    for s in src:
        outdeg[idx[s]] += 1
    sv = np.zeros(n)
    for s in seeds:
        sv[idx[s]] = 1.0 / len(seeds)
    x = sv.copy()
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in zip(src, dst):
            inflow[idx[d]] += x[idx[s]] / outdeg[idx[s]]
        dangling = x[outdeg == 0].sum()
        x = (1 - damping) * sv + damping * (inflow + dangling * sv)
    return ids, x


def test_ppr_kernel_and_join_match_numpy(spark):
    src, dst = _rand_sym_edges(7)
    edges = spark.createDataFrame(pd.DataFrame(
        {"src": src, "dst": dst, "weight": np.ones(len(src))})).persist()
    edges.count()
    seeds = [int(v) for v in np.unique(src)[:4]]
    ids, want = _numpy_ppr(src, dst, seeds, 10)

    got = pagerank(spark, edges, tol=0.0, max_iter=10,
                   seeds=seeds).toPandas().sort_values("id")
    ref = pagerank(spark, edges, tol=0.0, max_iter=10, seeds=seeds,
                   cfg=EngineConfig(use_csr_kernel=False),
                   ).toPandas().sort_values("id")
    assert np.array_equal(got["id"].to_numpy(), ids)
    assert np.allclose(got["rank"], want, rtol=1e-9)
    assert np.allclose(ref["rank"], want, rtol=1e-9)
    assert np.allclose(got["rank"], ref["rank"], rtol=1e-12, atol=1e-18)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)
    # mass concentrates near seeds: every seed outranks the global median
    med = float(np.median(got["rank"]))
    srank = got.set_index("id")["rank"]
    assert all(srank[s] > med for s in seeds)
    edges.unpersist()


def test_ppr_dangling_mass_returns_to_seeds(spark):
    """Open graph (1→2 only): the join path teleports 2's dangling mass
    back to the seed, not uniformly."""
    edges = spark.createDataFrame(pd.DataFrame(
        {"src": [1], "dst": [2], "weight": [1.0]}))
    got = {r["id"]: r["rank"] for r in pagerank(
        spark, edges, tol=0.0, max_iter=8, seeds=[1]).collect()}
    src, dst = np.array([1]), np.array([2])
    ids, want = _numpy_ppr(src, dst, [1], 8)
    for v, s in zip(ids, want):
        assert got[v] == pytest.approx(s, rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
