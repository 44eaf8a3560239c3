"""SCAN structural clustering (algos/scan.py) on hand-computable graphs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from vite_spark.algos.scan import scan_clusters, scan_similarity


def _edges_df(spark, pairs):
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def _sigma(g, u, v):
    gu = g[u] | {u}
    gv = g[v] | {v}
    return len(gu & gv) / math.sqrt(len(gu) * len(gv))


def _adj(pairs):
    g = {}
    for u, v in pairs:
        g.setdefault(u, set()).add(v)
        g.setdefault(v, set()).add(u)
    return g


def test_scan_similarity_matches_definition(spark):
    rng = np.random.default_rng(13)
    n = 40
    m = np.triu(rng.random((n, n)) < 0.2, k=1)
    pairs = list(zip(*np.nonzero(m)))
    pairs = [(int(u), int(v)) for u, v in pairs]
    g = _adj(pairs)
    got = {(r["u"], r["v"]): r["sigma"] for r in
           scan_similarity(spark, _edges_df(spark, pairs)).collect()}
    assert set(got) == set(pairs)
    for (u, v), s in got.items():
        assert math.isclose(s, _sigma(g, u, v), rel_tol=1e-12)


def test_scan_clusters_two_cliques_bridge(spark):
    """Two 4-cliques joined by a bridge: clique members are cores
    (σ = 1 inside a clique, bar the bridge endpoints' dilution), the
    cliques form two clusters, and the degree-1 pendant is an outlier."""
    k1 = [(a, b) for i, a in enumerate([0, 1, 2, 3])
          for b in [0, 1, 2, 3][i + 1:]]
    k2 = [(a, b) for i, a in enumerate([10, 11, 12, 13])
          for b in [10, 11, 12, 13][i + 1:]]
    pairs = k1 + k2 + [(3, 10), (13, 99)]
    got = {r["id"]: r["cluster"] for r in scan_clusters(
        spark, _edges_df(spark, pairs), eps=0.7, mu=2).collect()}
    # verify against a direct computation of the definition
    g = _adj(pairs)
    eps, mu = 0.7, 2
    epsn = {u: {v for v in g[u] if _sigma(g, u, v) >= eps} for u in g}
    cores = {u for u in g if len(epsn[u]) >= mu}
    assert cores  # non-degenerate
    # clusters = CC over core-core eps-edges, label = min core id
    lab = {u: u for u in cores}
    for _ in range(len(cores)):
        for u in cores:
            for v in epsn[u]:
                if v in cores:
                    m = min(lab[u], lab[v])
                    lab[u] = lab[v] = m
    want = {}
    for u in g:
        if u in cores:
            want[u] = lab[u]
        else:
            cands = [lab[v] for v in epsn[u] if v in cores]
            want[u] = min(cands) if cands else -1
    assert got == want
    # and the headline shape: two clusters, pendant 99 is an outlier
    assert want[99] == -1
    assert len({c for c in want.values() if c != -1}) == 2
