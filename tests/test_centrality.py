"""Landmark centrality (algos/centrality.py) vs networkx shortest paths,
plus the zero-row completeness contract."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from vite_spark.algos.centrality import landmark_centrality


def _rand_graph(seed: int, n: int = 50, p: float = 0.1):
    rng = np.random.default_rng(seed)
    a, b = np.nonzero(np.triu(rng.random((n, n)) < p, k=1))
    return a.astype(np.int64), b.astype(np.int64)


def _edges_df(spark, a, b):
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def test_centrality_matches_networkx(spark):
    import networkx as nx

    a, b = _rand_graph(3)
    g = nx.Graph()
    g.add_edges_from(zip(a.tolist(), b.tolist()))
    lms = sorted(g.nodes())[:4]
    sp = {lm: nx.single_source_shortest_path_length(g, lm) for lm in lms}

    got = {r["id"]: r for r in landmark_centrality(
        spark, _edges_df(spark, a, b), lms).collect()}
    assert set(got) == set(g.nodes())
    for v in g.nodes():
        ds = [sp[lm][v] for lm in lms if v in sp[lm] and sp[lm][v] > 0]
        r = got[v]
        assert r["reached"] == len(ds)
        want_c = len(ds) / sum(ds) if ds else 0.0
        want_h = sum(1.0 / d for d in ds)
        assert math.isclose(r["closeness"], want_c, abs_tol=1e-6)
        assert math.isclose(r["harmonic"], want_h, abs_tol=1e-6)


def test_centrality_unreachable_rows_kept(spark):
    """A vertex in a separate component from every landmark keeps an
    explicit (id, 0, 0.0, 0.0) row."""
    # component A: path 0-1-2 (landmarks 0,1); component B: edge 10-11
    a = np.array([0, 1, 10], dtype=np.int64)
    b = np.array([1, 2, 11], dtype=np.int64)
    got = {r["id"]: r for r in landmark_centrality(
        spark, _edges_df(spark, a, b), [0, 1]).collect()}
    assert set(got) == {0, 1, 2, 10, 11}
    for v in (10, 11):
        assert (got[v]["reached"], got[v]["closeness"],
                got[v]["harmonic"]) == (0, 0.0, 0.0)
    # vertex 2: d(2,0)=2, d(2,1)=1 → reached 2, closeness 2/3, harmonic 1.5
    assert got[2]["reached"] == 2
    assert math.isclose(got[2]["closeness"], 2 / 3, abs_tol=1e-6)
    assert got[2]["harmonic"] == 1.5
    # landmark 0: d(0,1)=1 only (self excluded) → 1, 1.0, 1.0
    assert (got[0]["reached"], got[0]["closeness"],
            got[0]["harmonic"]) == (1, 1.0, 1.0)
