"""HyperANF (algos/anf.py) vs an independent ball-definition replay: the
engine ITERATES register max-merge; the replay computes each ball(v, h) by
BFS and takes the elementwise max of member contributions directly —
identical results prove the merge recursion implements the ball sketch.
Plus HLL accuracy vs the exact neighborhood function and the
effective-diameter interpolation contract."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from vite_spark.algos.anf import (
    ANF_B,
    ANF_SEED,
    effective_diameter,
    hll_alpha,
    hyperanf,
    vertex_registers,
)
from vite_spark.algos.coloring import hash32_np


def _edges_df(spark, a, b):
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def _contrib(v, b=ANF_B, seed=ANF_SEED):
    h = int(hash32_np(np.array([v], np.int64), seed)[0])
    j = h & ((1 << b) - 1)
    w = h >> b
    rho = (32 - b + 1) if w == 0 else ((w & -w).bit_length())
    return j, rho


def _replay_nf(pairs, h_max, b=ANF_B):
    m = 1 << b
    adj = collections.defaultdict(set)
    verts = set()
    for x, y in pairs:
        verts.update((x, y))
        if x != y:
            adj[x].add(y)
            adj[y].add(x)
    contrib = {v: _contrib(v, b) for v in verts}
    alpha_mm = hll_alpha(m) * m * m

    def est(regs):
        s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
        raw = alpha_mm / s
        vz = m - len(regs)
        if raw <= 2.5 * m and vz > 0:
            return round(m * np.log(m / vz), 6)
        return round(raw, 6)

    out = []
    for h in range(h_max + 1):
        nf = 0.0
        for v in verts:
            # ball(v, h) by BFS
            ball = {v}
            frontier = {v}
            for _ in range(h):
                frontier = {u for x in frontier for u in adj[x]} - ball
                ball |= frontier
            regs = {}
            for u in ball:
                j, r = contrib[u]
                regs[j] = max(regs.get(j, 0), r)
            nf += est(regs)
        out.append((h, round(nf, 6)))
    return out


def test_vertex_registers_match_numpy(spark):
    ids = pd.DataFrame({"id": np.arange(0, 500, 7, dtype=np.int64)})
    got = {r["id"]: (r["j"], r["r"]) for r in vertex_registers(
        spark.createDataFrame(ids)).collect()}
    for v in ids["id"]:
        assert got[int(v)] == _contrib(int(v))


def test_hyperanf_equals_ball_replay(spark):
    rng = np.random.default_rng(41)
    n = 60
    a, b = np.nonzero(np.triu(rng.random((n, n)) < 0.05, k=1))
    pairs = list(zip(a.tolist(), b.tolist()))
    got = sorted((r["h"], r["nf"]) for r in hyperanf(
        spark, _edges_df(spark, a, b), h_max=5).collect())
    want = _replay_nf(pairs, 5)
    assert [h for h, _ in got] == [h for h, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert abs(g - w) < 1e-4 * max(1.0, w), (g, w)


def test_hyperanf_accuracy_vs_exact(spark):
    """m = 16 → theoretical rse ≈ 26%; assert the estimate tracks the
    exact neighborhood function within a loose 3σ-ish band, and is
    monotone in h with a constant tail past the diameter."""
    import networkx as nx

    rng = np.random.default_rng(8)
    n = 120
    a, b = np.nonzero(np.triu(rng.random((n, n)) < 0.05, k=1))
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(a.tolist(), b.tolist()))
    rows = sorted((r["h"], r["nf"]) for r in hyperanf(
        spark, _edges_df(spark, a, b), h_max=8).collect())
    exact = {h: 0 for h in range(9)}
    dists = dict(nx.all_pairs_shortest_path_length(g))
    verts = {*a.tolist(), *b.tolist()}
    for u in verts:
        for h in range(9):
            exact[h] += sum(1 for v, d in dists[u].items()
                            if d <= h and v in verts)
    prev = None
    for h, nf in rows:
        assert nf >= (prev or 0.0) - 1e-9      # monotone
        assert 0.4 * exact[h] <= nf <= 1.8 * exact[h], (h, nf, exact[h])
        prev = nf


def test_hyperanf_layout_independent(spark):
    rng = np.random.default_rng(3)
    n = 40
    a, b = np.nonzero(np.triu(rng.random((n, n)) < 0.1, k=1))
    r1 = sorted((r["h"], r["nf"]) for r in hyperanf(
        spark, _edges_df(spark, a, b).repartition(2), h_max=4).collect())
    r2 = sorted((r["h"], r["nf"]) for r in hyperanf(
        spark, _edges_df(spark, a, b).repartition(7), h_max=4).collect())
    assert r1 == r2


def test_effective_diameter_interpolation():
    # NF: 10 → 55 → 91 → 100; target 0.9·100 = 90 sits between h=1 and 2
    pts = [(0, 10.0), (1, 55.0), (2, 91.0), (3, 100.0)]
    d = effective_diameter(pts)
    assert abs(d - (1 + (90 - 55) / (91 - 55))) < 1e-12
    assert effective_diameter([(0, 5.0), (1, 5.0)]) == 0.0
