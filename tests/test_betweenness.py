"""Landmark betweenness (algos/betweenness.py) vs an independent
pure-Python Brandes run from the same source set, plus the oracle
unroll-depth slack contract."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from vite_spark.algos.betweenness import landmark_betweenness


def _edges_df(spark, a, b):
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def _brandes(adj, sources):
    """Brandes 2001 single-source dependency accumulation, summed over
    ``sources`` only (endpoints excluded, no rescaling)."""
    bc = collections.defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = collections.defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = collections.deque([s])
        preds = collections.defaultdict(list)
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = collections.defaultdict(float)
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return bc


def _rand_graph(seed, n=50, p=0.08):
    rng = np.random.default_rng(seed)
    a, b = np.nonzero(np.triu(rng.random((n, n)) < p, k=1))
    return a.astype(np.int64), b.astype(np.int64)


def _check(spark, a, b, landmarks):
    adj = collections.defaultdict(set)
    for u, v in zip(a.tolist(), b.tolist()):
        adj[u].add(v)
        adj[v].add(u)
    want = _brandes(adj, landmarks)
    got = {r["id"]: r["bc"] for r in landmark_betweenness(
        spark, _edges_df(spark, a, b), landmarks).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert abs(got[v] - want.get(v, 0.0)) < 1.5e-6, (v, got[v], want[v])


def test_betweenness_random_graphs(spark):
    for seed in (2, 13):
        a, b = _rand_graph(seed)
        _check(spark, a, b, sorted({*a.tolist(), *b.tolist()})[:4])


def test_betweenness_path_graph_exact(spark):
    # path 0-1-2-3-4 from source 0: δ_0 = [_,3,2,1,0] — hand-checkable
    a = np.array([0, 1, 2, 3], np.int64)
    b = np.array([1, 2, 3, 4], np.int64)
    got = {r["id"]: r["bc"] for r in landmark_betweenness(
        spark, _edges_df(spark, a, b), [0]).collect()}
    assert got == {0: 0.0, 1: 3.0, 2: 2.0, 3: 1.0, 4: 0.0}


def test_betweenness_all_sources_equals_networkx(spark):
    """With L = every vertex, bc/2 (each unordered pair counted from both
    endpoints on an undirected graph) ≡ networkx's unnormalized result."""
    import networkx as nx

    a, b = _rand_graph(23, n=30, p=0.12)
    g = nx.Graph()
    g.add_edges_from(zip(a.tolist(), b.tolist()))
    want = nx.betweenness_centrality(g, normalized=False)
    verts = sorted({*a.tolist(), *b.tolist()})
    got = {r["id"]: r["bc"] for r in landmark_betweenness(
        spark, _edges_df(spark, a, b), verts).collect()}
    for v in verts:
        assert abs(got[v] / 2 - want[v]) < 3e-6, (v, got[v] / 2, want[v])


def test_betweenness_oracle_slack(spark):
    """The SQL oracle unrolls BC_MAXLEV σ/δ levels; the driver graph's
    landmark eccentricity must fit (with slack) or the oracle silently
    truncates the accumulation."""
    from vite_spark.algos.bfs import shortest_paths
    from vite_spark.derive import lineitem_part_edges
    from vite_spark.queries import BC_MAXLEV, BFS_LANDMARKS

    import pyspark.sql.functions as F

    e = lineitem_part_edges(spark, "/root/testdata/sf0.001")
    lms = [int(r["src"]) for r in
           e.select("src").distinct().orderBy("src")
           .limit(BFS_LANDMARKS).collect()]
    mx = shortest_paths(spark, e, lms).agg(F.max("dist")).collect()[0][0]
    assert mx <= BC_MAXLEV - 2, f"oracle unroll slack eroded: max dist {mx}"
