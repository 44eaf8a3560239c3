"""Multi-source BFS (algos/bfs.py + kernels/csr_bfs.py): packed-vs-join
exact distance parity, truth vs an independent NumPy BFS, dispatch gating
(non-vertex landmarks, open inputs), and the oracle depth-cap slack."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vite_spark import fixtures as fx
from vite_spark.algos.bfs import shortest_paths
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _modes(m):
    return {r.get("mode") for r in m.rows if r.get("kind") == "bfs_superstep"}


def _dists(df):
    return {(r["id"], r["landmark"]): r["dist"] for r in df.collect()}


def _numpy_bfs(s, d, landmarks):
    """Independent truth: hop distance from v to lm following edges
    src→dst, by BFS over the REVERSE adjacency from each landmark."""
    import collections

    radj = collections.defaultdict(list)
    for a, b in zip(s, d):
        radj[int(b)].append(int(a))
    out = {}
    for lm in landmarks:
        seen = {int(lm): 0}
        q = collections.deque([int(lm)])
        while q:
            v = q.popleft()
            for u in radj[v]:
                if u not in seen:
                    seen[u] = seen[v] + 1
                    q.append(u)
        for v, dd in seen.items():
            out[(v, int(lm))] = dd
    return out


def _rand_sym_edges(seed: int, nv: int = 500, ne: int = 360):
    """Sparse symmetric graph with several components (so unreachable
    pairs exist), sparse ids, self-loops and multi-edges (no-ops for
    min-relaxation)."""
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(30 * nv, nv, replace=False))
    a = rng.integers(0, nv, ne)
    b = rng.integers(0, nv, ne)
    m = a != b
    a, b = ids[a[m]], ids[b[m]]
    s = np.concatenate([a, b, a[:25], ids[:15]])
    d = np.concatenate([b, a, b[:25], ids[:15]])
    w = rng.integers(1, 6, len(s)).astype(np.float64)
    return s, d, w


def test_packed_matches_join_and_truth_karate(spark):
    s, d, w, nv = fx.karate()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    lms = [0, 33]
    mp, mj = MetricsCollector(), MetricsCollector()
    got = _dists(shortest_paths(spark, edges, lms, metrics=mp))
    assert _modes(mp) == {"csr_sharded_bfs"}
    ref = _dists(shortest_paths(
        spark, edges, lms, cfg=EngineConfig(use_csr_kernel=False),
        metrics=mj))
    assert _modes(mj) == {"join_min"}
    assert got == ref
    assert got == _numpy_bfs(s, d, lms)
    # identical Jacobi iterates → same changed counts, same iterations
    pc = [r["changed"] for r in mp.rows if r.get("kind") == "bfs_superstep"]
    jc = [r["changed"] for r in mj.rows if r.get("kind") == "bfs_superstep"]
    assert pc == jc


def test_packed_matches_join_random_with_unreachable(spark):
    s, d, w = _rand_sym_edges(7)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}))
    lms = sorted(np.unique(s)[:3].tolist())
    mp = MetricsCollector()
    got = _dists(shortest_paths(spark, edges, lms, metrics=mp))
    assert _modes(mp) == {"csr_sharded_bfs"}
    ref = _dists(shortest_paths(
        spark, edges, lms, cfg=EngineConfig(use_csr_kernel=False)))
    assert got == ref
    truth = _numpy_bfs(s, d, lms)
    assert got == truth
    # several components → some vertex is NOT in the output for some lm
    all_ids = set(np.unique(np.concatenate([s, d])).tolist())
    assert len(got) < len(all_ids) * len(lms)


def test_directed_vertex_closed_parity(spark):
    """Directed cycle + chords (every dst also a src): directed hop
    semantics, packed vs join vs truth."""
    n = 40
    s = np.r_[np.arange(n), np.arange(0, n, 5)]
    d = np.r_[(np.arange(n) + 1) % n, (np.arange(0, n, 5) + 17) % n]
    w = np.ones(len(s))
    edges = spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}))
    lms = [0, 7]
    mp = MetricsCollector()
    got = _dists(shortest_paths(spark, edges, lms, metrics=mp))
    assert _modes(mp) == {"csr_sharded_bfs"}
    ref = _dists(shortest_paths(
        spark, edges, lms, cfg=EngineConfig(use_csr_kernel=False)))
    assert got == ref
    assert got == _numpy_bfs(s, d, lms)
    # direction matters: dist(1 -> 0) wraps the cycle, dist(0 -> ...) short
    assert got[(1, 0)] > 1


def test_non_vertex_landmark_falls_back_to_join(spark):
    s, d, w, nv = fx.karate()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    m = MetricsCollector()
    got = _dists(shortest_paths(spark, edges, [0, 10_000], metrics=m))
    assert _modes(m) == {"join_min"}
    # the phantom landmark yields only its own seed row
    assert got[(10_000, 10_000)] == 0
    assert {k for k in got if k[1] == 10_000} == {(10_000, 10_000)}
    # the real landmark's distances still match truth
    truth = _numpy_bfs(s, d, [0])
    assert {k: v for k, v in got.items() if k[1] == 0} == truth


def test_open_input_falls_back_to_join(spark):
    """A dst that is never a src (non-vertex-closed) routes to the join
    path; distances still exact vs truth."""
    s = np.array([1, 2, 3, 4])
    d = np.array([2, 3, 4, 5])  # 5 never a src
    w = np.ones(4)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}))
    m = MetricsCollector()
    got = _dists(shortest_paths(spark, edges, [5], metrics=m))
    assert _modes(m) == {"join_min"}
    assert got == _numpy_bfs(s, d, [5])


def test_bfs_oracle_cap_slack(spark):
    """The SQL oracle bounds recursion depth at d < 32; the engine's
    fixpoint distances on the driver graph must sit FAR below the cap
    (the oracle equals the fixpoint only while max dist < 32)."""
    from vite_spark.queries import q_bfs_landmarks

    df = q_bfs_landmarks(spark, "/root/testdata/sf0.001")
    mx = df.agg({"dist": "max"}).collect()[0][0]
    assert mx <= 16, f"oracle cap slack eroded: max dist {mx}"


# ------------------------------------------------------ weighted (SSSP)

def _numpy_sssp(s, d, w, landmarks):
    """Independent truth: Dijkstra over the REVERSE adjacency from each
    landmark (min total weight over directed paths v → lm)."""
    import collections
    import heapq

    radj = collections.defaultdict(list)
    for a, b, ww in zip(s, d, w):
        radj[int(b)].append((int(a), float(ww)))
    out = {}
    for lm in landmarks:
        best = {int(lm): 0.0}
        h = [(0.0, int(lm))]
        while h:
            dist, v = heapq.heappop(h)
            if dist > best.get(v, np.inf):
                continue
            for u, ww in radj[v]:
                nd = dist + ww
                if nd < best.get(u, np.inf):
                    best[u] = nd
                    heapq.heappush(h, (nd, u))
        for v, dd in best.items():
            out[(v, int(lm))] = dd
    return out


def test_sssp_packed_matches_join_and_dijkstra(spark):
    """Integer weights 1–5 on a multi-component random graph: packed
    min-plus kernel ≡ join path ≡ an independent Dijkstra, exactly."""
    s, d, w = _rand_sym_edges(13)
    edges = spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}))
    lms = sorted(np.unique(s)[:3].tolist())
    mp, mj = MetricsCollector(), MetricsCollector()
    got = _dists(shortest_paths(spark, edges, lms, weighted=True,
                                metrics=mp))
    assert _modes(mp) == {"csr_sharded_sssp"}
    ref = _dists(shortest_paths(
        spark, edges, lms, weighted=True,
        cfg=EngineConfig(use_csr_kernel=False), metrics=mj))
    assert _modes(mj) == {"join_minplus"}
    assert got == ref
    assert got == _numpy_sssp(s, d, w, lms)
    # weighted ≠ hop distance somewhere (weights 1-5 reroute some pair)
    hops = _numpy_bfs(s, d, lms)
    assert any(got[k] != hops[k] for k in got)


def test_sssp_directed_weighted_parity(spark):
    """Directed cycle with one expensive chord: the min-plus fixpoint
    must prefer the longer-but-cheaper path, identically on both paths."""
    n = 30
    s = np.r_[np.arange(n), [5]]
    d = np.r_[(np.arange(n) + 1) % n, [20]]
    w = np.r_[np.ones(n), [100.0]]
    edges = spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}))
    mp = MetricsCollector()
    got = _dists(shortest_paths(spark, edges, [20], weighted=True,
                                metrics=mp))
    assert _modes(mp) == {"csr_sharded_sssp"}
    ref = _dists(shortest_paths(
        spark, edges, [20], weighted=True,
        cfg=EngineConfig(use_csr_kernel=False)))
    assert got == ref
    assert got == _numpy_sssp(s, d, w, [20])
    # the 100-weight chord 5→20 loses to the 15-hop unit path
    assert got[(5, 20)] == 15.0


def test_sssp_rejects_nonpositive_weights(spark):
    import pytest

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2], "dst": [2, 1],
                      "weight": [1.0, 0.0]}))
    with pytest.raises(ValueError, match="positive"):
        shortest_paths(spark, edges, [1], weighted=True)


def test_sssp_oracle_cap_slack(spark):
    """The SQL oracle bounds path cost at d < 16; the engine's fixpoint
    costs on the driver graph must sit FAR below the cap."""
    from vite_spark.queries import q_sssp_landmarks

    df = q_sssp_landmarks(spark, "/root/testdata/sf0.001")
    mx = df.agg({"dist": "max"}).collect()[0][0]
    assert mx <= 8, f"oracle cap slack eroded: max cost {mx}"
