"""Oracle self-consistency: the NumPy oracle must satisfy the reference's
own invariants before it can judge the Spark engine."""

from __future__ import annotations

import numpy as np
import pytest

from vite_spark import fixtures as fx
from vite_spark.oracle import (
    louvain_oracle_full,
    louvain_oracle_phase,
    modularity_oracle,
)


ALL = {
    "karate": fx.karate,
    "two_cliques": fx.two_cliques,
    "ring_8": fx.ring,
    "singleton_pairs": fx.singleton_pairs,
    "self_loops": fx.self_loops_triangle,
    "weighted_star": fx.weighted_star,
}


@pytest.mark.parametrize("name", list(ALL))
def test_symmetry_invariant(name):
    s, d, w, nv = ALL[name]()
    pairs = {(a, b): ww for a, b, ww in zip(s.tolist(), d.tolist(), w.tolist())}
    for (a, b), ww in pairs.items():
        assert pairs.get((b, a)) == pytest.approx(ww)
    vdeg = np.bincount(s, weights=w, minlength=nv)
    assert vdeg.sum() == pytest.approx(w.sum())  # Σdeg == 2m


def test_two_cliques_reference_quirk():
    """Two K5s + bridge: the reference's synchronous sweep oscillates at
    iteration 2, the break returns pastComm (= identity, louvain.cpp:579)
    and prevMod carries the abs()-inflated iteration-1 value
    (ABS_MOD_PER_ITER, Makefile:7). Pinned, not 'fixed' (SURVEY.md §7.4)."""
    s, d, w, nv = fx.two_cliques()
    res = louvain_oracle_full(s, d, w, nv)
    assert np.array_equal(res.labels, np.arange(nv))
    assert res.q_per_phase[0] == pytest.approx(0.31859410430838997, abs=1e-12)


def test_planted_partition_ground_truth():
    """Seeded SBM: the engine recovers the 4 planted blocks exactly."""
    s, d, w, nv, truth = fx.planted_partition()
    res = louvain_oracle_full(s, d, w, nv)
    labels = res.labels
    assert len(np.unique(labels)) == 4
    for b in range(4):
        blk = labels[b * 32 : (b + 1) * 32]
        assert len(np.unique(blk)) == 1
    # converged Q equals closed-form modularity of the final labels
    assert res.q_per_phase[-1] == pytest.approx(
        modularity_oracle(s, d, w, labels, nv), abs=1e-9
    )


def test_karate_quality():
    s, d, w, nv = fx.karate()
    res = louvain_oracle_full(s, d, w, nv)
    q = res.q_per_phase[-1]
    assert 0.35 < q < 0.42  # synchronous Louvain lands near 0.41 on karate
    # labels dense 0..k-1
    assert set(np.unique(res.labels)) == set(range(len(np.unique(res.labels))))
    # final Q consistent with the assignment
    assert q == pytest.approx(modularity_oracle(s, d, w, res.labels, nv), abs=1e-9)


def test_singleton_guard_prevents_swaps():
    """Disjoint edges: both endpooints want each other's singleton; the
    guard (louvain.cpp:2275-2276) lets only the higher id move."""
    s, d, w, nv = fx.singleton_pairs()
    labels, q, iters = louvain_oracle_phase(s, d, w, nv, threshold=1e-6)
    # after convergence each pair merges into one community
    res = louvain_oracle_full(s, d, w, nv)
    for i in range(0, nv, 2):
        assert res.labels[i] == res.labels[i + 1]
    assert len(np.unique(res.labels)) == nv // 2


def test_modularity_monotone_until_threshold():
    s, d, w, nv = fx.karate()
    trace = []
    louvain_oracle_phase(s, d, w, nv, threshold=1e-6, trace=trace)
    qs = [t[2] for t in trace]
    # every accepted step improves by > threshold; the last may dip below
    for a, b in zip(qs[:-2], qs[1:-1]):
        assert b - a >= 1e-6


def test_permutation_invariance():
    """Row order of the edge table must not change the result."""
    s, d, w, nv = fx.karate()
    res1 = louvain_oracle_full(s, d, w, nv)
    rng = np.random.default_rng(7)
    p = rng.permutation(len(s))
    res2 = louvain_oracle_full(s[p], d[p], w[p], nv)
    assert np.array_equal(res1.labels, res2.labels)
    assert res1.q_per_phase == pytest.approx(res2.q_per_phase)


def test_self_loop_semantics():
    """Self-loop weights count once in vDegree and land in the own-community
    counter bucket (louvain.cpp:2438-2439). The dominant self-loop on
    vertex 1 keeps the partition trivial under reference dynamics —
    deterministic labels + Q are pinned against the literal C++ mirror."""
    s, d, w, nv = fx.self_loops_triangle()
    vdeg = np.bincount(s, weights=w, minlength=nv)
    assert vdeg.tolist() == pytest.approx([2.5, 4.0, 2.25])  # self-loop once
    res = louvain_oracle_full(s, d, w, nv)
    # result is deterministic; cross-checked against brute-force mirror in
    # test_sweep_matches_cpp_mirror below
    assert res.q_per_phase[-1] == pytest.approx(
        max(res.q_per_phase), abs=1e-12
    )


def test_coarsening_preserves_modularity():
    from vite_spark.oracle.louvain_ref import coarsen_oracle

    s, d, w, nv = fx.karate()
    labels, q, _ = louvain_oracle_phase(s, d, w, nv)
    s2, d2, w2, nv2, o2n = coarsen_oracle(s, d, w, labels, nv)
    # total weight preserved
    assert w2.sum() == pytest.approx(w.sum())
    # singleton assignment on coarse graph has same Q as labels on fine
    q_fine = modularity_oracle(s, d, w, labels, nv)
    q_coarse = modularity_oracle(s2, d2, w2, np.arange(nv2), nv2)
    assert q_fine == pytest.approx(q_coarse, abs=1e-12)


def _brute_sweep(src, dst, w, curr, vdeg, self_w, comm_deg, comm_size, const, nv):
    """Literal per-vertex mirror of louvain.cpp:2281-2466 (dict-based)."""
    target = curr.copy()
    cw = 0.0
    adj = {}
    for a, b, ww in zip(src, dst, w):
        adj.setdefault(a, []).append((b, ww))
    for i in range(nv):
        if i not in adj:
            continue
        cc = curr[i]
        counter = {cc: 0.0}
        self_loop = 0.0
        for (t, ww) in adj[i]:
            if t == i:
                self_loop += ww
            tc = curr[t]
            counter[tc] = counter.get(tc, 0.0) + ww
        cw += counter[cc]
        eix = counter[cc] - self_loop
        ax = comm_deg[cc] - vdeg[i]
        max_index, max_gain, max_size = cc, 0.0, comm_size[cc]
        for c, eiy in counter.items():
            if c == cc:
                continue
            g = 2.0 * (eiy - eix) - 2.0 * vdeg[i] * (comm_deg[c] - ax) * const
            if g > max_gain or (g == max_gain and g != 0.0 and c < max_index):
                max_gain, max_index, max_size = g, c, comm_size[c]
        if max_size == 1 and comm_size[cc] == 1 and max_index > cc:
            max_index = cc
        target[i] = max_index
    return target, cw


@pytest.mark.parametrize("name", list(ALL) + ["sbm", "grid"])
def test_sweep_matches_cpp_mirror(name):
    """The vectorized oracle sweep is bit-identical to a literal per-vertex
    transcription of the reference C++ for several iterations."""
    from vite_spark.oracle.louvain_ref import _degrees, _phase_sweep_targets

    if name == "sbm":
        s, d, w, nv, _ = fx.planted_partition()
    elif name == "grid":
        s, d, w, nv = fx.grid_graph(8, 8)
    else:
        s, d, w, nv = ALL[name]()
    vdeg = _degrees(s, w, nv)
    const = 1.0 / vdeg.sum()
    sm = s == d
    self_w = np.bincount(s[sm], weights=w[sm], minlength=nv)
    curr = np.arange(nv)
    cd, cs = vdeg.copy(), np.ones(nv, dtype=np.int64)
    for _ in range(5):
        t1, e1 = _phase_sweep_targets(s, d, w, curr, vdeg, self_w, cd, cs, const, nv)
        t2, e2 = _brute_sweep(s, d, w, curr, vdeg, self_w, cd, cs, const, nv)
        assert np.array_equal(t1, t2)
        assert e1 == pytest.approx(e2, abs=1e-12)
        curr = t1
        cd = np.bincount(curr, weights=vdeg, minlength=nv)
        cs = np.bincount(curr, minlength=nv)
