"""HITS (algos/centrality.py hits + kernels/csr_hits.py) vs a NumPy
reference running the same recurrence (deferred L1 normalization, h0 = 1),
plus packed-kernel ↔ join-path parity and fallback gating."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vite_spark.algos.centrality import hits
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _modes(mk):
    return {r.get("mode") for r in mk.rows
            if r.get("kind") == "hits_superstep"}


def _edges_df(spark, src, dst, w):
    return spark.createDataFrame(pd.DataFrame({
        "src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64),
        "weight": np.asarray(w, np.float64),
    }))


def _numpy_hits(src, dst, w, n, iters, weighted=True):
    W = np.zeros((n, n))
    for s, d, x in zip(src, dst, w):
        W[s, d] += x if weighted else 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = W.T @ h
        h = W @ a
    hs, as_ = h.sum(), a.sum()
    return (h / hs if hs > 0 else h * 0.0,
            a / as_ if as_ > 0 else a * 0.0)


def _check(spark, src, dst, w, n, iters=10, weighted=True):
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(
        spark, _edges_df(spark, src, dst, w), iters=iters,
        weighted=weighted).collect()}
    hh, aa = _numpy_hits(src, dst, w, n, iters, weighted)
    seen = set(src) | set(dst)
    assert set(got) == seen
    for v in seen:
        assert abs(got[v][0] - hh[v]) < 1.5e-6, (v, got[v][0], hh[v])
        assert abs(got[v][1] - aa[v]) < 1.5e-6, (v, got[v][1], aa[v])


def test_hits_random_weighted(spark):
    rng = np.random.default_rng(5)
    n = 30
    m = rng.random((n, n)) < 0.12
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    w = rng.integers(1, 5, len(src)).astype(float)
    _check(spark, src, dst, w, n)


def test_hits_unweighted_ignores_weights(spark):
    rng = np.random.default_rng(9)
    n = 20
    m = rng.random((n, n)) < 0.15
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    w = rng.integers(1, 9, len(src)).astype(float)
    _check(spark, src, dst, w, n, weighted=False)


def test_hits_kernel_join_parity_on_closed_digraph(spark):
    """A Hamiltonian cycle + random chords is vertex-closed, so the
    dispatch runs the PACKED kernel; force the join path alongside and
    compare both to NumPy (float sums differ only in accumulation
    order)."""
    rng = np.random.default_rng(77)
    n = 50
    m = rng.random((n, n)) < 0.08
    np.fill_diagonal(m, False)
    src, dst = [list(x) for x in np.nonzero(m)]
    src += list(range(n))
    dst += [(i + 1) % n for i in range(n)]
    # dedup (the cycle may duplicate a chord)
    pairs = sorted({(int(s), int(d)) for s, d in zip(src, dst) if s != d})
    w = [float(1 + (s * 7 + d) % 4) for s, d in pairs]
    e = spark.createDataFrame(pd.DataFrame({
        "src": [s for s, _ in pairs], "dst": [d for _, d in pairs],
        "weight": w}))

    mk = MetricsCollector()
    got_k = {r["id"]: (r["hub"], r["authority"])
             for r in hits(spark, e, iters=10, metrics=mk).collect()}
    assert _modes(mk) == {"csr_sharded_hits"}
    mj = MetricsCollector()
    got_j = {r["id"]: (r["hub"], r["authority"])
             for r in hits(spark, e, iters=10,
                           cfg=EngineConfig(use_csr_kernel=False),
                           metrics=mj).collect()}
    assert _modes(mj) == {"join"}
    hh, aa = _numpy_hits([s for s, _ in pairs], [d for _, d in pairs],
                         w, n, 10)
    for v in range(n):
        for got in (got_k, got_j):
            assert abs(got[v][0] - hh[v]) < 1.5e-6
            assert abs(got[v][1] - aa[v]) < 1.5e-6
        assert abs(got_k[v][0] - got_j[v][0]) < 1.5e-6
        assert abs(got_k[v][1] - got_j[v][1]) < 1.5e-6


def test_hits_open_graph_falls_back_to_join(spark):
    """0 → 1 → 2 is not vertex-closed (0 never a dst) → join path."""
    mk = MetricsCollector()
    hits(spark, _edges_df(spark, [0, 1], [1, 2], [1.0, 1.0]),
         iters=3, metrics=mk).collect()
    assert _modes(mk) == {"join"}


def test_hits_sink_and_source_rows(spark):
    # 0 → 1 → 2: vertex 0 is a pure source (authority 0), vertex 2 a pure
    # sink (hub 0); explicit rows for both
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(
        spark, _edges_df(spark, [0, 1], [1, 2], [1.0, 1.0]),
        iters=4).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0][1] == 0.0
    assert got[2][0] == 0.0
    _check(spark, [0, 1], [1, 2], [1.0, 1.0], 3, iters=4)
