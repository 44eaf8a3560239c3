"""k-truss (algos/truss.py) vs networkx, plus the oracle unroll slack."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vite_spark.algos.truss import ktruss
from vite_spark.runtime.metrics import MetricsCollector


def _edges_df(spark, a, b):
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def test_ktruss_matches_networkx(spark):
    import networkx as nx

    rng = np.random.default_rng(17)
    n = 50
    m = np.triu(rng.random((n, n)) < 0.25, k=1)
    a, b = np.nonzero(m)
    g = nx.Graph()
    g.add_edges_from(zip(a.tolist(), b.tolist()))
    for k in (3, 4, 5):
        want = {(min(u, v), max(u, v))
                for u, v in nx.k_truss(g, k).edges()}
        got = {(r["u"], r["v"]) for r in ktruss(
            spark, _edges_df(spark, a, b), k).collect()}
        assert got == want, f"k={k}"


def test_ktruss_support_is_internal(spark):
    """Two 5-cliques sharing one edge: the 5-truss is both cliques; the
    shared edge's support within the truss is 6 (3 from each clique),
    every other edge's is 3."""
    c1 = [0, 1, 2, 3, 4]
    c2 = [3, 4, 10, 11, 12]
    pairs = {(min(u, v), max(u, v))
             for c in (c1, c2) for i, u in enumerate(c) for v in c[i + 1:]}
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    rows = {(r["u"], r["v"]): r["support"] for r in ktruss(
        spark, _edges_df(spark, a, b), 5).collect()}
    assert set(rows) == pairs
    assert rows[(3, 4)] == 6
    assert all(s == 3 for e, s in rows.items() if e != (3, 4))


def test_ktruss_oracle_slack(spark):
    """The SQL oracle unrolls KTRUSS_ORACLE_ROUNDS peel rounds; the
    engine's fixpoint on the driver graph must converge in HALF that or
    fewer (extra unrolled rounds are no-ops after convergence, so slack
    going down is the early warning, not a failure at the boundary)."""
    from vite_spark.derive import lineitem_part_edges
    from vite_spark.queries import KTRUSS_K, KTRUSS_ORACLE_ROUNDS

    e = lineitem_part_edges(spark, "/root/testdata/sf0.001")
    m = MetricsCollector()
    ktruss(spark, e, KTRUSS_K, metrics=m)
    rounds = len([r for r in m.rows if r.get("kind") == "ktruss_round"])
    assert rounds <= KTRUSS_ORACLE_ROUNDS // 2, \
        f"ktruss used {rounds} rounds; oracle unrolls {KTRUSS_ORACLE_ROUNDS}"


def test_ktruss_frontier_equals_recompute(spark):
    """The frontier peel (maintained supports, decrements enumerated
    from deleted edges) and the full-recompute Jacobi peel return the
    identical (edge, support) sets — including on graphs engineered so
    a deleted round contains triangles with TWO deleted edges (the
    inclusion–exclusion case the naive pair count overcounts)."""
    from vite_spark.algos.truss import ktruss_recompute

    rng = np.random.default_rng(23)
    for seed, n, p in ((1, 40, 0.3), (2, 60, 0.15), (3, 30, 0.5)):
        rng = np.random.default_rng(seed)
        m = np.triu(rng.random((n, n)) < p, k=1)
        a, b = np.nonzero(m)
        for k in (3, 4, 6):
            got = {(r["u"], r["v"]): r["support"] for r in ktruss(
                spark, _edges_df(spark, a, b), k).collect()}
            want = {(r["u"], r["v"]): r["support"] for r in ktruss_recompute(
                spark, _edges_df(spark, a, b), k).collect()}
            assert got == want, f"seed={seed} k={k}"
