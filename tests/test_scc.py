"""SCC (algos/scc.py) vs networkx ground truth + structure-specific paths
(trim-only DAGs, SCC chains that force multiple peel rounds, self-loops)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vite_spark.algos.scc import strongly_connected_components


def _edges_df(spark, pairs):
    pairs = list(pairs)
    return spark.createDataFrame(pd.DataFrame({
        "src": [int(a) for a, _ in pairs],
        "dst": [int(b) for _, b in pairs],
        "weight": np.ones(len(pairs)),
    }))


def _nx_labels(pairs):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from((int(a), int(b)) for a, b in pairs)
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def _got(spark, pairs, **kw):
    df = strongly_connected_components(spark, _edges_df(spark, pairs), **kw)
    return {r["id"]: r["component"] for r in df.collect()}


def test_scc_random_digraphs(spark):
    for seed in (3, 17, 42):
        rng = np.random.default_rng(seed)
        n = 40
        m = rng.random((n, n)) < 0.06
        np.fill_diagonal(m, False)
        pairs = list(zip(*np.nonzero(m)))
        assert _got(spark, pairs) == _nx_labels(pairs)


def test_scc_dag_trims_to_singletons(spark):
    # pure DAG: every vertex is its own SCC, resolved by TRIM alone
    pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)
             if (i * 7 + j) % 3 == 0]
    got = _got(spark, pairs)
    assert got == {v: v for v in got}
    assert got == _nx_labels(pairs)


def test_scc_chain_of_cycles(spark):
    # three 3-cycles connected in a chain — the coloring/peel path must
    # run multiple rounds (each round peels the min-root classes)
    cyc = lambda a, b, c: [(a, b), (b, c), (c, a)]
    pairs = cyc(0, 1, 2) + cyc(10, 11, 12) + cyc(20, 21, 22)
    pairs += [(2, 10), (12, 20)]  # DAG edges between the SCCs
    got = _got(spark, pairs)
    assert got == _nx_labels(pairs)
    assert got[1] == 0 and got[11] == 10 and got[21] == 20


def test_scc_self_loops_and_two_cycle(spark):
    pairs = [(5, 5), (1, 2), (2, 1), (3, 1)]  # self-loop, 2-cycle, fringe
    got = _got(spark, pairs)
    assert got == {5: 5, 1: 1, 2: 1, 3: 3}
    assert got == _nx_labels(pairs)


def test_scc_max_rounds_guard(spark):
    import pytest

    # a chain of 2-cycles needs one peel round per SCC level
    pairs = []
    for i in range(4):
        a, b = 2 * i, 2 * i + 1
        pairs += [(a, b), (b, a)]
        if i:
            pairs.append((2 * (i - 1), a))
    with pytest.raises(RuntimeError, match="max_rounds"):
        _got(spark, pairs, max_rounds=1)
    assert _got(spark, pairs, max_rounds=8) == _nx_labels(pairs)
