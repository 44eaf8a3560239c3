"""Deterministic random walks (algos/walks.py) vs a pure-Python replay of
the same hash rule, plus sink-termination and layout-independence."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from vite_spark.algos.walks import WALK_A, WALK_B, WALK_C, WALK_P, random_walks


def _edges_df(spark, pairs):
    return spark.createDataFrame(pd.DataFrame({
        "src": [a for a, _ in pairs], "dst": [b for _, b in pairs],
        "weight": np.ones(len(pairs)),
    }))


def _replay(pairs, steps, starts):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    rows = set()
    for w in starts:
        cur = w
        rows.add((w, 0, w))
        for s in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(
                nbrs,
                key=lambda d: (
                    ((cur % WALK_P) * WALK_A + (s % WALK_P) * WALK_B
                     + (d % WALK_P) * WALK_C) % WALK_P,
                    d,
                ),
            )
            rows.add((w, s, cur))
    return rows


def _got(spark, pairs, steps):
    df = random_walks(spark, _edges_df(spark, pairs), steps=steps)
    return {(r["walk"], r["step"], r["id"]) for r in df.collect()}


def test_walks_match_replay_random(spark):
    rng = np.random.default_rng(31)
    n = 40
    m = rng.random((n, n)) < 0.1
    np.fill_diagonal(m, False)
    pairs = [(int(a), int(b)) for a, b in zip(*np.nonzero(m))]
    starts = sorted({a for a, _ in pairs})
    assert _got(spark, pairs, 6) == _replay(pairs, 6, starts)


def test_walks_end_at_sinks(spark):
    pairs = [(1, 2), (2, 3)]  # 3 is a sink; walks run out early
    got = _got(spark, pairs, 5)
    assert got == {(1, 0, 1), (1, 1, 2), (1, 2, 3), (2, 0, 2), (2, 1, 3)}


def test_walks_layout_independent(spark):
    # the hash rule makes the corpus a pure function of the graph — the
    # same walks regardless of partitioning
    pairs = [(a, b) for a in range(12) for b in range(12)
             if a != b and (a * 5 + b) % 4 == 0]
    e1 = _edges_df(spark, pairs).repartition(2)
    e2 = _edges_df(spark, pairs).repartition(7)
    r1 = {(r["walk"], r["step"], r["id"])
          for r in random_walks(spark, e1, steps=5).collect()}
    r2 = {(r["walk"], r["step"], r["id"])
          for r in random_walks(spark, e2, steps=5).collect()}
    assert r1 == r2 == _replay(pairs, 5, sorted({a for a, _ in pairs}))
