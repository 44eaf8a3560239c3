"""Borůvka minimum spanning forest (algos/msf.py).

The (weight, src, dst) total order makes every weight effectively
distinct, so the MSF is unique — Kruskal under the same order must
produce the IDENTICAL edge set, not just the same total weight."""

from __future__ import annotations

import random

import networkx as nx
import pytest


def _kruskal(n_vertices, edges):
    """Pure-Python Kruskal under the shared total order → the unique MSF."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


@pytest.mark.parametrize("seed,n,m", [(1, 50, 100), (2, 120, 200), (3, 40, 300)])
def test_msf_matches_kruskal_total_order(spark, seed, n, m):
    from vite_spark.algos.msf import minimum_spanning_forest

    rng = random.Random(seed)
    g = nx.gnm_random_graph(n, m, seed=seed)
    ed = []
    for u, v in g.edges():
        w = float(rng.randint(1, 5))  # heavy ties: the order must decide
        ed.append((min(u, v), max(u, v), w))
    rows = [(u, v, w) for u, v, w in ed] + [(v, u, w) for u, v, w in ed]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {(r["src"], r["dst"], r["weight"])
           for r in minimum_spanning_forest(spark, df).collect()}
    exp = _kruskal(n, ed)
    assert got == exp
    # forest-level invariants vs networkx (order-independent)
    nxw = sum(d["weight"] for _, _, d in nx.minimum_spanning_edges(
        nx.Graph([(u, v, {"weight": w}) for u, v, w in ed]), data=True))
    assert abs(sum(w for _, _, w in got) - nxw) < 1e-9
    ncomp = nx.number_connected_components(g)
    touched = {x for u, v, _ in ed for x in (u, v)}
    assert len(got) == len(touched) - (
        ncomp - (n - len(touched)))  # isolated nx vertices don't reach Spark


def test_msf_disconnected_and_multi_edge(spark):
    from vite_spark.algos.msf import minimum_spanning_forest

    rows = [
        # component A: triangle with a parallel edge (keep min weight)
        (1, 2, 5.0), (2, 1, 5.0), (1, 2, 2.0), (2, 1, 2.0),
        (2, 3, 1.0), (3, 2, 1.0), (1, 3, 4.0), (3, 1, 4.0),
        # component B: a single edge + self loop (dropped)
        (10, 11, 7.0), (11, 10, 7.0), (12, 12, 1.0),
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {(r["src"], r["dst"], r["weight"])
           for r in minimum_spanning_forest(spark, df).collect()}
    assert got == {(1, 2, 2.0), (2, 3, 1.0), (10, 11, 7.0)}


def test_msf_oracle_unroll_slack(spark):
    """The driver oracle replays MSF_ORACLE_ROUNDS Borůvka rounds; the
    engine at driver scale must converge with ≥1 round of slack."""
    from vite_spark.algos.msf import minimum_spanning_forest
    from vite_spark.derive import lineitem_part_edges
    from vite_spark.queries import MSF_ORACLE_ROUNDS
    from vite_spark.runtime.metrics import MetricsCollector

    m = MetricsCollector()
    e = lineitem_part_edges(spark, "/root/testdata/sf0.01")
    minimum_spanning_forest(spark, e, metrics=m).count()
    rounds = max(r["iter"] for r in m.rows if r["kind"] == "msf_round")
    assert rounds + 1 <= MSF_ORACLE_ROUNDS, rounds


def test_msf_contraction_tiers_agree(spark):
    """The driver-local broadcast contraction tier (default) and the
    distributed two-phase-CC tier (forced via a zero threshold) return
    the identical forest, and the metrics name which tier ran."""
    from vite_spark.algos.msf import minimum_spanning_forest
    from vite_spark.config import EngineConfig
    from vite_spark.runtime.metrics import MetricsCollector

    rng = random.Random(9)
    g = nx.gnm_random_graph(80, 240, seed=9)
    ed = [(min(u, v), max(u, v), float(rng.randint(1, 4)))
          for u, v in g.edges()]
    rows = ed + [(v, u, w) for u, v, w in ed]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")

    ml = MetricsCollector()
    local = {(r["src"], r["dst"], r["weight"]) for r in
             minimum_spanning_forest(spark, df, metrics=ml).collect()}
    assert {r["mode"] for r in ml.rows if r["kind"] == "msf_round"} \
        == {"boruvka_local_contract"}

    md = MetricsCollector()
    dist = {(r["src"], r["dst"], r["weight"]) for r in
            minimum_spanning_forest(
                spark, df, metrics=md,
                cfg=EngineConfig(msf_local_contract_max_rows=0)).collect()}
    assert {r["mode"] for r in md.rows if r["kind"] == "msf_round"} \
        == {"boruvka_cc_contract"}
    assert local == dist
