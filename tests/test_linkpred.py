"""Link prediction (algos/linkpred.py) vs networkx ground truth, plus the
center-degree-cap scale contract."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from vite_spark.algos.linkpred import link_prediction_topk


def _rand_graph(seed: int, n: int = 60, p: float = 0.15):
    rng = np.random.default_rng(seed)
    a, b = np.nonzero(np.triu(rng.random((n, n)) < p, k=1))
    return a.astype(np.int64), b.astype(np.int64)


def _edges_df(spark, a, b):
    return spark.createDataFrame(pd.DataFrame({
        "src": np.r_[a, b], "dst": np.r_[b, a],
        "weight": np.ones(2 * len(a)),
    }))


def test_linkpred_matches_networkx(spark):
    """Uncapped scores on a random graph ≡ networkx's jaccard /
    adamic_adar / preferential_attachment over every non-edge."""
    import networkx as nx

    a, b = _rand_graph(7)
    g = nx.Graph()
    g.add_edges_from(zip(a.tolist(), b.tolist()))
    nonedges = [(u, v) for u, v in nx.non_edges(g)]
    want_j = {(min(u, v), max(u, v)): s
              for u, v, s in nx.jaccard_coefficient(g, nonedges)}
    want_aa = {(min(u, v), max(u, v)): s
               for u, v, s in nx.adamic_adar_index(g, nonedges)}
    want_pa = {(min(u, v), max(u, v)): s
               for u, v, s in nx.preferential_attachment(g, nonedges)}

    got = {(r["u"], r["v"]): r for r in link_prediction_topk(
        spark, _edges_df(spark, a, b), k=10 ** 9).collect()}
    # engine emits only cn ≥ 1 pairs; networkx nonedges with cn = 0
    # score 0 on jaccard/aa — check engine rows exactly, and that every
    # missing nonedge is a genuinely 0-cn pair
    for (u, v), r in got.items():
        assert math.isclose(r["jaccard"], want_j[(u, v)], rel_tol=1e-12)
        assert abs(r["aa"] - want_aa[(u, v)]) < 1.5e-6   # engine rounds to 6
        assert r["pa"] == want_pa[(u, v)]
        assert r["cn"] == len(list(nx.common_neighbors(g, u, v)))
    for (u, v), s in want_j.items():
        if (u, v) not in got:
            assert s == 0.0


def test_linkpred_topk_order_and_adjacency(spark):
    """Top-k is (cn DESC, u, v) and never contains an existing edge."""
    a, b = _rand_graph(11)
    df = link_prediction_topk(spark, _edges_df(spark, a, b), k=20)
    rows = df.collect()
    assert len(rows) == 20
    keys = [(-r["cn"], r["u"], r["v"]) for r in rows]
    assert keys == sorted(keys)
    es = set(zip(a.tolist(), b.tolist()))
    assert all((r["u"], r["v"]) not in es for r in rows)


def test_linkpred_center_cap_binds(spark):
    """A hub star-center beyond the cap contributes NO wedges: on a star
    K_{1,n} plus a triangle edge (0,1) and a pendant 200-0, capping out
    the hub (deg 12) at cap=3 leaves only the wedges through spoke 0
    (deg 3) — pairs (1,200) and (hub,200)."""
    n = 12
    hub, pend = 100, 200
    spokes = list(range(n))
    a = np.array([hub] * n + [0, pend], dtype=np.int64)
    b = np.array(spokes + [1, 0], dtype=np.int64)
    edges = _edges_df(spark, a, b)

    uncapped = {(r["u"], r["v"]): r["cn"] for r in link_prediction_topk(
        spark, edges, k=10 ** 9).collect()}
    # hub wedges: every spoke pair except the (0,1) edge; spoke-0 wedges:
    # (1,hub) and (0,hub) are edges (excluded), (1,200) and (hub,200) are
    # genuine non-adjacent distance-2 pairs
    assert uncapped[(2, 3)] == 1
    assert (0, 1) not in uncapped          # existing edge, excluded
    assert (1, hub) not in uncapped        # also an existing edge
    assert uncapped[(1, pend)] == 1        # wedge through spoke 0
    assert uncapped[(hub, pend)] == 1

    capped = {(r["u"], r["v"]): r["cn"] for r in link_prediction_topk(
        spark, edges, k=10 ** 9, max_center_degree=3).collect()}
    # hub (deg 12) capped out: spoke-pair wedges gone; spoke 0 (deg 3)
    # still a valid center, so its two non-adjacent wedge pairs survive
    assert (2, 3) not in capped
    assert capped == {(1, pend): 1, (hub, pend): 1}


def test_linkpred_cap_does_not_bind_on_driver_graph(spark):
    """The driver graph's max simple degree sits below LINKPRED_CAP, so
    the capped definition equals the classical one there."""
    from pyspark.sql import functions as F

    from vite_spark.derive import lineitem_part_edges
    from vite_spark.queries import LINKPRED_CAP

    e = lineitem_part_edges(spark, "/root/testdata/sf0.001")
    und = e.select("src", "dst").filter(
        F.col("src") != F.col("dst")).distinct()
    mx = und.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert mx <= LINKPRED_CAP // 2, f"cap slack eroded: max degree {mx}"
