"""PageRank / CC / LPA / triangles: Spark vs NumPy/NetworkX references
(SURVEY.md §5.2 item 4 — allclose 1e-6 scores, exact labels)."""

from __future__ import annotations

import numpy as np
import pytest

from vite_spark import fixtures as fx
from vite_spark.algos.components import connected_components
from vite_spark.algos.lpa import label_propagation
from vite_spark.algos.pagerank import pagerank
from vite_spark.algos.triangles import triangle_count, triangles_per_vertex
from vite_spark.oracle.simple_ref import (
    connected_components_ref,
    lpa_ref,
    pagerank_ref,
    triangles_ref,
)


def _vec(df, nv, col, default=0):
    out = np.full(nv, default, dtype=np.float64)
    for r in df.collect():
        out[r["id"]] = r[col]
    return out


@pytest.fixture(scope="module")
def karate_np():
    return fx.karate()


@pytest.fixture(scope="module")
def karate_df(spark, karate_np):
    return fx.to_spark_edges(spark, karate_np)


def test_pagerank_matches_reference(spark, karate_np, karate_df):
    s, d, w, nv = karate_np
    ref = pagerank_ref(s, d, w, nv)
    got = _vec(pagerank(spark, karate_df), nv, "rank")
    assert np.allclose(got, ref, atol=1e-6)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_matches_dense_power_iteration(spark, karate_np, karate_df):
    """Independent check: dense Google-matrix power iteration (different
    code path from both the Spark impl and pagerank_ref)."""
    s, d, w, nv = karate_np
    A = np.zeros((nv, nv))
    for a, b in zip(s.tolist(), d.tolist()):
        A[a, b] += 1.0
    P = A / A.sum(axis=1, keepdims=True)
    r = np.full(nv, 1.0 / nv)
    for _ in range(500):
        r = 0.15 / nv + 0.85 * (P.T @ r)
    got = _vec(pagerank(spark, karate_df, tol=1e-10), nv, "rank")
    assert np.allclose(got, r, atol=1e-6)


def test_cc_two_components(spark):
    s, d, w, nv = fx.singleton_pairs(4)
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    got = _vec(connected_components(spark, edges), nv, "component").astype(int)
    ref = connected_components_ref(s, d, nv)
    assert np.array_equal(got, ref)
    assert len(set(got.tolist())) == 4


def test_cc_path_graph(spark):
    # path 0-1-2-...-19 plus isolated pair — exercises multi-iteration prop
    pairs = [(i, i + 1) for i in range(19)] + [(30, 31)]
    s, d, w, nv = fx._sym(pairs, 32)
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    got = _vec(connected_components(spark, edges), nv, "component").astype(int)
    ref = connected_components_ref(s, d, nv)
    # vertices 20..29 are isolated (absent from edges): engine only labels
    # edge-touching vertices; reference labels them identity — align
    present = sorted(set(s.tolist()) | set(d.tolist()))
    for v in present:
        assert got[v] == ref[v]
    assert got[0] == 0 and got[19] == 0 and got[31] == 30


def test_cc_twophase_diameter50(spark):
    """large-star/small-star on a diameter-50 path: identical labels to
    min-label propagation, in O(log² n) rounds (VERDICT r1 item 4)."""
    from vite_spark.algos.components import connected_components_twophase
    from vite_spark.runtime.metrics import MetricsCollector

    pairs = [(i, i + 1) for i in range(50)] + [(60, 61), (61, 62)]
    s, d, w, nv = fx._sym(pairs, 63)
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    m = MetricsCollector()
    got = _vec(
        connected_components_twophase(spark, edges, metrics=m), nv, "component"
    ).astype(int)
    ref = connected_components_ref(s, d, nv)
    present = sorted(set(s.tolist()) | set(d.tolist()))
    for v in present:
        assert got[v] == ref[v]
    rounds = sum(1 for r in m.rows if r.get("kind") == "cc2_round")
    assert rounds < 12, f"two-phase took {rounds} rounds on diameter 50"


def test_cc_twophase_matches_propagation(spark, karate_df, karate_np):
    from vite_spark.algos.components import connected_components_twophase

    s, d, w, nv = karate_np
    a = _vec(connected_components(spark, karate_df), nv, "component")
    b = _vec(connected_components_twophase(spark, karate_df), nv, "component")
    assert np.array_equal(a, b)


def test_lpa_matches_reference(spark, karate_np, karate_df):
    s, d, w, nv = karate_np
    ref = lpa_ref(s, d, w, nv, max_iter=10)
    got = _vec(label_propagation(spark, karate_df, max_iter=10), nv, "label").astype(int)
    assert np.array_equal(got, ref)


def test_triangles_karate(spark, karate_np, karate_df):
    s, d, w, nv = karate_np
    ref_per_v, ref_total = triangles_ref(s, d, nv)
    assert triangle_count(spark, karate_df) == ref_total == 45
    got = _vec(triangles_per_vertex(spark, karate_df), nv, "triangles").astype(int)
    assert np.array_equal(got, ref_per_v)


def test_triangles_with_selfloops_and_weights(spark):
    s, d, w, nv = fx.self_loops_triangle()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    assert triangle_count(spark, edges) == 1  # self-loops don't count
