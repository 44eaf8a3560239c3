"""NumPy reference implementations for PageRank / CC / LPA / triangles.

Deterministic, synchronous semantics matching the Spark implementations
exactly (same update rules, same tie-breaks), used by pytest as the
correctness oracle (allclose 1e-6 for scores, exact equality for labels).
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(src, dst, w, nv, damping=0.85, tol=1e-6, max_iter=100,
                 weighted=False):
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64) if weighted else np.ones(len(src))
    out_w = np.bincount(src, weights=w, minlength=nv)
    has_out = out_w > 0
    p = np.where(has_out[src], w / out_w[src], 0.0)
    r = np.full(nv, 1.0 / nv)
    base = (1.0 - damping) / nv
    for _ in range(max_iter):
        inflow = np.bincount(dst, weights=p * r[src], minlength=nv)
        dangling = 1.0 - r[has_out].sum()
        r_new = base + damping * (inflow + dangling / nv)
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return r


def connected_components_ref(src, dst, nv):
    labels = np.arange(nv, dtype=np.int64)
    while True:
        nbr_min = np.full(nv, np.iinfo(np.int64).max)
        np.minimum.at(nbr_min, src, labels[dst])
        new = np.minimum(labels, np.where(nbr_min == np.iinfo(np.int64).max,
                                          labels, nbr_min))
        if np.array_equal(new, labels):
            return labels
        labels = new


def lpa_ref(src, dst, w, nv, max_iter=20):
    """Synchronous LPA, argmax by (max weighted vote, min label)."""
    m = src != dst
    src, dst, w = src[m], dst[m], np.asarray(w, dtype=np.float64)[m]
    labels = np.arange(nv, dtype=np.int64)
    for _ in range(max_iter):
        lv = labels[dst]
        key = src * np.int64(nv) + lv
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        start = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        votes = np.add.reduceat(ws, start)
        gs = (ks[start] // nv).astype(np.int64)
        gl = (ks[start] % nv).astype(np.int64)
        sel = np.lexsort((gl, -votes, gs))
        gs_s, gl_s = gs[sel], gl[sel]
        first = np.flatnonzero(np.r_[True, gs_s[1:] != gs_s[:-1]])
        new = labels.copy()
        new[gs_s[first]] = gl_s[first]
        if np.array_equal(new, labels):
            return labels
        labels = new
    return labels


def triangles_ref(src, dst, nv):
    """(per-vertex counts, global count) via adjacency-set intersection."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(nv))
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            g.add_edge(a, b)
    t = nx.triangles(g)
    per_vertex = np.array([t[i] for i in range(nv)], dtype=np.int64)
    return per_vertex, int(per_vertex.sum() // 3)
