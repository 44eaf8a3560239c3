"""Deterministic fixture graphs (FIXTURES.md F4) as NumPy COO arrays.

Each returns (src, dst, weight, nv) in the canonical symmetrized
convention: both directions for u≠v, self-loops once.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _sym(pairs, nv, weights=None):
    pairs = np.asarray(pairs, dtype=np.int64)
    u, v = pairs[:, 0], pairs[:, 1]
    w = np.ones(len(pairs)) if weights is None else np.asarray(weights, dtype=np.float64)
    loops = u == v
    src = np.r_[u, v[~loops]]
    dst = np.r_[v, u[~loops]]
    ww = np.r_[w, w[~loops]]
    # combine duplicates
    key = src * np.int64(nv) + dst
    order = np.argsort(key, kind="stable")
    ks, ws = key[order], ww[order]
    start = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    w2 = np.add.reduceat(ws, start)
    s2 = (ks[start] // nv).astype(np.int64)
    d2 = (ks[start] % nv).astype(np.int64)
    return s2, d2, w2, nv


def karate():
    """Zachary karate club, unit weights (reference README:137 canonical)."""
    import networkx as nx

    g = nx.karate_club_graph()
    return _sym(list(g.edges()), g.number_of_nodes())


def two_cliques(k: int = 5):
    """Two K_k cliques joined by one bridge edge — obvious 2 communities."""
    pairs = []
    for b in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                pairs.append((b + i, b + j))
    pairs.append((0, k))
    return _sym(pairs, 2 * k)


def ring(n: int = 8):
    """n-cycle, unit weights — exercises equal-gain tie-breaking."""
    return _sym([(i, (i + 1) % n) for i in range(n)], n)


def singleton_pairs(n_pairs: int = 4):
    """Disjoint edges — exercises the singleton-swap guard."""
    return _sym([(2 * i, 2 * i + 1) for i in range(n_pairs)], 2 * n_pairs)


def self_loops_triangle():
    """Triangle with self-loops of varying weight (louvain.cpp:2438-2439)."""
    pairs = [(0, 1), (1, 2), (0, 2), (0, 0), (1, 1), (2, 2)]
    w = [1.0, 1.0, 1.0, 0.5, 2.0, 0.25]
    return _sym(pairs, 3, w)


def weighted_star(leaves: int = 12):
    """Hub + leaves, weights 0.01..~1.0 — degree skew + weighted gains."""
    pairs = [(0, i + 1) for i in range(leaves)]
    w = [0.01 + 0.99 * i / max(leaves - 1, 1) for i in range(leaves)]
    return _sym(pairs, leaves + 1, w)


def planted_partition(blocks: int = 4, per_block: int = 32, p_in: float = 0.3,
                      p_out: float = 0.02, seed: int = 42):
    """Seeded SBM (lfr_like fixture) + ground-truth labels."""
    rng = np.random.default_rng(seed)
    nv = blocks * per_block
    truth = np.repeat(np.arange(blocks), per_block)
    pairs = []
    for i in range(nv):
        for j in range(i + 1, nv):
            p = p_in if truth[i] == truth[j] else p_out
            if rng.random() < p:
                pairs.append((i, j))
    s, d, w, _ = _sym(pairs, nv)
    return s, d, w, nv, truth


def grid_graph(rows: int = 20, cols: int = 20):
    """rows×cols lattice — larger deterministic fixture for perf tests."""
    pairs = []
    for r in range(rows):
        for c in range(cols):
            v = r * cols + c
            if c + 1 < cols:
                pairs.append((v, v + 1))
            if r + 1 < rows:
                pairs.append((v, v + cols))
    return _sym(pairs, rows * cols)


def repos_table(n_repos: int = 40, rows_per_repo: int = 10, shared_frac: float = 0.3,
                seed: int = 42):
    """F1 synthetic repos table rows: (repo, path, commit, lang, content).

    Deterministic; a fraction of paths is drawn from a shared vocabulary to
    create co-occurrence edges.
    """
    rng = np.random.default_rng(seed)
    langs = ["py", "c", "cpp", "java", "go", "rs"]
    shared_vocab = [f"src/common/util{i}.h" for i in range(12)]
    rows = []
    for r in range(n_repos):
        repo = f"repo{r:04d}"
        for i in range(rows_per_repo):
            if rng.random() < shared_frac:
                path = shared_vocab[int(rng.integers(len(shared_vocab)))]
            else:
                path = f"src/{repo}/file{i}.c"
            commit = hashlib.sha256(f"{repo}:{i}".encode()).hexdigest()[:40]
            lang = langs[int(rng.integers(len(langs)))]
            content = f"// {repo} {path} {commit}\nint f{i}() {{ return {i}; }}\n"
            rows.append((repo, path, commit, lang, content))
    return rows


def to_spark_edges(spark, fixture):
    """(src, dst, w, nv) → canonical Spark edge DataFrame."""
    s, d, w = fixture[0], fixture[1], fixture[2]
    import pandas as pd

    pdf = pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"),
                        "weight": w.astype("float64")})
    return spark.createDataFrame(pdf)
