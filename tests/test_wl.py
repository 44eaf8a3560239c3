"""Weisfeiler–Lehman color refinement (algos/wl.py).

- Spark path ≡ independent NumPy mirror bit-exactly (same hash ladder,
  decimal-exact sums).
- hashed labels induce EXACTLY the true-signature WL partition on the
  fixtures (no 32-bit collision at test scale, and no spurious merges).
- isomorphism invariance: a vertex relabeling permutes ids but leaves
  the label MULTISET identical — the fingerprint property.
- refinement profile is monotone (classes never decrease) and stabilizes.
"""

from __future__ import annotations

import collections

import numpy as np
import pytest

from vite_spark.algos.wl import (
    wl_exact_partition,
    wl_refine,
    wl_refine_numpy,
)


def _rand_sym_edges(n, m, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _partition(keys, values):
    d = collections.defaultdict(list)
    for k, v in zip(keys, values):
        d[v].append(int(k))
    return sorted(tuple(sorted(g)) for g in d.values())


def _spark_df(spark, src, dst):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst, "weight": 1.0}))


def test_spark_matches_numpy_mirror(spark):
    src, dst = _rand_sym_edges(80, 400, seed=3)
    labels, profile = wl_refine(
        spark, _spark_df(spark, src, dst), rounds=3, return_profile=True)
    got = {int(r["id"]): int(r["lab"]) for r in labels.collect()}
    ids, labs = wl_refine_numpy(src, dst, rounds=3)
    assert got == {int(i): int(l) for i, l in zip(ids, labs)}
    # profile counts match the NumPy label sets per round
    for r, n_classes in profile:
        _, lr = wl_refine_numpy(src, dst, rounds=r)
        assert n_classes == len(set(lr.tolist()))


def test_hashed_equals_exact_partition(spark):
    for seed in (1, 5, 9):
        src, dst = _rand_sym_edges(60, 260, seed=seed)
        ids, labs = wl_refine_numpy(src, dst, rounds=3)
        ids2, cls = wl_exact_partition(src, dst, rounds=3)
        assert np.array_equal(ids, ids2)
        assert _partition(ids, labs.tolist()) == _partition(
            ids2, cls.tolist())


def test_directed_multi_self_input_simplified(spark):
    # raw directed rows with self loops and duplicates: the operator
    # symmetrizes/simplifies, so the result equals the clean graph's
    src = np.array([0, 1, 1, 2, 2, 2])
    dst = np.array([1, 2, 2, 0, 2, 1])
    labels = wl_refine(spark, _spark_df(spark, src, dst), rounds=2)
    got = {int(r["id"]): int(r["lab"]) for r in labels.collect()}
    csrc = np.array([0, 1, 1, 0, 2, 1, 2, 0])
    cdst = np.array([1, 0, 2, 2, 0, 2, 1, 1])
    pairs = np.unique(np.stack([csrc, cdst], 1), axis=0)
    ids, labs = wl_refine_numpy(pairs[:, 0], pairs[:, 1], rounds=2)
    assert got == {int(i): int(l) for i, l in zip(ids, labs)}


def test_isomorphism_invariance():
    src, dst = _rand_sym_edges(50, 200, seed=11)
    rng = np.random.default_rng(0)
    perm = rng.permutation(int(max(src.max(), dst.max())) + 1)
    ids1, l1 = wl_refine_numpy(src, dst, rounds=3)
    ids2, l2 = wl_refine_numpy(perm[src], perm[dst], rounds=3)
    assert sorted(l1.tolist()) == sorted(l2.tolist())
    # and the map is consistent vertex-wise through the permutation
    m2 = dict(zip(ids2.tolist(), l2.tolist()))
    assert all(m2[int(perm[i])] == int(l)
               for i, l in zip(ids1.tolist(), l1.tolist()))


def test_profile_monotone_and_distinguishes():
    # two 6-cycles vs one 12-cycle: degree classes identical (all deg 2)
    # and WL cannot distinguish them either (both 2-regular) — the
    # canonical 1-WL blind spot, kept as a documented negative control.
    c6x2_src = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
    c6x2_dst = np.array([1, 2, 3, 4, 5, 0, 7, 8, 9, 10, 11, 6])
    c12_src = np.arange(12)
    c12_dst = (np.arange(12) + 1) % 12

    def sym(s, d):
        return np.concatenate([s, d]), np.concatenate([d, s])

    _, la = wl_refine_numpy(*sym(c6x2_src, c6x2_dst), rounds=3)
    _, lb = wl_refine_numpy(*sym(c12_src, c12_dst), rounds=3)
    assert sorted(la.tolist()) == sorted(lb.tolist())
    # a path graph DOES refine: endpoints/inner vertices separate and
    # classes grow monotonically until the partition stabilizes
    p_src = np.arange(9)
    p_dst = np.arange(1, 10)
    s, d = sym(p_src, p_dst)
    counts = []
    for r in range(5):
        _, cls = wl_exact_partition(s, d, rounds=r)
        counts.append(len(set(cls.tolist())))
    assert counts == sorted(counts)
    assert counts[0] == 2 and counts[-1] == 5  # mirror-symmetric pairs


@pytest.mark.parametrize("rounds", [0, 1])
def test_small_rounds(spark, rounds):
    src, dst = _rand_sym_edges(30, 100, seed=2)
    labels = wl_refine(spark, _spark_df(spark, src, dst), rounds=rounds)
    got = {int(r["id"]): int(r["lab"]) for r in labels.collect()}
    ids, labs = wl_refine_numpy(src, dst, rounds=rounds)
    assert got == {int(i): int(l) for i, l in zip(ids, labs)}


def test_packed_equals_join_path(spark):
    """The packed kernel (csr_wl) and the codegen join path produce
    bit-identical labels and profiles; metrics name which path ran."""
    from vite_spark.config import EngineConfig
    from vite_spark.runtime.metrics import MetricsCollector

    src, dst = _rand_sym_edges(100, 500, seed=7)
    df = _spark_df(spark, src, dst)

    mp = MetricsCollector()
    lab_p, prof_p = wl_refine(
        spark, df, rounds=3, return_profile=True, metrics=mp,
        cfg=EngineConfig(use_csr_kernel=True))
    assert {r["mode"] for r in mp.rows if r.get("kind") == "wl_round"} \
        == {"wl_csr_sharded"}

    mj = MetricsCollector()
    lab_j, prof_j = wl_refine(
        spark, df, rounds=3, return_profile=True, metrics=mj,
        cfg=EngineConfig(use_csr_kernel=False))
    assert {r["mode"] for r in mj.rows if r.get("kind") == "wl_round"} \
        == {"wl_hashagg_join"}

    as_dict = lambda labels: {int(r["id"]): int(r["lab"])
                              for r in labels.collect()}
    assert as_dict(lab_p) == as_dict(lab_j)
    assert prof_p == prof_j
