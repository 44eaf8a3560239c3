"""Deterministic sampling (vite_spark/sampling.py): the column-expression
hash must be BIT-IDENTICAL to the NumPy reference mixer, and both
operators must be layout-independent."""

from __future__ import annotations

import numpy as np


def test_hash32_col_bit_equals_numpy(spark):
    from vite_spark.algos.coloring import hash32_np
    from vite_spark.sampling import hash32_col

    from pyspark.sql import functions as F

    ids = np.concatenate([
        np.arange(0, 2000, 7, dtype=np.int64),
        np.array([0, 1, (1 << 31) - 1, 1 << 31, (1 << 32) - 1,
                  (1 << 32) + 5, (1 << 40) + 123], dtype=np.int64),
    ])
    for seed in (2024, 0, 0xDEADBEEF):
        df = spark.createDataFrame([(int(i),) for i in ids], "id long")
        got = {r["id"]: r["h"] for r in df.select(
            "id", hash32_col(F.col("id"), seed).alias("h")).collect()}
        want = hash32_np(ids % (1 << 32), seed).astype(np.int64)
        for i, w in zip(ids, want):
            assert got[int(i)] == int(w), (i, seed)


def test_hash_sample_rate_and_stability(spark):
    from vite_spark.sampling import hash_sample

    n = 20000
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = hash_sample(df, "doc_id", 0.25, seed=7)
    ids1 = {r["doc_id"] for r in out.collect()}
    # uniformity: within 3 sigma of the Bernoulli expectation
    exp, sig = 0.25 * n, (0.25 * 0.75 * n) ** 0.5
    assert abs(len(ids1) - exp) < 3 * sig
    # layout independence: same set after an adversarial repartition
    ids2 = {r["doc_id"] for r in
            hash_sample(df.repartition(17, "doc_id"), "doc_id", 0.25,
                        seed=7).collect()}
    assert ids1 == ids2
    # monotone in rate: the 10% sample is a subset of the 25% one
    ids3 = {r["doc_id"] for r in
            hash_sample(df, "doc_id", 0.10, seed=7).collect()}
    assert ids3 < ids1


def test_stratified_sample_quotas(spark):
    from vite_spark.algos.coloring import hash32_np
    from vite_spark.sampling import stratified_sample

    rows = [(i, "abc"[i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = stratified_sample(df, "stratum", "doc_id", 10, seed=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r)
    assert set(per) == {"a", "b", "c"}
    h = hash32_np(np.arange(300, dtype=np.int64), 5)
    for s, rs in per.items():
        assert len(rs) == 10
        members = sorted((int(h[i]), i) for i, st in rows if st == s)[:10]
        got = sorted((r["__h"], r["doc_id"]) for r in rs)
        assert got == members
        assert sorted(r["__rk"] for r in rs) == list(range(1, 11))
