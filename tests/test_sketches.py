"""Count-min sketch heavy hitters (text/sketches.py) vs a pure-Python
replay of the same sketch, plus the CMS overestimate invariant."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from vite_spark.algos.coloring import hash32_np
from vite_spark.text.sketches import CMS_D, CMS_SEED, CMS_W, cms_heavy_hitters


def _replay(texts, d=CMS_D, w=CMS_W, seed=CMS_SEED, k=20):
    cnt = collections.Counter()
    for t in texts:
        cnt.update(t.split(" "))
    vocab = {tok: i for i, tok in enumerate(sorted(cnt))}
    cells = [collections.Counter() for _ in range(d)]
    buckets = {}
    for tok, tid in vocab.items():
        bs = []
        for r in range(d):
            h = int(hash32_np(np.array([tid], np.int64), seed + 1043 * r)[0])
            bs.append(h % w)
            cells[r][bs[-1]] += cnt[tok]
        buckets[tok] = bs
    est = {tok: min(cells[r][b] for r, b in enumerate(bs))
           for tok, bs in buckets.items()}
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(tok, n, est[tok]) for tok, n in top]


def _docs_df(spark, texts):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))


def test_cms_matches_replay(spark):
    rng = np.random.default_rng(19)
    words = [f"w{i}" for i in range(300)]
    # zipf-ish corpus: heavy head, long tail
    texts = [" ".join(rng.choice(words, p=None, size=40,
                                 replace=True).tolist())
             for _ in range(50)]
    texts += ["hot " * 200 + "end"]  # a guaranteed heavy hitter
    got = [(r["term"], r["n"], r["cms_est"]) for r in
           cms_heavy_hitters(_docs_df(spark, texts), k=20)
           .orderBy("term").collect()]
    want = sorted(_replay(texts, k=20))
    assert got == want


def test_cms_never_underestimates(spark):
    texts = ["a a a b c", "b c d d d d", "e " * 50]
    rows = cms_heavy_hitters(_docs_df(spark, texts), k=100).collect()
    assert rows, "no terms"
    for r in rows:
        assert r["cms_est"] >= r["n"], (r["term"], r["cms_est"], r["n"])
    # the unambiguous heavy hitter leads the report
    top = max(rows, key=lambda r: r["n"])
    assert top["term"] == "e" and top["n"] == 50
