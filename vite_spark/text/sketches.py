"""Count-min sketch of corpus term frequencies + heavy hitters.

The CMS (Cormode–Muthukrishnan 2005) is the standard fixed-memory
frequency summary for streaming/100 TB corpora: d hash rows × w buckets
of counters; est(x) = min_r cell[r][b_r(x)] ≥ true count, with
overestimate ≤ ε·N at probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

DETERMINISM (the HyperANF discipline, algos/anf.py): bucket hashes are
the repo's bit-exact Jenkins mix (algos/coloring.hash32_np) over the
corpus-ordered dense token ids at seed + 1043·r per row (the coloring
kernel's multi-hash seed schedule), and every counter is an exact int64
sum — the whole sketch, and therefore the heavy-hitter report, is
bit-identical across engines and driver-oracled exactly in SQL.

Plan / scale notes: exact per-token counts are one map-side-combinable
groupBy; the sketch itself is d·w cells regardless of corpus size (one
groupBy over d rows per distinct token, NOT per occurrence); the
estimate join broadcasts the d×w cell table. At true 100 TB the exact
top-k groupBy is the expensive side and the CMS becomes the candidate
filter (est ≥ threshold prunes the vocabulary before the exact pass) —
here both sides are emitted so the driver oracle checks the estimator
against ground truth row by row.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from vite_spark.algos.coloring import hash32_np
from vite_spark.kernels.ids import dense_ids
from vite_spark.text.analysis import tokens

CMS_D = 4          # hash rows (δ ≈ e^-4 < 2%)
CMS_W = 256        # buckets per row
CMS_SEED = 0x00C0FFEE  # fixed: the sketch is part of the contract


def token_buckets(vocab: DataFrame, d: int = CMS_D, w: int = CMS_W,
                  seed: int = CMS_SEED) -> DataFrame:
    """(tid, r, b): each token's bucket in each of the ``d`` hash rows —
    b_r(tid) = hash32(tid, seed + 1043·r) mod w. One Arrow pass."""
    out_schema = StructType([
        StructField("tid", LongType(), False),
        StructField("r", IntegerType(), False),
        StructField("b", IntegerType(), False),
    ])

    def compute(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            tids = pdf["tid"].to_numpy(np.int64)
            frames = []
            for r in range(d):
                h = hash32_np(tids, seed + 1043 * r).astype(np.int64)
                frames.append(pd.DataFrame({
                    "tid": tids,
                    "r": np.full(len(tids), r, np.int32),
                    "b": (h % w).astype(np.int32),
                }))
            yield pd.concat(frames, ignore_index=True)

    return vocab.select("tid").mapInPandas(compute, schema=out_schema)


def cms_heavy_hitters(docs: DataFrame, k: int = 20, d: int = CMS_D,
                      w: int = CMS_W, seed: int = CMS_SEED,
                      text_col: str = "text") -> DataFrame:
    """(term, n, cms_est): the top-``k`` corpus terms by exact occurrence
    count (ties → term ASC) with their count-min estimate. All-integer —
    cms_est ≥ n always (CMS never underestimates), equality iff the
    token collides with nothing heavier in some row."""
    tk = tokens(docs, text_col).select("tok")
    cnt = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = dense_ids(cnt.select("tok"), "tok", out_col="tid")
    tid_cnt = cnt.join(vocab, "tok")
    buckets = token_buckets(vocab, d, w, seed)
    cells = (
        tid_cnt.join(buckets, "tid")
        .groupBy("r", "b")
        .agg(F.sum("n").alias("cell"))
    )
    est = (
        buckets.join(F.broadcast(cells), ["r", "b"])
        .groupBy("tid")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        tid_cnt.join(est, "tid")
        .select(F.col("tok").alias("term"), "n", "cms_est")
        .orderBy(F.desc("n"), "term")
        .limit(k)
    )
