"""Deterministic sampling — reproducible subsets with no RNG state.

Training pipelines need samples that are stable across runs, engines,
partitionings, and retries ("the same 10% every time", "exactly K docs
per language"): Spark's ``df.sample`` is none of those. Both operators
here key the decision on the repo's bit-exact 32-bit mixer
(coloring.cpp:120-131, the same chain the coloring and CMS oracles
validated cross-engine), expressed as PURE BUILT-IN column arithmetic —
whole-stage codegen, no Python, no shuffle for the Bernoulli form.

- ``hash_sample``: keep a row iff hash32(key, seed) < rate·2³² — a
  Bernoulli sample that is a FILTER (predicate-pushdown friendly; at
  100 TB the sample decision rides the scan).
- ``stratified_sample``: the K smallest hash values per stratum — exact
  per-stratum quotas, one window partitioned by stratum (rows per
  partition = the stratum's size; cap/salt upstream for degenerate
  strata like every per-key op here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_M = 1 << 32
_C = [0x7ED55D16, 0xC761C23C, 0x165667B1, 0xD3A2646C, 0xFD7046C5, 0xB55A4F09]


def hash32_col(col: Column, seed: int) -> Column:
    """coloring.cpp:120-131 on a long column via modular arithmetic —
    bit-identical to coloring.hash32_np and the SQL oracle chain (every
    intermediate reduced mod 2³², shifts on the reduced nonnegative
    value)."""
    a = F.pmod(col.cast("long"), F.lit(_M)).bitwiseXOR(F.lit(seed % _M))
    a = (a + _C[0] + a * 4096) % _M
    a = (a.bitwiseXOR(F.lit(_C[1])) + F.shiftright(a, 19)) % _M
    a = (a + _C[2] + a * 32) % _M
    a = (a.bitwiseXOR(F.lit(_C[3])) + a * 512) % _M
    a = (a + _C[4] + a * 8) % _M
    a = (a.bitwiseXOR(F.lit(_C[5])) + F.shiftright(a, 16)) % _M
    return a


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 2024
) -> DataFrame:
    """Rows whose hash32(key, seed) < ⌊rate·2³²⌋, with the hash attached
    as ``__h`` (so the sample decision itself is value-checkable)."""
    thr = int(rate * _M)
    h = hash32_col(F.col(key_col), seed)
    return df.withColumn("__h", h).filter(F.col("__h") < thr)


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, k: int, seed: int = 2024
) -> DataFrame:
    """The ``k`` rows with the smallest (hash32(key, seed), key) per
    stratum — exact quotas, deterministic under any layout; ``__h`` and
    the 1-based ``__rk`` rank are attached."""
    h = hash32_col(F.col(key_col), seed)
    w = Window.partitionBy(stratum_col).orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__rk", F.row_number().over(w).cast("long"))
        .filter(F.col("__rk") <= k)
    )
