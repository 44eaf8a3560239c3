"""Weisfeiler–Lehman color refinement — iterated structural fingerprints.

1-WL (color refinement, Weisfeiler & Lehman 1968; the modern treatment
is Shervashidze et al., JMLR 12, 2011 — WL graph kernels): start from a
degree label, then repeatedly relabel every vertex by (its own label,
the multiset of its neighbors' labels). After r rounds two vertices
share a label only if their radius-r neighborhood trees are isomorphic;
the partition refines monotonically and stabilizes in ≤ nv rounds. The
operator is the workhorse of structural dedup at corpus scale (near-
isomorphic subgraph detection without pairwise comparison — the label
multiset is a graph fingerprint) and the standard expressiveness
baseline for GNNs.

Vite has no WL; this extends the §2.8 analytics set alongside the other
fingerprint-flavored operators (SimHash, HyperANF's register sketches).

Two execution paths, bit-identical labels (pytest parity): the PACKED
kernel (kernels/csr_wl.py — one job per round over the sharded CSR pack
shared with k-core; certified 0.874 scaling efficiency 4→16 at 256M
rows, BENCH.md) is the single-box production path; the join path below
is the multi-cluster / open-input fallback.

Join-path design — every round is two shuffles of built-ins, no
Python in the hot path:

- labels live as one (id, lab) int64 DataFrame; the multiset signature
  is ORDER-INSENSITIVE, so it aggregates as a plain SUM of per-neighbor
  hashes — no sort, no collect_list. The sum runs in DECIMAL(38,0)
  (exact integer accumulation at any fan-in; int64 would wrap
  engine-dependently on hub vertices) and is folded back to uint32 by
  one pmod.
- the hash is the repo's Jenkins chain (algos/coloring.hash32_np —
  reference coloring.cpp:120-131) expressed directly in Spark SQL
  bitwise/arith built-ins (`_hash32_col`): xor/shift/add on int64 with
  a mod-2^32 guard after every step, bit-identical to the NumPy and
  DuckDB mirrors (same modular-arithmetic trick the CMS and sampling
  oracles validated). Whole-stage codegen keeps it JVM-side.
- per round: lab' = H(31·H(lab, s_t) + Σ_{u∈N(v)} H(lab_u, s_t) mod 2^32,
  s_t + 501) with s_t = seed + 1043·(t-1) (the coloring ladder's seed
  stride). Both H applications run on the label column in place: the
  chain is ~14 cheap codegen'd expressions, cheaper than hashing the
  distinct label set and joining back at any scale.

Collision honesty: labels are 32-bit images of the true WL signatures,
so distinct signatures can collide at ~n²/2³³ per round (birthday) —
~0.1 expected collisions at one million classes, negligible at driver
scale, and acceptable for fingerprint use (WL itself is a heuristic
refinement; a collision can only COARSEN the partition, never split a
true class). tests/test_wl.py pins the hashed partition equal to the
exact-signature partition on its fixtures.

100 TB shape: round cost = one edges ⋈ labels join (labels broadcast
below the engine's broadcast budget, else shuffle on the edge
partitioning) + one groupBy(src) with map-side partial DECIMAL sums.
State is O(nv) rows, never materialized on the driver; r rounds = 2r
shuffles over a reusable src partitioning.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from vite_spark.algos.coloring import hash32_np

M32 = 1 << 32
WL_SEED = 1012           # the coloring driver's round-1 seed
WL_SEED_STRIDE = 1043    # coloring.cpp hash-ladder stride
WL_COMBINE_OFFSET = 501  # second-stage seed offset within a round


def _hash32_col(c: Column, seed: int) -> Column:
    """coloring.cpp:120-131 Jenkins chain over a uint32-valued int64
    column, as Spark built-ins — bit-identical to hash32_np and to the
    queries.py DuckDB chain (all three stage the same mod-2^32
    arithmetic). Shifts use multiply/divide so every intermediate stays
    a plain non-negative int64 (shiftleft would need masking anyway)."""
    a = F.pmod(c.bitwiseXOR(F.lit(seed % M32)), F.lit(M32))
    a = F.pmod(a + F.lit(0x7ED55D16) + a * F.lit(4096), F.lit(M32))
    a = F.pmod(a.bitwiseXOR(F.lit(0xC761C23C))
               + F.floor(a / F.lit(1 << 19)).cast("long"), F.lit(M32))
    a = F.pmod(a + F.lit(0x165667B1) + a * F.lit(32), F.lit(M32))
    a = F.pmod(a.bitwiseXOR(F.lit(0xD3A2646C)) + a * F.lit(512),
               F.lit(M32))
    a = F.pmod(a + F.lit(0xFD7046C5) + a * F.lit(8), F.lit(M32))
    a = F.pmod(a.bitwiseXOR(F.lit(0xB55A4F09))
               + F.floor(a / F.lit(1 << 16)).cast("long"), F.lit(M32))
    return a


def _simple_undirected(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return (
        e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def wl_refine(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    seed: int = WL_SEED,
    return_profile: bool = False,
    metrics=None,
    cfg=None,
):
    """(id, lab) after ``rounds`` WL refinement rounds over the
    symmetrized simple graph of ``edges``; with ``return_profile`` also
    the (round, n_classes) refinement profile (round 0 = degree classes).
    Deterministic: fixed seed ladder, order-insensitive sums.

    Two paths, bit-identical labels (pytest parity):

    - **Packed kernel** (kernels/csr_wl.py): one job per round over the
      sharded CSR pack of the simple graph (shared with k-core's pack
      cache) — the csr_cc shape; single-box production path.
    - **Join path** (below): one edges ⋈ labels join + two hash
      aggregations per round, Jenkins chain fully in whole-stage
      codegen — the multi-cluster / open-input fallback."""
    from vite_spark.config import EngineConfig

    cfg = cfg or EngineConfig()
    und = _simple_undirected(edges)
    if cfg.use_csr_kernel and rounds >= 1:
        from vite_spark.kernels.csr_wl import csr_wl

        packed = csr_wl(
            spark, und.withColumn("weight", F.lit(1.0)), rounds,
            seed, WL_SEED_STRIDE, WL_COMBINE_OFFSET, cfg, metrics,
            want_profile=return_profile,
        )
        if packed is not None:
            labels, profile = packed
            return (labels, profile) if return_profile else labels
    und = und.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), "src"
    ).persist()
    labels = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("lab")
    ).persist()
    profile = [(0, labels.select("lab").distinct().count())] \
        if return_profile else None
    for t in range(1, rounds + 1):
        import time as _time

        t0 = _time.time()
        s_t = seed + WL_SEED_STRIDE * (t - 1)
        hashed = labels.select(
            "id", _hash32_col(F.col("lab"), s_t).alias("h"))
        nsum = (
            und.join(hashed.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            # exact integer accumulation at any fan-in, then fold to u32
            .agg(F.pmod(F.sum(F.col("h").cast("decimal(38,0)")),
                        F.lit(M32)).cast("long").alias("s"))
        )
        combined = hashed.join(nsum, hashed.id == nsum.src).select(
            hashed.id,
            F.pmod(F.col("h") * F.lit(31) + F.col("s"),
                   F.lit(M32)).alias("k2"),
        )
        new_labels = combined.select(
            "id",
            _hash32_col(F.col("k2"), s_t + WL_COMBINE_OFFSET).alias("lab"),
        ).persist()
        new_labels.count()
        labels.unpersist()
        labels = new_labels
        if metrics is not None:
            metrics.record(kind="wl_round", iter=t,
                           wall_s=_time.time() - t0, mode="wl_hashagg_join")
        if return_profile:
            profile.append((t, labels.select("lab").distinct().count()))
    und.unpersist()
    if return_profile:
        return labels, profile
    return labels


def wl_refine_numpy(src: np.ndarray, dst: np.ndarray, rounds: int,
                    seed: int = WL_SEED):
    """Independent NumPy mirror of wl_refine over an already-symmetrized
    simple edge list (test oracle; also documents the algebra in one
    screen). Returns (ids, labs)."""
    ids = np.unique(src)
    idx = np.searchsorted(ids, src)
    lab = np.bincount(idx, minlength=len(ids)).astype(np.int64)
    didx = np.searchsorted(ids, dst)
    for t in range(1, rounds + 1):
        s_t = seed + WL_SEED_STRIDE * (t - 1)
        h = hash32_np(lab, s_t).astype(np.int64)
        # exact: per-vertex neighbor sums fit int64 far beyond any test
        # scale (deg < 2^31 ⇒ sum < 2^63); fold to u32 to mirror pmod
        nsum = np.zeros(len(ids), np.int64)
        np.add.at(nsum, idx, h[didx])
        k2 = (h * 31 + (nsum % M32)) % M32
        lab = hash32_np(k2, s_t + WL_COMBINE_OFFSET).astype(np.int64)
    return ids, lab


def wl_exact_partition(src: np.ndarray, dst: np.ndarray, rounds: int):
    """EXACT WL partition (true signatures, no hashing): per round each
    vertex's class id is the dense rank of (own class, sorted neighbor
    class multiset). Test oracle for collision-freedom of the hashed
    labels."""
    ids = np.unique(src)
    idx = np.searchsorted(ids, src)
    didx = np.searchsorted(ids, dst)
    cls = np.unique(np.bincount(idx, minlength=len(ids)),
                    return_inverse=True)[1]
    for _ in range(rounds):
        sigs = [(int(cls[v]), tuple(sorted(cls[didx[idx == v]])))
                for v in range(len(ids))]
        uniq = {s: i for i, s in enumerate(sorted(set(sigs)))}
        cls = np.array([uniq[s] for s in sigs], np.int64)
    return ids, cls
