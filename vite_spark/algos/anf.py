"""HyperANF: the approximate neighborhood function via HyperLogLog
register merging (Boldi–Rosa–Vigna WWW'11, on Palmer et al.'s ANF).

The neighborhood function NF(h) = |{(u,v) : dist(u,v) ≤ h}| is the
canonical whole-graph distance summary (effective diameter, median
distance, spid). Exact NF needs all-pairs BFS — O(nv·ne), never viable at
web scale. HyperANF keeps one HyperLogLog counter per vertex (m = 2^b
registers of ≤ 5 bits) and iterates

    c_h(v) = max-merge( c_{h-1}(v), c_{h-1}(u) for (u,v) ∈ E )

— after h rounds c_h(v) sketches |ball(v, h)| and NF̂(h) = Σ_v Ê(c_h(v)).
State is nv·m small integers; each superstep is one edge join + groupBy
MAX with map-side combine — the published MapReduce/Spark HyperANF shape,
and the state (not the ball!) is what shuffles, so the cost per superstep
is O(ne·m/word) independent of ball sizes.

DETERMINISM (what makes this driver-oracle-able): the vertex hash is the
repo's bit-exact Jenkins mix (algos/coloring.hash32_np) at a fixed seed,
bucket = low b bits, ρ = trailing zeros of the remaining bits + 1 —
integer registers, integer maxes, and an estimate whose inner sum
Σ 2^(-M_j) + V is EXACT in float64 (≤ m dyadic rationals). The raw
estimate α_m·m²/s is therefore bit-identical across engines; only the
small-range linear-counting branch (m·ln(m/V)) carries an engine ln ulp,
absorbed by the repo's round-6 emit convention. The per-vertex estimates
are summed as DECIMAL(38,8) so NF̂ is order-independent too.

Standard HLL bias constants (Flajolet et al. 2007): α_16 = 0.673,
α_32 = 0.697, α_64 = 0.709, else 0.7213/(1 + 1.079/m); small-range
correction switches to linear counting m·ln(m/V) when raw ≤ 2.5m and
empty registers remain.

No Vite counterpart — §2.8 sketch-analytics extension (the "novel sketch"
class from the round brief).
"""

from __future__ import annotations

import time

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from vite_spark.algos.coloring import hash32_np
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector

ANF_B = 4                 # 2^4 = 16 registers per vertex
ANF_M = 1 << ANF_B
ANF_SEED = 0x5EED0A0F     # fixed: the sketch is part of the contract
ANF_H = 8                 # supersteps (truncated-ball contract)


def hll_alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def vertex_registers(verts: DataFrame, b: int = ANF_B,
                     seed: int = ANF_SEED) -> DataFrame:
    """(id, j, r): each vertex's own HLL contribution — bucket j = low b
    bits of hash32(id), ρ = trailing zeros of the remaining 32-b bits + 1
    (all-zero remainder → 32-b+1). One Arrow pass, exact integers."""
    out_schema = StructType([
        StructField("id", LongType(), False),
        StructField("j", IntegerType(), False),
        StructField("r", IntegerType(), False),
    ])
    rho_cap = 32 - b + 1

    def compute(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            ids = pdf["id"].to_numpy(np.int64)
            h = hash32_np(ids, seed).astype(np.int64)
            j = (h & ((1 << b) - 1)).astype(np.int32)
            w = h >> b
            # trailing zeros: w & -w isolates the lowest set bit, an exact
            # power of two whose log2 is exact in float64
            low = (w & -w).astype(np.float64)
            rho = np.where(
                w == 0, rho_cap, np.log2(np.maximum(low, 1.0)).astype(np.int64) + 1
            ).astype(np.int32)
            yield pd.DataFrame({"id": ids, "j": j, "r": rho})

    return verts.mapInPandas(compute, schema=out_schema)


def _estimate_cols(m: int):
    """Per-vertex HLL estimate from grouped (populated) registers."""
    alpha_mm = hll_alpha(m) * m * m
    s = F.sum(F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), r)"))
    vz = F.lit(m) - F.count(F.lit(1))
    return s, vz, alpha_mm


def hyperanf(
    spark: SparkSession,
    edges: DataFrame,
    h_max: int = ANF_H,
    b: int = ANF_B,
    seed: int = ANF_SEED,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(h, nf) for h = 0..h_max: the estimated truncated neighborhood
    function NF̂(h) = Σ_v Ê|ball(v, h)| — ``h_max`` supersteps of HLL
    max-merge (the truncated-ball contract: both engines run exactly
    ``h_max`` rounds; past the diameter the rows go constant, which is
    how effective diameter is read off)."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    m = 1 << b
    nparts = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "src")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    regs = vertex_registers(verts, b, seed).localCheckpoint(eager=True)

    s, vz, alpha_mm = _estimate_cols(m)

    def _nf(regs_df) -> float:
        per = (
            regs_df.groupBy("id")
            .agg(s.alias("s"), vz.alias("vz"))
            .select(
                F.round(
                    F.when(
                        (F.lit(alpha_mm) / (F.col("s") + F.col("vz"))
                         <= F.lit(2.5 * m)) & (F.col("vz") > 0),
                        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("vz")),
                    ).otherwise(
                        F.lit(alpha_mm) / (F.col("s") + F.col("vz"))
                    ),
                    6,
                ).cast("decimal(38,8)").alias("e")
            )
        )
        row = per.agg(F.sum("e").alias("nf")).collect()[0]
        return float(row["nf"])

    rows = [(0, _nf(regs))]
    for h in range(1, h_max + 1):
        t0 = time.time()
        nbr = (
            e.join(regs.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "j", "r")
        )
        regs = (
            regs.unionByName(nbr)
            .groupBy("id", "j")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        rows.append((h, _nf(regs)))
        metrics.record(kind="anf_superstep", iter=h, wall_s=time.time() - t0)

    e.unpersist()
    return spark.createDataFrame(rows, "h long, nf double")


def effective_diameter(nf_rows, q: float = 0.9) -> float:
    """Interpolated effective diameter from (h, nf) pairs: the smallest x
    with NF(x) ≥ q·NF(h_max), linear between integer h."""
    pts = sorted(nf_rows)
    target = q * pts[-1][1]
    prev_h, prev_v = pts[0]
    if prev_v >= target:
        return float(prev_h)
    for h, v in pts[1:]:
        if v >= target:
            if v == prev_v:
                return float(h)
            return prev_h + (target - prev_v) / (v - prev_v)
        prev_h, prev_v = h, v
    return float(pts[-1][0])
