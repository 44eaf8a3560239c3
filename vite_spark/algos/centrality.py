"""Landmark-based centrality over the co-occurrence link graph.

Exact closeness/harmonic centrality needs all-pairs shortest paths —
O(nv·ne), never viable at web scale. The standard production estimate
(Eppstein–Wang / Cohen et al.) aggregates distances to a small fixed
landmark set instead: one multi-source BFS (|L| landmarks amortized into a
single packed kernel run, kernels/csr_bfs.py) followed by one groupBy —
O(|L|·ne) total, independent of nv² entirely. For vertex v over landmark
set L (self excluded):

- ``reached``    = |{l ∈ L \\ {v} : v reaches l}|
- ``closeness``  = reached / Σ dist(v, l)      (0.0 when nothing reached)
- ``harmonic``   = Σ 1 / dist(v, l)            (unreachable terms are 0)

Distances come from :func:`vite_spark.algos.bfs.shortest_paths` — the
packed-CSR multi-source kernel at scale, the join superstep as fallback —
so this module is a pure DataFrame aggregation on top: one filter +
groupBy + left join, all inside whole-stage codegen. Scores are rounded
to 6 decimals (the harmonic SUM accumulates ≤ |L| doubles whose order is
engine-specific); reached and the distance sum are exact int64.

Reference scope: the C++ reference (ECP-ExaGraph/vite) ships no
centrality; this extends the engine's §2.8 analytics family the same way
PageRank / BFS do, reusing their kernel.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vite_spark.algos.bfs import shortest_paths
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = 10,
    weighted: bool = True,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, score): ``iters`` steps of power iteration on the (weighted)
    adjacency from x₀ = 1, L1-normalized ONCE at the end — power
    iteration is scale-invariant, and deferring the normalization keeps
    every step a single join+agg with no mid-iteration global barrier
    (float64 headroom covers λ^iters for any realistic spectral radius
    at the fixed small ``iters``; the norm is one extra 1-row aggregate).

    Rides the same packed-CSR kernel as PageRank (kernels/csr_pr.py
    mode="eigen": identical merge/scatter jobs, adjacency coefficients,
    no teleport) with this join+agg superstep as the cluster-shape
    fallback; per-path float sums differ only in accumulation order."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    if cfg.use_csr_kernel:
        from vite_spark.kernels.csr_pr import csr_pagerank

        res = csr_pagerank(spark, edges, 1.0, 0.0, iters, weighted,
                           cfg, metrics, mode="eigen")
        if res is not None:
            return res.select("id", F.col("rank").alias("score"))

    verts = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))).distinct().persist()
    wcol = F.col("weight") if weighted else F.lit(1.0)
    e = edges.select("src", "dst", wcol.alias("w")).persist()
    x = verts.select("id", F.lit(1.0).alias("v")).persist()
    for t in range(iters):
        prev = x
        nxt = (
            e.join(x.select(F.col("id").alias("src"), "v"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("v")).alias("v"))
        )
        # zero-indegree vertices keep an explicit 0.0 row
        x = (
            verts.join(nxt, "id", "left")
            .select("id", F.coalesce("v", F.lit(0.0)).alias("v"))
            .persist()
        )
        if (t + 1) % 5 == 0:
            x = x.localCheckpoint(eager=True)   # bound lineage growth
        prev.unpersist()
        metrics.record(kind="eigen_superstep", iter=t + 1, mode="join")
    total = x.agg(F.sum("v").alias("s"))
    out = x.crossJoin(F.broadcast(total)).select(
        "id", (F.col("v") / F.col("s")).alias("score"))
    return out


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 10,
    weighted: bool = True,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, score): ``iters`` steps of the Katz recurrence
    x ← β + α·Aᵀx from x₀ = β (≡ iters+1 terms of Σ αᵏ(Aᵀ)ᵏ β𝟙 — the
    attenuated walk-count centrality, Katz 1953). Emitted raw: Katz
    scores are absolute, there is no normalization to defer.

    Rides the same packed-CSR kernel as PageRank/eigenvector
    (kernels/csr_pr.py mode="katz": adjacency coefficients, constant β
    added in the merge — identical exchange shape and cost) with this
    join+agg superstep as the cluster-shape fallback."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    if cfg.use_csr_kernel:
        from vite_spark.kernels.csr_pr import csr_pagerank

        res = csr_pagerank(spark, edges, alpha, 0.0, iters, weighted,
                           cfg, metrics, mode="katz", katz_beta=beta)
        if res is not None:
            return res.select("id", F.col("rank").alias("score"))

    verts = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))).distinct().persist()
    wcol = F.col("weight") if weighted else F.lit(1.0)
    e = edges.select("src", "dst", wcol.alias("w")).persist()
    x = verts.select("id", F.lit(float(beta)).alias("v")).persist()
    for t in range(iters):
        prev = x
        nxt = (
            e.join(x.select(F.col("id").alias("src"), "v"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("v")).alias("v"))
        )
        x = (
            verts.join(nxt, "id", "left")
            .select(
                "id",
                (F.lit(float(beta))
                 + alpha * F.coalesce("v", F.lit(0.0))).alias("v"),
            )
            .persist()
        )
        if (t + 1) % 5 == 0:
            x = x.localCheckpoint(eager=True)
        prev.unpersist()
        metrics.record(kind="katz_superstep", iter=t + 1, mode="join")
    return x.select("id", F.col("v").alias("score"))


def hits(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = 10,
    weighted: bool = True,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, hub, authority): Kleinberg's HITS on a DIRECTED edge table,
    ``iters`` full iterations from h₀ = 1:

        a_t(v) = Σ_{u→v} w(u,v) · h_{t-1}(u)      (authority ← in-links)
        h_t(u) = Σ_{u→v} w(u,v) · a_t(v)          (hub ← out-links)

    Like :func:`eigenvector_centrality`, normalization (L1) is deferred to
    the single emit — the recurrence is scale-invariant, so every
    iteration stays two join+agg supersteps with no mid-iteration global
    barrier; float64 headroom covers the growth at the fixed small
    ``iters``. Scores are rounded to 6 (SUM accumulation order is
    engine-specific). Vertices that are pure sinks/sources keep explicit
    0.0 hub/authority rows.

    At scale this dispatches to the PACKED-CSR kernel
    (kernels/csr_hits.py: push-merge for Aᵀ, owner-publish/gather for A,
    two jobs per iteration over the shared sharded pack) with this
    join+agg superstep as the multi-cluster / non-vertex-closed fallback;
    per-path float sums differ only in accumulation order
    (parity pytest-enforced). Each join superstep shuffles |V| partial
    sums (map-side combine), the same shape as the PageRank join
    fallback; the edge table is read once per matvec with only
    (src, dst, w) columns. No Vite counterpart — §2.8 directed-analytics
    extension."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()

    if cfg.use_csr_kernel:
        from vite_spark.kernels.csr_hits import csr_hits

        res = csr_hits(spark, edges, iters, weighted, cfg, metrics)
        if res is not None:
            return _hits_emit(res)

    verts = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))).distinct().persist()
    wcol = F.col("weight").cast("double") if weighted else F.lit(1.0)
    e = edges.select("src", "dst", wcol.alias("w")).persist()
    h = verts.select("id", F.lit(1.0).alias("v")).persist()
    a = None
    for t in range(iters):
        na = (
            e.join(h.select(F.col("id").alias("src"), "v"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("v")).alias("v"))
        )
        a = verts.join(na, "id", "left").select(
            "id", F.coalesce("v", F.lit(0.0)).alias("v")).persist()
        nh = (
            e.join(a.select(F.col("id").alias("dst"), "v"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("w") * F.col("v")).alias("v"))
        )
        prev = h
        h = verts.join(nh, "id", "left").select(
            "id", F.coalesce("v", F.lit(0.0)).alias("v")).persist()
        if (t + 1) % 5 == 0:
            a = a.localCheckpoint(eager=True)
            h = h.localCheckpoint(eager=True)
        prev.unpersist()
        metrics.record(kind="hits_superstep", iter=t + 1, mode="join")
    return _hits_emit(
        h.select("id", F.col("v").alias("hv"))
        .join(a.select("id", F.col("v").alias("av")), "id")
    )


def _hits_emit(df: DataFrame) -> DataFrame:
    """Shared final emit for both HITS paths: L1 normalization (deferred —
    the recurrence is scale-invariant) + round 6 over raw (id, hv, av)."""
    tot = df.agg(F.sum("hv").alias("hs"), F.sum("av").alias("as_"))
    return df.crossJoin(F.broadcast(tot)).select(
        "id",
        F.round(
            F.when(F.col("hs") > 0, F.col("hv") / F.col("hs"))
            .otherwise(F.lit(0.0)), 6).alias("hub"),
        F.round(
            F.when(F.col("as_") > 0, F.col("av") / F.col("as_"))
            .otherwise(F.lit(0.0)), 6).alias("authority"),
    )


def landmark_centrality(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: Sequence[int],
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, reached, closeness, harmonic) for EVERY vertex of ``edges``
    (distinct src of the symmetric table); vertices reaching no landmark
    keep an explicit all-zero row rather than dropping out."""
    dist = shortest_paths(
        spark, edges, landmarks, cfg=cfg, metrics=metrics)
    verts = edges.select(F.col("src").alias("id")).distinct()
    agg = (
        dist.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("reached"),
            F.sum("dist").alias("sd"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("h"),
        )
    )
    return verts.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col("reached"), F.lit(0).cast("long")).alias("reached"),
        F.round(
            F.coalesce(F.col("reached") / F.col("sd"), F.lit(0.0)), 6
        ).alias("closeness"),
        F.round(F.coalesce(F.col("h"), F.lit(0.0)), 6).alias("harmonic"),
    )
