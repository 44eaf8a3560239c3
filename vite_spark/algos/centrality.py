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
