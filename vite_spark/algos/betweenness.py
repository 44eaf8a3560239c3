"""Landmark-sampled betweenness centrality (Brandes from a fixed source set).

Exact betweenness needs all-pairs Brandes — O(nv·ne), never viable at web
scale. The standard production estimate (Brandes–Pich 2007) runs the exact
Brandes dependency accumulation from a small fixed source set L and sums
the partial dependencies:

    bc(v) = Σ_{s ∈ L, s ≠ v} δ_s(v)

    forward:  σ_s(v)  = # shortest s→v paths
              σ_s(v)  = Σ_{(u,v) ∈ E, d(u) = d(v) - 1} σ_s(u),  σ_s(s) = 1
    backward: δ_s(v)  = Σ_{(v,w) ∈ E, d(w) = d(v) + 1}
                            σ_s(v) / σ_s(w) · (1 + δ_s(w)),      δ = 0 at
                            the deepest level; endpoints excluded.

No rescaling is applied (the raw partial-sum estimator) — callers can
normalize by |L| or the pair count themselves.

Execution shape: distances come from
:func:`vite_spark.algos.bfs.shortest_paths` (the PACKED-CSR multi-source
kernel at scale, join superstep fallback). The σ forward pass and δ
backward pass are level-synchronous DataFrame supersteps — one
join + groupBy-sum per BFS level each way, ≤ 2·diameter supersteps total,
every shuffle bounded by the per-level frontier × |L|. σ values are exact
int64 (shortest-path counts on the driver graphs stay far below 2^63 —
overflow would need astronomically path-rich graphs; δ is float with the
engine-specific SUM order, so the final score is rounded to 6, matching
the repo's float-emit convention).

No Vite counterpart — §2.8 analytics-family extension like
closeness/harmonic (algos/centrality.py), reusing the same kernel.
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.algos.bfs import shortest_paths
from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def landmark_betweenness(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: Sequence[int],
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, bc) for every vertex (distinct src of the symmetric edge
    table); bc = Σ_s δ_s over ``landmarks``, endpoints excluded, raw
    (unrescaled), rounded to 6."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    nparts = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    dist = shortest_paths(
        spark, edges, landmarks, cfg=cfg, metrics=metrics
    ).persist()
    maxlev = dist.agg(F.max("dist").alias("m")).collect()[0]["m"]
    maxlev = int(maxlev or 0)

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "src")
        .persist()
    )

    # ---- forward: σ level by level (σ rows carry their level)
    sig_lev: dict[int, DataFrame] = {}
    sig_lev[0] = (
        dist.filter(F.col("dist") == 0)
        .select("id", "landmark", F.lit(1).cast("long").alias("sigma"))
        .persist()
    )
    for lev in range(1, maxlev + 1):
        t0 = time.time()
        frontier = sig_lev[lev - 1]
        at_lev = dist.filter(F.col("dist") == lev).select("id", "landmark")
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "landmark", "sigma")
            .join(at_lev, ["id", "landmark"])
            .groupBy("id", "landmark")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        sig_lev[lev] = nxt
        metrics.record(kind="betweenness_forward", level=lev,
                       wall_s=time.time() - t0)

    # ---- backward: δ from the deepest level toward the sources
    delta_next: DataFrame | None = None  # δ rows at level lev+1
    acc: DataFrame | None = None         # all δ rows at levels ≥ 1 + sources
    for lev in range(maxlev - 1, -1, -1):
        t0 = time.time()
        succ = sig_lev[lev + 1].withColumnsRenamed(
            {"id": "w", "landmark": "landmark", "sigma": "sigma_w"})
        if delta_next is not None:
            succ = succ.join(
                delta_next.withColumnsRenamed({"id": "w", "delta": "dw"}),
                ["w", "landmark"], "left",
            ).select("w", "landmark", "sigma_w",
                     F.coalesce("dw", F.lit(0.0)).alias("dw"))
        else:
            succ = succ.select("w", "landmark", "sigma_w",
                               F.lit(0.0).alias("dw"))
        cur = (
            e.join(succ.withColumnRenamed("w", "dst"), "dst")
            .select(F.col("src").alias("id"), "landmark", "sigma_w", "dw")
            .join(sig_lev[lev], ["id", "landmark"])
            .groupBy("id", "landmark")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("dw"))
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        delta_next = cur
        acc = cur if acc is None else acc.union(cur).localCheckpoint(eager=True)
        metrics.record(kind="betweenness_backward", level=lev,
                       wall_s=time.time() - t0)

    verts = edges.select(F.col("src").alias("id")).distinct()
    if acc is None:
        out = verts.select("id", F.lit(0.0).alias("bc"))
    else:
        tot = (
            acc.filter(F.col("id") != F.col("landmark"))
            .groupBy("id")
            .agg(F.sum("delta").alias("bc"))
        )
        out = verts.join(tot, "id", "left").select(
            "id", F.round(F.coalesce("bc", F.lit(0.0)), 6).alias("bc"))

    dist.unpersist()
    e.unpersist()
    return out
