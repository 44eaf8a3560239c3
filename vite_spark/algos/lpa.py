"""Synchronous label propagation (SURVEY.md §2.8).

label_{t+1}(v) = argmax_c Σ w(v→u), label_t(u) = c; tie → smaller label
(deterministic — same ordered-argmax discipline as Louvain L5). Synchronous
(Jacobi) updates make the result independent of partitioning and row order.
Fixed max_iter with early stop when no label changes.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """Returns (id, label). Self-loops are excluded from voting."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()

    if cfg.use_csr_kernel:
        # packed-CSR fast path on the sharded pack (kernels/csr_lpa.py):
        # one job per iteration, owner-authored dense label exchange.
        # Falls back here (None) for non-local masters, non-vertex-closed
        # inputs, and non-integer weights (float-tied votes could resolve
        # differently across summation orders). Labels are IDENTICAL to
        # this join path on the integer-weight domain; pytest-enforced.
        from vite_spark.kernels.csr_lpa import csr_lpa

        res = csr_lpa(spark, edges, max_iter, cfg, metrics)
        if res is not None:
            return res

    e = (
        edges.select("src", "dst", "weight")
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
    labels = verts.select("id", F.col("id").alias("label")).persist()

    def _mb(df):
        return F.broadcast(df) if nv <= cfg.broadcast_max_rows else df

    for it in range(1, max_iter + 1):
        t0 = time.time()
        votes = (
            e.join(_mb(labels).select(F.col("id").alias("dst"), "label"), "dst")
            .groupBy("src", "label")
            .agg(F.sum("weight").alias("vote"))
        )
        # ordered argmax: max vote, tie → min label
        best = (
            votes.groupBy(F.col("src").alias("id"))
            .agg(
                F.max(
                    F.struct(
                        F.col("vote"), (-F.col("label")).alias("neg"), F.col("label")
                    )
                ).alias("m")
            )
            .select("id", F.col("m.label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("new_label", F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.select("id", F.col("label").alias("old")), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        metrics.record(kind="lpa_superstep", iter=it, changed=changed,
                       wall_s=time.time() - t0)
        if changed == 0:
            break

    e.unpersist()
    verts.unpersist()
    return labels
