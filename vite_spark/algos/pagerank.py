"""PageRank as DataFrame supersteps (SURVEY.md §2.8).

rank_{t+1}(v) = (1-d)/N + d·( Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/N )

Same superstep machinery as Louvain: the edge table is partitioned once and
persisted; per iteration one join + one groupBy(dst); convergence on the L1
delta (allclose 1e-6 contract vs the NumPy reference). Contributions stay
entirely JVM-side (whole-stage codegen); the per-iteration driver sync is
two scalars (L1 delta, dangling mass) — the Spark analog of Vite's
MPI_Allreduce convergence points.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    weighted: bool = False,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
    seeds=None,
) -> DataFrame:
    """Returns (id, rank). Vertices = distinct src ∪ dst of ``edges``.

    ``edges`` may be directed; the canonical symmetrized table yields the
    undirected PageRank. Dangling mass is redistributed uniformly.

    ``seeds``: an iterable of vertex ids → PERSONALIZED PageRank: the
    teleport distribution s(v) becomes uniform over the seed set instead
    of over all vertices (r = (1-d)·s + d·(inflow + dangling·s); x₀ = s).
    Same kernel, same join path — only the base/init vectors change.
    """
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    seed_list = sorted(set(int(x) for x in seeds)) if seeds else None

    if cfg.use_csr_kernel:
        # packed-CSR fast path on the sharded pack (kernels/csr_pr.py):
        # one job per iteration, per-partition gather+bincount, exchange
        # bounded by the ghost-set size. Falls back here (None) for
        # non-local masters or inputs that are not vertex-closed (a dst
        # never appearing as src carries dangling mass this path does not
        # model). Results match this join path to float accumulation
        # order; parity pytest-enforced.
        from vite_spark.kernels.csr_pr import csr_pagerank

        res = csr_pagerank(spark, edges, damping, tol, max_iter, weighted,
                           cfg, metrics, seeds=seed_list)
        if res is not None:
            return res

    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()

    wcol = F.col("weight") if weighted else F.lit(1.0)
    out = edges.groupBy("src").agg(F.sum(wcol).alias("out_w"))
    # normalized transition edges: src, dst, p = w/out_w  (persisted once)
    trans = (
        edges.join(out, "src")
        .select("src", "dst", (wcol / F.col("out_w")).alias("p"))
        .repartition(
            cfg.shuffle_partitions
            or int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            "src",
        )
        .persist()
    )
    trans.count()

    if seed_list is None:
        init_col = F.lit(1.0 / n)
        svec = F.lit(1.0 / n)            # uniform teleport density
        base_col = F.lit((1.0 - damping) / n)
    else:
        k = len(seed_list)
        is_seed = F.col("id").isin(seed_list)
        init_col = F.when(is_seed, 1.0 / k).otherwise(0.0)
        svec = F.when(is_seed, 1.0 / k).otherwise(0.0)
        base_col = F.when(is_seed, (1.0 - damping) / k).otherwise(0.0)
    ranks = verts.select("id", init_col.alias("rank")).persist()

    # vertices without out-edges (never any on a symmetrized table) —
    # checked once so symmetric graphs skip the per-iteration dangling scan
    n_dangling = verts.join(
        out.select(F.col("src").alias("id")), "id", "left_anti"
    ).count()

    def _mb(df, rows):
        return F.broadcast(df) if rows <= cfg.broadcast_max_rows else df

    for it in range(1, max_iter + 1):
        t0 = time.time()
        contrib = (
            trans.join(_mb(ranks, n).withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        if n_dangling > 0:
            # dangling mass = 1 - Σ rank(u) over u with out-edges
            dang_row = (
                ranks.join(out.select(F.col("src").alias("id")), "id", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
            )
            dangling = 1.0 - float(dang_row or 0.0)
        else:
            dangling = 0.0
        new_ranks = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    base_col
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.lit(dangling) * svec)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks.unpersist()
        ranks = new_ranks
        metrics.record(
            kind="pagerank_superstep", iter=it, l1_delta=float(delta),
            wall_s=time.time() - t0,
        )
        if delta < tol:
            break

    trans.unpersist()
    verts.unpersist()
    return ranks
