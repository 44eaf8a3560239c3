"""Multi-source BFS: hop distances from every vertex to a set of landmark
vertices (the GraphFrames `shortestPaths` surface, re-expressed over the
engine's edge table).

Semantics: ``dist(v, L)`` = minimum number of edges on a directed path
from v to landmark L (``d(L, L) = 0``); on the engine's canonical
symmetrized edge table this is the undirected BFS distance. Output is
the long-format (id, landmark, dist) table over REACHABLE pairs only —
unreachable pairs are omitted, matching the recursive-closure oracle.

Jacobi operator, run to fixpoint (O(eccentricity) supersteps):

    d_{t}(v, L) = min(d_{t-1}(v, L), 1 + min_{(v,u) in E} d_{t-1}(u, L))

Two paths, same iterates (pytest-enforced, tests/test_bfs_packed.py):

- **Packed kernel** (kernels/csr_bfs.py): one job per iteration over the
  shared sharded CSR pack, owner-authored dense (nown, L) distance
  matrices, one 2-D minimum.reduceat per sweep. The single-box
  production path.
- **Join path** (below): per iteration, one join + groupBy(src, landmark)
  min — map-side combine keeps shuffle volume at (reached pairs), not
  |E|·L. The multi-cluster / open-graph fallback. Distances only ever
  decrease and pairs are only ever added, so the fixpoint test is the
  cheap scalar pair ``(count, sum(dist))`` going stable — no full-table
  diff join per iteration.

Vite has no BFS (its traversal is the Louvain sweep); this operator is
part of the §2.8 BASELINE-required analytics set alongside
PageRank/CC/LPA/triangles.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: Sequence[int],
    max_iter: int = 200,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
    weighted: bool = False,
) -> DataFrame:
    """(id, landmark, dist) over reachable pairs; landmarks must be graph
    vertices (a non-vertex landmark routes to the join path, where it
    yields only its own (lm, lm, 0) row).

    ``weighted=True`` is landmark SSSP: dist (double) = minimum total
    edge WEIGHT over directed paths to the landmark — the min-plus
    Bellman-Ford relaxation ``d(v) = min(d(v), min_(v,u) d(u) + w(v,u))``
    run to fixpoint. Requires strictly positive weights (validated with
    one agg — min-plus diverges on ≤0 cycles). min and a single + per
    relaxation have no accumulation-order ambiguity, so join path and
    packed kernel produce identical doubles; with integer-valued weights
    (< 2^53) every value is exact."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    lms = sorted(set(int(x) for x in landmarks))
    if not lms:
        raise ValueError("shortest_paths needs at least one landmark")
    if weighted:
        wmin = edges.agg(F.min("weight").alias("w")).collect()[0]["w"]
        if wmin is not None and wmin <= 0:
            raise ValueError(
                f"weighted shortest_paths needs positive weights, "
                f"min(weight) = {wmin}")

    if cfg.use_csr_kernel:
        # packed-CSR fast path (kernels/csr_bfs.py): falls back here
        # (None) for non-local masters, non-vertex-closed inputs, and
        # landmarks that are not graph vertices.
        from vite_spark.kernels.csr_bfs import csr_shortest_paths

        res = csr_shortest_paths(spark, edges, lms, max_iter, cfg, metrics,
                                 weighted=weighted)
        if res is not None:
            return res

    nparts = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    e = (
        edges.select("src", "dst", "weight")
        .filter(F.col("src") != F.col("dst"))
        .repartition(nparts, "dst")
        .persist()
    )
    dist = spark.createDataFrame(
        [(lm, lm, 0) for lm in lms], "id long, landmark long, dist long"
    )
    if weighted:
        dist = dist.withColumn("dist", F.col("dist").cast("double"))
    dist = dist.persist()
    step = F.col("weight") if weighted else F.lit(1)
    stat = (len(lms), 0)  # (pairs, sum of dist) — monotone fixpoint probe

    for it in range(1, max_iter + 1):
        t0 = time.time()
        relaxed = (
            e.join(dist.withColumnRenamed("id", "dst"), "dst")
            .select(
                F.col("src").alias("id"),
                "landmark",
                (F.col("dist") + step).alias("dist"),
            )
        )
        new_dist = (
            dist.unionByName(relaxed)
            .groupBy("id", "landmark")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        row = new_dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).collect()[0]
        # entries only ever decrease and pairs are only added, so the
        # exact (count, sum) pair is stable iff nothing changed (sum
        # exact: int64 hops, or integer-valued doubles < 2^53)
        new_stat = (int(row["n"]), float(row["s"]))
        # pairs only get added, and in unweighted BFS a pair's first
        # distance is already minimal — so "changed" per iteration is
        # exactly the newly-reached pair count, matching the packed
        # kernel's per-entry changed count iterate-for-iterate (weighted
        # runs improve existing entries too — their kernel parity is on
        # final distances, not per-iteration counts)
        changed = new_stat[0] - stat[0]
        dist.unpersist()
        dist = new_dist
        metrics.record(kind="bfs_superstep", iter=it, changed=changed,
                       wall_s=time.time() - t0, landmarks=len(lms),
                       mode="join_minplus" if weighted else "join_min")
        if new_stat == stat:
            break
        stat = new_stat

    e.unpersist()
    return dist


def double_sweep_diameter(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """Double-sweep diameter lower bound (the classical 2-sweep BFS
    heuristic, exact on trees and near-exact on small-world graphs;
    Magnien/Latapy/Habib 2009): BFS from the smallest vertex id u0,
    take the farthest vertex u1 (max dist, ties → min id), BFS again
    from u1 — ecc(u1) ≥ every distance realized from u1, so it lower
    bounds the diameter of u0's component.

    One row (u0, u1, ecc0, diameter_lb), all exact int64. Two runs of
    :func:`shortest_paths` (the packed multi-source kernel), plus TWO
    single-row driver syncs (the argmax pivot between sweeps and the
    final max) — the same scalar-sync budget as a convergence check,
    independent of graph size."""
    u0 = int(edges.select(F.min("src").alias("m")).collect()[0]["m"])
    d0 = shortest_paths(spark, edges, [u0], cfg=cfg, metrics=metrics)
    far = d0.orderBy(F.col("dist").desc(), F.col("id").asc()).limit(1) \
        .collect()[0]
    u1, ecc0 = int(far["id"]), int(far["dist"])
    d1 = shortest_paths(spark, edges, [u1], cfg=cfg, metrics=metrics)
    return (
        d1.agg(F.max("dist").alias("diameter_lb"))
        .select(
            F.lit(u0).cast("long").alias("u0"),
            F.lit(u1).cast("long").alias("u1"),
            F.lit(ecc0).cast("long").alias("ecc0"),
            F.col("diameter_lb").cast("long"),
        )
    )
