"""k-truss subgraph over the co-occurrence link graph.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge is
supported by ≥ k-2 triangles *within the subgraph*. Computed by support
peeling to fixpoint with synchronous (Jacobi) round semantics: each
round simultaneously deletes every edge below k-2 support — the round
iterates are engine-independent (set algebra on exact integers, no
tie-breaks), unlike the sequential lowest-support-first peel.

Two implementations, identical round iterates (pytest parity):

- **Frontier peeling** (`ktruss`, the default): support is computed ONCE
  (anchored wedge join, the algos/triangles.py discipline), then
  MAINTAINED: when round r deletes edge set D, the support of a
  surviving edge f drops by exactly the number of its triangles that
  contain ≥ 1 edge of D. Those triangles are enumerated FROM the
  deleted edges (wedge join anchored at each deleted edge's
  lower-degree endpoint over the current adjacency), emitted as
  (surviving-edge, canonical-triangle-id) rows and DEDUPLICATED on the
  triangle id — a triangle with TWO deleted edges is discovered from
  both but must decrement its surviving edge once (the exact
  inclusion–exclusion the naive pair count gets wrong). Per-round cost
  is proportional to Σ_{d∈D} min-degree(d) — the deleted frontier —
  not to the full surviving edge set; late rounds (tiny frontiers) cost
  almost nothing, where the recompute variant pays the full wedge join
  every round.
- **Full recompute** (`ktruss_recompute`): each round recomputes support
  on the surviving set from scratch — the r4 shape, kept as the
  parity oracle and the shape-measured reference.

Per frontier round: one wedge join over the deleted edges, one distinct
+ grouped count (the decrements), one broadcast-size filter/join to
apply them, one scalar driver sync. All DataFrame ops; no driver data
beyond scalars.

Reference scope: the C++ reference (ECP-ExaGraph/vite) ships no truss
decomposition; §2.8 analytics family.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _support(cur: DataFrame) -> DataFrame:
    """(u, v, support) for every edge of the half table ``cur`` (u < v),
    support counted within ``cur``'s symmetric closure."""
    sym = cur.select("u", "v").union(
        cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("dl"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dr"))
    ranked = cur.join(du, "u").join(dv, "v")
    anchored = ranked.select(
        "u", "v",
        F.when(
            (F.col("dl") < F.col("dr"))
            | ((F.col("dl") == F.col("dr")) & (F.col("u") < F.col("v"))),
            F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(
            (F.col("dl") < F.col("dr"))
            | ((F.col("dl") == F.col("dr")) & (F.col("u") < F.col("v"))),
            F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    aa = sym.select(F.col("u").alias("a"), F.col("v").alias("w"))
    bb = sym.select(F.col("u").alias("b"), F.col("v").alias("w"))
    cn = (
        anchored.join(aa, "a").join(bb, ["b", "w"])
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    )
    return cur.join(cn, ["u", "v"], "left").select(
        "u", "v",
        F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"))


def _decrements(cur: DataFrame, deleted: DataFrame) -> DataFrame:
    """(u, v, dec) per SURVIVING edge: the number of its triangles within
    ``cur`` (the full current half table, u < v) that contain at least
    one ``deleted`` edge. Enumerated from the deleted edges, anchored at
    each one's lower-degree endpoint; (edge, triangle) rows are
    deduplicated on the canonical triangle id so a two-deleted-edge
    triangle decrements its surviving edge exactly once."""
    sym = cur.select("u", "v").union(
        cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("dl"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dr"))
    anchored = (
        deleted.join(du, "u").join(dv, "v")
        .select(
            "u", "v",
            F.when(
                (F.col("dl") < F.col("dr"))
                | ((F.col("dl") == F.col("dr")) & (F.col("u") < F.col("v"))),
                F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(
                (F.col("dl") < F.col("dr"))
                | ((F.col("dl") == F.col("dr")) & (F.col("u") < F.col("v"))),
                F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    aa = sym.select(F.col("u").alias("a"), F.col("v").alias("w"))
    bb = sym.select(F.col("u").alias("b"), F.col("v").alias("w"))
    # triangles (u,v,w) through each deleted (u,v); the two other edges
    # are (u,w) and (v,w), canonicalized
    tris = (
        anchored.join(aa, "a").join(bb, ["b", "w"])
        .select("u", "v", "w",
                F.least("u", "v", "w").alias("t1"),
                F.greatest("u", "v", "w").alias("t3"),
                (F.col("u") + F.col("v") + F.col("w")
                 - F.least("u", "v", "w")
                 - F.greatest("u", "v", "w")).alias("t2"))
    )
    other = tris.select(
        F.least("u", "w").alias("fu"), F.greatest("u", "w").alias("fv"),
        "t1", "t2", "t3",
    ).union(tris.select(
        F.least("v", "w").alias("fu"), F.greatest("v", "w").alias("fv"),
        "t1", "t2", "t3",
    )).distinct()
    return (
        other.groupBy(F.col("fu").alias("u"), F.col("fv").alias("v"))
        .agg(F.count(F.lit(1)).alias("dec"))
    )


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(u, v, support) per surviving undirected edge (u < v) of the
    k-truss; ``support`` is the triangle count within the truss itself.
    Empty result when no edge survives. Frontier peeling: support is
    computed once and maintained by exact per-round decrements."""
    metrics = metrics or MetricsCollector()
    base = (
        edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    t0 = time.time()
    sup = _support(base).localCheckpoint(eager=True)
    metrics.record(kind="ktruss_support_init", edges=sup.count(),
                   wall_s=time.time() - t0, mode="truss_frontier")
    for rnd in range(1, max_rounds + 1):
        t0 = time.time()
        deleted = sup.filter(F.col("support") < k - 2).select("u", "v") \
            .localCheckpoint(eager=True)
        n_del = deleted.count()
        if n_del == 0:
            metrics.record(kind="ktruss_round", iter=rnd, deleted=0,
                           edges=sup.count(), wall_s=time.time() - t0,
                           mode="truss_frontier")
            break
        survivors = sup.filter(F.col("support") >= k - 2)
        cur = sup.select("u", "v")
        dec = _decrements(cur, deleted)
        sup = (
            survivors.join(dec, ["u", "v"], "left")
            .select(
                "u", "v",
                (F.col("support")
                 - F.coalesce(F.col("dec"), F.lit(0).cast("long"))
                 ).alias("support"))
            .localCheckpoint(eager=True)
        )
        metrics.record(kind="ktruss_round", iter=rnd, deleted=int(n_del),
                       edges=sup.count(), wall_s=time.time() - t0,
                       mode="truss_frontier")
    else:
        raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")
    return sup


def ktruss_recompute(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """The full-recompute Jacobi peel (the r4 shape): each round
    recomputes support on the surviving set and deletes below-threshold
    edges. Kept as the frontier variant's parity oracle and as the
    measured reference shape."""
    metrics = metrics or MetricsCollector()
    cur = (
        edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .persist()
    )
    n = cur.count()
    for rnd in range(1, max_rounds + 1):
        t0 = time.time()
        # localCheckpoint: each round's edge set is materialized, so the
        # plan never chains rounds (lineage would grow per round)
        keep = (
            _support(cur).filter(F.col("support") >= k - 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        m = keep.count()
        metrics.record(kind="ktruss_round", iter=rnd, edges=m,
                       wall_s=time.time() - t0, mode="truss_recompute")
        if m == n:
            break
        cur.unpersist()
        cur, n = keep, m
        if m == 0:
            break
    return _support(cur)
