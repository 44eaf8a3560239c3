"""k-truss subgraph over the co-occurrence link graph.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge is
supported by ≥ k-2 triangles *within the subgraph*. Computed by support
peeling to fixpoint: each round recomputes per-edge support on the
surviving edge set and deletes every edge below k-2 — the synchronous
(Jacobi) peeling, whose round results are engine-independent (set
algebra on exact integers, no tie-breaks needed), unlike the sequential
lowest-support-first peel. Converges in ≤ rounds_to_empty rounds; on
web-scale graphs typically a handful (each round strictly shrinks the
edge set or stops).

Per round: one degree aggregation, one wedge join ANCHORED at the
lower-(deg,id) endpoint (intermediate Σ min-side degree — the
algos/triangles.py discipline), one filter, one scalar driver sync (the
surviving-edge count, which also detects the fixpoint). All DataFrame
ops; no driver data beyond that scalar.

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
    Empty result when no edge survives."""
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
                       wall_s=time.time() - t0)
        if m == n:
            break
        cur.unpersist()
        cur, n = keep, m
        if m == 0:
            break
    return _support(cur)
