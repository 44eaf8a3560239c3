"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

Graph-embedding pipelines (DeepWalk, node2vec) consume a corpus of fixed-
length walks — at 100 TB scale the walk generation itself is the Spark
job: one walk frontier per step joined against the edge table, shuffle
bounded by Σ out-degree of the frontier, never by |V|².

Randomness is SEEDED AND ENGINE-PORTABLE by design (the repo's rnd-weight
precedent, io/edgelist.py S14): the next hop from ``cur`` at ``step`` is
the out-neighbor ``dst`` minimizing

    h = ((cur % P)·1000003 + (step % P)·10007 + (dst % P)·31) % P,
    P = 1_000_000_007                                     (ties → min dst)

— pure int64 arithmetic both Spark and any SQL engine compute identically
(operands reduced mod P first, so every product stays < 2^63). This makes
the corpus reproducible across runs, engines, and cluster layouts — a
property real training pipelines need for data lineage — while remaining
hash-uniform across steps. The argmin is evaluated in two exact integer
aggregations (MIN(h), then MIN(dst) among h-ties) so no float or
engine-specific ordering enters.

Walks that hit a sink (no out-neighbor) simply end: the walk emits rows
for the steps it completed. On the symmetrized co-occurrence graph every
vertex has an out-neighbor, so all walks run the full length.

No Vite counterpart — training-data-pipeline op per the round brief.
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector

WALK_P = 1_000_000_007
WALK_A = 1_000_003
WALK_B = 10_007
WALK_C = 31


def _hash_col(cur, step: int, dst):
    p = F.lit(WALK_P)
    return (
        (cur % p) * F.lit(WALK_A)
        + F.lit((step % WALK_P) * WALK_B)
        + (dst % p) * F.lit(WALK_C)
    ) % p


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 8,
    starts: DataFrame | None = None,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(walk, step, id): one walk per start vertex (walk = start id),
    rows for step 0..``steps`` (fewer if the walk hits a sink).

    ``starts``: one-column (id) DataFrame; default = every distinct src
    of ``edges``."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
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
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    state = starts.select(
        F.col("id").cast("long").alias("walk"), F.col("id").cast("long").alias("cur")
    ).localCheckpoint(eager=True)
    out = state.select("walk", F.lit(0).cast("long").alias("step"),
                       F.col("cur").alias("id"))

    for s in range(1, steps + 1):
        t0 = time.time()
        cand = (
            e.join(state.withColumnRenamed("cur", "src"), "src")
            .select("walk", "dst", _hash_col(F.col("src"), s, F.col("dst")).alias("h"))
        )
        mh = cand.groupBy("walk").agg(F.min("h").alias("mh"))
        state = (
            cand.join(mh, "walk")
            .filter(F.col("h") == F.col("mh"))
            .groupBy("walk")
            .agg(F.min("dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.union(
            state.select("walk", F.lit(s).cast("long").alias("step"),
                         F.col("cur").alias("id"))
        )
        metrics.record(kind="walk_step", step=s, active=state.count(),
                       wall_s=time.time() - t0)

    e.unpersist()
    return out


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    steps: int = 8,
    return_cost: int = 4,
    inout_cost: int = 2,
    starts: DataFrame | None = None,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(walk, step, id): SECOND-ORDER biased walks — the deterministic
    analog of node2vec's (p, q) sampling (Grover & Leskovec 2016).

    From state (prev, cur), candidate dst races with key h·cost where h
    is the engine-portable walk hash and cost is the node2vec bias class
    as an INTEGER multiplier:

        dst == prev                 → return_cost   (the 1/p return bias)
        dst adjacent to prev        → 1             (BFS-ish, stay local)
        else                        → inout_cost    (the 1/q outward bias)

    argmin of cost·U over hash-uniform U is a deterministic weighted
    race: a candidate's win probability strictly decreases in its cost
    (exactly proportional for two-candidate races), so larger
    return/inout costs bias the corpus toward local structure exactly as
    node2vec's p/q do — while every value stays int64 (h < P, cost ≤
    small int ⇒ key < 2^63) and the corpus is reproducible across
    engines and layouts. Ties → min dst, as in random_walks.

    Scale shape: the one cost beyond the first-order walk is the
    adjacency probe (cand ⋈ edges on (prev, dst)) — the same
    neighbor-of-previous lookup every node2vec implementation pays; the
    shuffle stays bounded by Σ deg(frontier) per step."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    # h < WALK_P, so the race key h·cost stays int64-exact iff the cost
    # fits this bound — reject instead of silently wrapping (the repo's
    # int32-overflow lesson, kernels/csr.py r3)
    max_cost = (1 << 62) // WALK_P
    if not (0 < return_cost <= max_cost and 0 < inout_cost <= max_cost):
        raise ValueError(
            f"bias costs must be in (0, {max_cost}] to keep h*cost "
            f"int64-exact; got return_cost={return_cost}, "
            f"inout_cost={inout_cost}")
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
    adj = e.select(F.col("src").alias("prev"), F.col("dst").alias("dst"),
                   F.lit(1).alias("is_adj"))
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    state = starts.select(
        F.col("id").cast("long").alias("walk"),
        F.lit(None).cast("long").alias("prev"),
        F.col("id").cast("long").alias("cur"),
    ).localCheckpoint(eager=True)
    out = state.select("walk", F.lit(0).cast("long").alias("step"),
                       F.col("cur").alias("id"))

    for s in range(1, steps + 1):
        t0 = time.time()
        cand = (
            e.join(state.withColumnRenamed("cur", "src"), "src")
            .select(
                "walk", "prev", "dst",
                _hash_col(F.col("src"), s, F.col("dst")).alias("h"),
            )
        )
        cost = (
            F.when(F.col("dst") == F.col("prev"), F.lit(return_cost))
            .when(F.col("is_adj").isNotNull(), F.lit(1))
            .otherwise(F.lit(inout_cost))
            .cast("long")
        )
        keyed = (
            cand.join(adj, ["prev", "dst"], "left")
            .select("walk", "dst", (F.col("h") * cost).alias("k"))
        )
        mk = keyed.groupBy("walk").agg(F.min("k").alias("mk"))
        nxt = (
            keyed.join(mk, "walk")
            .filter(F.col("k") == F.col("mk"))
            .groupBy("walk")
            .agg(F.min("dst").alias("cur"))
        )
        state = (
            nxt.join(state.select("walk", F.col("cur").alias("prev")), "walk")
            .select("walk", "prev", "cur")
            .localCheckpoint(eager=True)
        )
        out = out.union(
            state.select("walk", F.lit(s).cast("long").alias("step"),
                         F.col("cur").alias("id"))
        )
        metrics.record(kind="n2v_step", step=s, active=state.count(),
                       wall_s=time.time() - t0)

    e.unpersist()
    return out
