"""Minimum spanning forest — distributed Borůvka, round-compacted.

The classic O(log n)-round distributed MSF (Borůvka 1926; the GraphX /
Pregel standard): every round each component picks its minimum incident
crossing edge under the TOTAL order (weight, src, dst) — the tie-break
makes all edge weights effectively distinct, so the forest is UNIQUE and
any algorithm honoring the order (the DuckDB oracle replays the same
rounds) produces the identical edge set — then the picked edges contract
and the next round runs over the contracted graph.

r4 shape (the 0.303 BENCH row): per round a full edges⋈labels join on a
PERSISTENT per-vertex label table, a window min, and a two-phase-CC run
(itself O(log²) jobs) to relabel — ~5+ jobs per round, all touching
O(|E|) or O(|V|) rows. This rewrite removes the per-vertex label table
entirely and compacts each round to TWO real jobs:

- **Edge-level labels.** Each surviving candidate row carries its own
  endpoints' current component ids (ca, cb). No per-vertex comp table,
  no per-round edges⋈labels join: relabeling is a join of the CANDIDATE
  set (which only shrinks) against the O(#active-components)-row
  contraction map.
- **Monotone candidate shrinking.** An edge whose endpoints fall into
  one component is intra-component forever — it is dropped the round it
  happens, so late rounds touch only the few still-crossing edges, not
  the full table (the standard GraphX/Pregel filter).
- **Adaptive contraction tier** (the Louvain `_local_phase` pattern):
  the picked pseudo-forest has ONE edge per active component; when it
  fits under ``cfg.msf_local_contract_max_rows`` the contraction map is
  computed driver-local (vectorized NumPy min-label + pointer doubling,
  O(log) passes) and BROADCAST, making the relabel join map-side — no
  shuffle at all. Above the threshold (a 10⁹-vertex round 1) the
  distributed two-phase large-star/small-star contraction runs instead;
  active components at least halve per round, so every run crosses into
  the local tier after O(log) rounds.

Scale shape per round: one window min over the candidate set (rows per
window partition = one component's incident crossing edges, map-side
prunable) + one relabel pass over the candidate set (broadcast-joined in
the local tier). ≤ ⌈log₂ V⌉ rounds, and only the first touch anything
close to the full edge set.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _cc_numpy(a: np.ndarray, b: np.ndarray):
    """Connected components of the (a, b) edge list, driver-local:
    min-label propagation with pointer doubling — O(log n) vectorized
    passes even on the chain-shaped pseudo-forests Borůvka picks.
    Returns (ids, root) with root = min original id of the component."""
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        nl = lab.copy()
        np.minimum.at(nl, ai, lab[bi])
        np.minimum.at(nl, bi, lab[ai])
        changed = bool((nl != lab).any())
        lab = nl
        while True:                      # pointer doubling to the roots
            nl2 = lab[lab]
            if (nl2 == lab).all():
                break
            lab = nl2
        if not changed:
            break
    return ids, ids[lab]


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
    metrics: MetricsCollector | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """(src, dst, weight) — the unique minimum spanning forest of the
    undirected graph under the (weight, src, dst) total order; src < dst
    canonical, one row per forest edge (|V| − #components rows)."""
    from vite_spark.algos.components import connected_components_twophase

    metrics = metrics or MetricsCollector()
    cfg = cfg or EngineConfig()
    local_max = getattr(cfg, "msf_local_contract_max_rows", 4_000_000)
    # candidate rows carry their endpoints' CURRENT component ids
    cand = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .select("src", "dst", "weight",
                F.col("src").alias("ca"), F.col("dst").alias("cb"))
        .localCheckpoint(eager=True)
    )
    forest: DataFrame | None = None

    for rnd in range(1, max_rounds + 1):
        n_cand = cand.count()            # checkpointed — no recompute
        if n_cand == 0:
            break
        # per-component min under the (weight, src, dst) total order as
        # a MIN-of-STRUCT hash aggregation (struct ordering is
        # lexicographic by field position; (weight, src, dst) is unique
        # per canonical edge, so the trailing ca/cb never decide): the
        # map side keeps ONE candidate per component per partition, so
        # the shuffle carries O(#active components) rows — the
        # sort-based window pick it replaces shuffled and sorted every
        # candidate row (measured 2-4× slower and host-bandwidth-bound
        # at probe scale)
        ms = F.min(F.struct("weight", "src", "dst", "ca", "cb")).alias("m")
        winners = (
            cand.groupBy(F.col("ca").alias("c")).agg(ms)
            .unionAll(cand.groupBy(F.col("cb").alias("c")).agg(ms))
            .groupBy("c").agg(F.min("m").alias("m"))
        )
        picked = (
            winners.select("m.src", "m.dst", "m.weight", "m.ca", "m.cb")
            .distinct()
            .localCheckpoint(eager=True)  # cut lineage across rounds
        )
        pe = picked.select("src", "dst", "weight")
        forest = pe if forest is None else forest.unionAll(pe)

        # contraction map over the picked pseudo-forest (one edge per
        # active component): driver-local + broadcast under the
        # threshold, distributed two-phase CC above it
        n_picked = picked.count()        # checkpointed — cheap
        if n_picked <= local_max:
            import pandas as pd

            pdf = picked.select("ca", "cb").toPandas()
            ids, roots = _cc_numpy(pdf["ca"].to_numpy(np.int64),
                                   pdf["cb"].to_numpy(np.int64))
            mapping = F.broadcast(spark.createDataFrame(
                pd.DataFrame({"c": ids, "nc": roots}),
                schema="c long, nc long"))
            mode = "boruvka_local_contract"
        else:
            pg = picked.select(
                F.col("ca").alias("src"), F.col("cb").alias("dst"))
            mapping = connected_components_twophase(spark, pg).select(
                F.col("id").alias("c"), F.col("component").alias("nc"))
            mode = "boruvka_cc_contract"

        # relabel the candidate set and drop now-intra edges (they can
        # never cross again — monotone shrink). Labels absent from the
        # map belong to components with no crossing edge left (finished):
        # coalesce keeps them until their rows drop out.
        cand = (
            cand.join(mapping.withColumnRenamed("c", "ca")
                      .withColumnRenamed("nc", "na"), "ca", "left")
            .join(mapping.withColumnRenamed("c", "cb")
                  .withColumnRenamed("nc", "nb"), "cb", "left")
            .select("src", "dst", "weight",
                    F.coalesce("na", "ca").alias("ca"),
                    F.coalesce("nb", "cb").alias("cb"))
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        metrics.record(kind="msf_round", iter=rnd, candidates=int(n_cand),
                       picked=int(n_picked), mode=mode)
    else:
        raise RuntimeError(f"Borůvka did not converge in {max_rounds} rounds")

    if forest is None:
        return spark.createDataFrame(
            [], "src long, dst long, weight double")
    # an edge is picked at most once (its endpoints merge the round it is
    # picked), so this distinct is a safety net, not a dedup requirement
    return forest.distinct()
