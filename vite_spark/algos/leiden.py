"""Leiden-style constrained refinement — well-connected subcommunities.

The Leiden algorithm (Traag, Waltman & van Eck, "From Louvain to Leiden",
Sci. Rep. 9, 5233, 2019) improves Louvain by inserting a REFINEMENT phase
between local moving and aggregation: within each community found by
local moving, vertices restart from singletons and merge only with
refinement communities INSIDE their parent community; the next level then
aggregates the refined partition. Refinement is what breaks Louvain's
arbitrarily-badly-connected communities into well-connected pieces.

This module implements the deterministic greedy variant of that phase as
a first-class distributed operator:

- **Constrained local moving on full-graph modularity** (the
  move_nodes_constrained formulation): a vertex's candidate set is its
  neighbor refinement communities restricted to its own parent; the gain
  is the engine's exact Louvain gain (louvain.cpp:2220-2279 algebra —
  full-graph vertex degrees, full-graph 1/2m, same (gain DESC, comm ASC)
  argmax and singleton-swap guard). Traag et al. select a merge randomly
  among positive-gain candidates (their eq. 4, Θ→0 limit = greedy); this
  engine is deterministic end-to-end, so it takes the same argmax its
  Louvain sweeps take — the Θ→0 / seed-free special case, documented.
- **Jacobi sweeps from the singleton init**, exactly k of them — the
  SQL-expressible fixed-sweep shape (louvain_sweeps' convention), so the
  driver oracle can unroll the identical algebra in DuckDB CTEs.

Spark-first: the ONLY structural difference from the plain sweep is that
the neighbor-counter join runs over the parent-filtered edge table
(p(src) = p(dst)) — refinement labels start as singletons inside one
parent and candidates never cross parents, so every later state is
automatically parent-respecting (pytest-pinned invariant). Everything
else (counter tables with optional hub salting, argmax, guard, aggregate
refresh) is the engine's existing machinery reused verbatim: the filter
is pushed below the join, and the parent map joins once per refinement
(broadcast below the engine's budget).

100 TB shape: the parent filter only SHRINKS every shuffle of the plain
sweep (inter-community edges drop before the counter aggregation);
state is one (id, parent, comm) row per vertex. Cost per sweep =
one filtered join + two keyed aggregations, same as the Louvain sweep
it mirrors.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.algos.louvain import (
    _argmax_moves,
    _counter_tables,
    _maybe_broadcast,
    self_loop_weights,
    weighted_degrees,
)
from vite_spark.config import EngineConfig


def parent_filtered_edges(edges: DataFrame, parent: DataFrame,
                          nv: int, cfg: EngineConfig) -> DataFrame:
    """Edge rows whose endpoints share a parent community — the union of
    the parent-induced subgraphs, built with two (broadcastable) joins."""
    p = _maybe_broadcast(parent.select("id", "pcomm"), nv, cfg)
    return (
        edges
        .join(p.select(F.col("id").alias("src"),
                       F.col("pcomm").alias("ps")), "src")
        .join(p.select(F.col("id").alias("dst"),
                       F.col("pcomm").alias("pd")), "dst")
        .filter(F.col("ps") == F.col("pd"))
        .select("src", "dst", "weight")
    )


def leiden_refine_sweeps(
    spark: SparkSession,
    edges: DataFrame,
    parent: DataFrame,
    k: int,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Exactly ``k`` constrained Jacobi sweeps from the singleton init
    within ``parent`` (id, pcomm); returns (id, pcomm, comm).

    Gains use FULL-graph vertex degrees and 1/2m (constrained local
    moving on full-graph modularity); candidates are neighbor refinement
    communities within the vertex's parent. Vertices with no
    within-parent neighbor have no candidates and keep their singleton
    label — they stay in the output (left-join application), unlike the
    plain sweep where every vertex has candidates by construction."""
    cfg = cfg or EngineConfig()
    edges = edges.repartition(
        cfg.shuffle_partitions
        or int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        "src",
    ).persist()
    vdeg = weighted_degrees(edges)
    selfw = self_loop_weights(edges)
    vstate = (
        vdeg.join(selfw, vdeg.id == selfw.id, "left")
        .select(vdeg.id, "vdeg",
                F.coalesce("self_w", F.lit(0.0)).alias("self_w"))
        .persist()
    )
    row = vstate.agg(F.sum("vdeg").alias("tw"),
                     F.count(F.lit(1)).alias("nv")).collect()[0]
    two_m, nv = float(row["tw"]), int(row["nv"])
    const = 1.0 / two_m

    parent = parent.select("id", "pcomm").persist()
    ef = parent_filtered_edges(edges, parent, nv, cfg).persist()

    curr = vstate.select("id", F.col("id").alias("comm"))
    for _ in range(k):
        comm_info = (
            curr.join(_maybe_broadcast(vstate.select("id", "vdeg"), nv, cfg),
                      "id")
            .groupBy("comm")
            .agg(F.sum("vdeg").alias("degree"),
                 F.count(F.lit(1)).alias("size"))
        )
        # the one structural difference vs louvain_sweeps: counters over
        # the parent-filtered table — candidates (and e_cc) are
        # within-parent by construction
        st, e_cc = _counter_tables(ef, curr, vstate, nv, cfg)
        best = _argmax_moves(
            st.filter(F.col("dcomm") != F.col("cc")), e_cc, comm_info,
            const, nv, cfg,
        )
        moved = e_cc.join(best, "src", "left").select(
            F.col("src").alias("id"),
            F.coalesce(F.col("move_comm"), F.col("cc")).alias("comm"),
        )
        # LEFT-join application keeps no-candidate vertices (isolated
        # within their parent) on their current label
        curr = (
            curr.withColumnRenamed("comm", "old_comm")
            .join(moved.withColumnRenamed("comm", "new_comm"), "id", "left")
            .select("id", F.coalesce("new_comm", "old_comm").alias("comm"))
            .localCheckpoint(eager=True)
        )
    out = parent.join(curr, "id").select("id", "pcomm", "comm")
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    vstate.unpersist()
    parent.unpersist()
    ef.unpersist()
    return out


def leiden_refine_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    parent: np.ndarray,     # parent[v] over dense ids 0..nv-1
    k: int,
) -> np.ndarray:
    """Independent NumPy mirror of leiden_refine_sweeps over dense ids
    (test oracle; documents the algebra in one screen). Jacobi: all
    decisions of a sweep read the sweep-start state."""
    nv = len(parent)
    vdeg = np.zeros(nv)
    np.add.at(vdeg, src, w)
    selfw = np.zeros(nv)
    sl = src == dst
    np.add.at(selfw, src[sl], w[sl])
    const = 1.0 / w.sum()
    keep = parent[src] == parent[dst]
    fs, fd, fw = src[keep], dst[keep], w[keep]
    comm = np.arange(nv, dtype=np.int64)
    for _ in range(k):
        cd = np.zeros(nv)
        np.add.at(cd, comm, vdeg)
        cs = np.zeros(nv, np.int64)
        np.add.at(cs, comm, 1)
        new = comm.copy()
        for v in range(nv):
            rows = fs == v
            if not rows.any():
                continue
            nbr_c = comm[fd[rows]]
            evc: dict[int, float] = {}
            for c, ww in zip(nbr_c, fw[rows]):
                evc[int(c)] = evc.get(int(c), 0.0) + float(ww)
            cc = int(comm[v])
            e_cc = evc.get(cc, 0.0)
            eix = e_cc - selfw[v]
            ax = cd[cc] - vdeg[v]
            best_gain, best_c = 0.0, None
            for c in sorted(x for x in evc if x != cc):
                gain = (2.0 * (evc[c] - eix)
                        - 2.0 * vdeg[v] * (cd[c] - ax) * const)
                if gain > 0.0 and (best_c is None or gain > best_gain):
                    best_gain, best_c = gain, c
            if best_c is not None:
                if not (cs[best_c] == 1 and cs[cc] == 1 and best_c > cc):
                    new[v] = best_c
        comm = new
    return comm
