"""Strongly connected components on a DIRECTED edge table.

Forward-min coloring with backward peel (Orzan 2004; Slota/Rajamanickam/
Madduri IPDPS'14 shape), preceded by iterative TRIM of trivial SCCs —
the standard distributed SCC recipe:

1. TRIM: a vertex with no in-edges or no out-edges inside the remaining
   subgraph is its own SCC; peel repeatedly (removes the DAG fringe, which
   on real link graphs is most of the vertices).
2. COLOR: propagate color(v) = min({v} ∪ {u : u ⇝ v}) along edge direction
   to fixpoint (one join + groupBy-min superstep per hop, the CC idiom).
   Every v with color(v) == v is the ROOT of its color class.
3. PEEL: inside each color class, mark vertices that reach their root
   (propagation along REVERSED edges restricted to equal colors). Marked
   sets are exactly the root SCCs (proof: ancestors of any vertex on a
   u⇝root path within the class would recolor the root — see the class
   invariant below), labeled component = root id; remove and repeat 1-3.

Class invariant used by step 3: if color(u) == r and u ⇝ r, every vertex w
on that path has color(w) == r (a smaller-id ancestor of w would also be an
ancestor of r, contradicting color(r) == r), so the restriction to
equal-color edges loses no member of SCC(r).

Contract: returns (id, component) with component = min vertex id in the
SCC — the directed analog of connected_components' label contract.

Scale notes (100 TB): every superstep is one equi-join + groupBy-min with
map-side combine (shuffle |V|, not |E|); the remaining subgraph shrinks
monotonically and is re-persisted per round with lineage cuts. Worst case
is O(#SCC-chain) outer rounds (a path of k SCCs peels min-root classes
level by level); TRIM removes that case for DAG-like graphs, and real web
graphs converge in a handful of rounds (one giant SCC + fringe). For
adversarial chains, cap with max_rounds and fall back to recursion-free
labels=None reporting (announced, never silent).

No Vite counterpart (the reference is undirected-only); SURVEY.md §2.8
extension, same family as connected_components/pagerank.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector

log = logging.getLogger("vite_spark.scc")


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 64,
    max_iter: int = 200,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, component) over directed edges(src, dst); component = min SCC id."""
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    nshuf = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nshuf, "src")
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # self-loop-only vertices never enter `e`; they are singleton SCCs of
    # themselves and are re-added from the caller's vertex set at the end.
    all_verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    done: DataFrame | None = None  # accumulated (id, component)

    def _accumulate(part: DataFrame) -> None:
        nonlocal done
        done = part if done is None else done.union(part)
        done = done.localCheckpoint(eager=True)

    remaining = verts
    n_remaining = remaining.count()

    for rnd in range(1, max_rounds + 1):
        if n_remaining == 0:
            break
        t0 = time.time()

        # ---- 1. TRIM trivial SCCs (no in- or no out-edge inside remaining)
        while True:
            srcs = e.select(F.col("src").alias("id")).distinct()
            dsts = e.select(F.col("dst").alias("id")).distinct()
            both = srcs.join(dsts, "id")  # has in AND out
            trivial = remaining.join(both, "id", "left_anti")
            n_triv = trivial.count()
            if n_triv == 0:
                break
            _accumulate(trivial.select("id", F.col("id").alias("component")))
            remaining = remaining.join(both, "id").localCheckpoint(eager=True)
            n_remaining -= n_triv
            e = (
                e.join(remaining.select(F.col("id").alias("src")), "src")
                .join(remaining.select(F.col("id").alias("dst")), "dst")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            metrics.record(kind="scc_trim", round=rnd, trimmed=n_triv)
        if n_remaining == 0:
            break

        # ---- 2. COLOR: forward min propagation to fixpoint
        colors = remaining.select("id", F.col("id").alias("color"))
        for it in range(1, max_iter + 1):
            nbr = (
                e.join(colors.select(F.col("id").alias("src"), "color"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("nbr_min"))
            )
            new_colors = (
                colors.join(nbr, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("color"), F.coalesce("nbr_min", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_colors.join(
                    colors.select("id", F.col("color").alias("old")), "id"
                )
                .filter(F.col("color") != F.col("old"))
                .count()
            )
            colors = new_colors
            if changed == 0:
                break

        # ---- 3. PEEL: backward reachability to the root within each class
        marked = colors.filter(F.col("id") == F.col("color")).select(
            "id", "color"
        ).localCheckpoint(eager=True)
        ce = (
            e.join(colors.select(F.col("id").alias("src"),
                                 F.col("color").alias("c_src")), "src")
            .join(colors.select(F.col("id").alias("dst"),
                                F.col("color").alias("c_dst")), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_marked = marked.count()
        while True:
            grow = (
                ce.join(marked.select(F.col("id").alias("dst"), "color"), "dst")
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(marked.select(F.col("id").alias("id")), "id", "left_anti")
            )
            new_marked = marked.union(grow).localCheckpoint(eager=True)
            n_new = new_marked.count()
            if n_new == n_marked:
                break
            marked, n_marked = new_marked, n_new

        _accumulate(marked.select("id", F.col("color").alias("component")))
        remaining = remaining.join(
            marked.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        n_peeled = n_marked
        n_remaining -= n_peeled
        e = (
            e.join(remaining.select(F.col("id").alias("src")), "src")
            .join(remaining.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        metrics.record(
            kind="scc_round", round=rnd, peeled=n_peeled,
            remaining=n_remaining, wall_s=time.time() - t0,
        )
    else:
        if n_remaining > 0:
            raise RuntimeError(
                f"strongly_connected_components: {n_remaining} vertices "
                f"unresolved after max_rounds={max_rounds} (adversarial "
                "SCC chain); raise max_rounds"
            )

    if done is None:
        done = all_verts.select("id", F.col("id").alias("component")).limit(0)
    # vertices present only as self-loops (or isolated in the caller's
    # table) are their own SCCs
    rest = all_verts.join(done.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return done.union(rest)
