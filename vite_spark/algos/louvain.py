"""Distributed Louvain as DataFrame supersteps — Vite semantics, Spark plan.

Reference parity (all citations /root/reference/louvain.cpp unless noted):
one Vite iteration == one superstep of

    L4  counter   = edges ⋈ assignment(dst) → groupBy(src, comm) sum(w)   [:2419-2466]
    L5  target    = ordered argmax of gain with exact tie-breaks           [:2220-2279]
    L6  moves     = gain > 0 moves, singleton-swap guard                   [:2275-2276]
    L7  comm_info = assignment' ⋈ degrees → groupBy(comm)                  [:2534-2547]
    L11 Q         = |Σ e_cc·const − Σ deg_c²·const²|  (pre-move e-term,
                    post-move a-term, ABS_MOD_PER_ITER default)            [:2468-2532]
    L13 protocol  = Jacobi sweep, 3-buffer rotation, break returns the
                    pastComm labels and prevMod                            [:427-592]

Vite's ghost machinery (L8/L9/L10, :2583-3397) disappears: the shuffle join
moves exactly the community records each partition references, and when the
per-vertex state table is small it is broadcast instead (replacing the
ghost exchange with a cluster-wide replica — strictly less traffic than
Vite's 3-round exchange for small state).

Scale design:
- the edge table is hash-partitioned on src once per level and persisted;
  every superstep reuses that partitioning (Vite P3, exchangeVertexReqs
  done once per phase).
- per-vertex state (assignment) and per-community state are nv-row tables:
  broadcast below cfg.broadcast_max_rows, shuffle-join above — at deep
  coarsening levels they always end up broadcast (Vite P4).
- groupBy(src, comm) does map-side partial aggregation (whole-stage
  codegen hash agg), so a high-degree vertex's counter rows collapse
  before the shuffle; residual skew is handled by AQE skew-join splitting
  plus optional salting (cfg.skew_degree_threshold; Vite -b / P2).
- lineage is cut every superstep (localCheckpoint, or parquet when a
  checkpoint dir is configured — which doubles as mid-level resume).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.config import EngineConfig
from vite_spark.graph import weighted_degrees, self_loop_weights
from vite_spark.kernels.ids import dense_ids
from vite_spark.runtime.metrics import MetricsCollector
from vite_spark.runtime import checkpoint as ckpt


def _maybe_broadcast(df: DataFrame, nrows: int, cfg: EngineConfig) -> DataFrame:
    return F.broadcast(df) if nrows <= cfg.broadcast_max_rows else df


@dataclass
class PhaseResult:
    assignment: DataFrame  # (id, comm) — the returned pastComm labels
    q: float
    iters: int
    nv: int = 0
    converged: bool = True


@dataclass
class LouvainResult:
    labels: DataFrame  # (id, comm) dense labels for original vertices
    q_per_phase: list = field(default_factory=list)
    iters_per_phase: list = field(default_factory=list)
    levels: int = 0
    metrics: MetricsCollector | None = None

    @property
    def final_q(self) -> float:
        return self.q_per_phase[-1] if self.q_per_phase else -1.0


def _superstep(
    edges: DataFrame,
    curr: DataFrame,          # (id, comm)
    comm_info: DataFrame,     # (comm, degree, size)
    vstate: DataFrame,        # (id, vdeg, self_w)
    const: float,
    nv: int,
    cfg: EngineConfig,
) -> DataFrame:
    """One Jacobi sweep. Returns decisions(id, cc, new_comm, e_cc, vdeg)."""
    curr_b = _maybe_broadcast(curr, nv, cfg)
    cinfo_b = _maybe_broadcast(comm_info, nv, cfg)

    # L4: neighbor-community counter. Self-loops contribute to the own-
    # community bucket exactly like any neighbor (louvain.cpp:2438-2463).
    counter = (
        edges.join(curr_b.select(F.col("id").alias("dst"), F.col("comm").alias("dcomm")), "dst")
        .groupBy("src", "dcomm")
        .agg(F.sum("weight").alias("evc"))
    )

    st = (
        counter.join(
            _maybe_broadcast(
                curr.join(vstate, "id").select(
                    F.col("id").alias("src"),
                    F.col("comm").alias("cc"),
                    "vdeg",
                    "self_w",
                ),
                nv,
                cfg,
            ),
            "src",
        )
    )

    own = F.col("dcomm") == F.col("cc")
    # e_cc per vertex == counter[0] (slot always exists, default 0.0)
    e_cc = (
        st.groupBy("src", "cc", "vdeg", "self_w")
        .agg(F.sum(F.when(own, F.col("evc")).otherwise(F.lit(0.0))).alias("e_cc"))
    )

    # L5 candidates: dcomm != cc, join target + current community info
    cand = (
        st.filter(~own)
        .join(
            cinfo_b.select(
                F.col("comm").alias("dcomm"),
                F.col("degree").alias("ay"),
                F.col("size").alias("tsize"),
            ),
            "dcomm",
        )
        .join(
            cinfo_b.select(
                F.col("comm").alias("cc"),
                F.col("degree").alias("cc_deg"),
                F.col("size").alias("cc_size"),
            ),
            "cc",
        )
        .join(
            e_cc.select("src", F.col("e_cc").alias("ecc0")),
            "src",
        )
    )

    gain = (
        2.0 * (F.col("evc") - (F.col("ecc0") - F.col("self_w")))
        - 2.0
        * F.col("vdeg")
        * (F.col("ay") - (F.col("cc_deg") - F.col("vdeg")))
        * F.lit(const)
    )

    # lexicographic argmax (max gain, min dcomm) among gain > 0, then the
    # singleton-swap guard — exactly louvain.cpp:2263-2276
    best = (
        cand.withColumn("gain", gain)
        .filter(F.col("gain") > 0.0)
        .groupBy("src")
        .agg(
            F.max(
                F.struct(
                    F.col("gain"),
                    (-F.col("dcomm")).alias("neg_comm"),
                    F.col("dcomm").alias("tcomm"),
                    F.col("tsize"),
                    F.col("cc_size"),
                    F.col("cc").alias("bcc"),
                )
            ).alias("m")
        )
        .select(
            "src",
            F.when(
                (F.col("m.tsize") == 1)
                & (F.col("m.cc_size") == 1)
                & (F.col("m.tcomm") > F.col("m.bcc")),
                F.col("m.bcc"),
            )
            .otherwise(F.col("m.tcomm"))
            .alias("move_comm"),
        )
    )

    decisions = (
        e_cc.join(best, "src", "left")
        .select(
            F.col("src").alias("id"),
            F.col("cc"),
            F.coalesce(F.col("move_comm"), F.col("cc")).alias("new_comm"),
            "e_cc",
            "vdeg",
        )
    )
    return decisions


def louvain_phase(
    spark: SparkSession,
    edges: DataFrame,
    threshold: float,
    lower: float = -1.0,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
    level: int = 0,
    resume_from: tuple | None = None,
) -> PhaseResult:
    """One Louvain phase (reference distLouvainMethod, louvain.cpp:427-592).

    ``edges`` must be the canonical symmetrized table for this level.
    Vertices = distinct src of edges (isolated vertices never move; callers
    compose them as identity). Returns pastComm per the reference protocol.
    """
    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()

    edges = edges.repartition(
        cfg.shuffle_partitions
        or int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        "src",
    ).persist()

    vdeg = weighted_degrees(edges)
    selfw = self_loop_weights(edges)
    vstate = (
        vdeg.join(selfw, vdeg.id == selfw.id, "left")
        .select(vdeg.id, "vdeg", F.coalesce("self_w", F.lit(0.0)).alias("self_w"))
        .persist()
    )
    row = vstate.agg(F.sum("vdeg").alias("tw"), F.count(F.lit(1)).alias("nv")).collect()[0]
    two_m, nv = float(row["tw"]), int(row["nv"])
    ne = edges.count()
    const = 1.0 / two_m

    # state init (louvain.cpp:2564-2581) or resume (north_star)
    start_iter = 0
    prev_mod = lower
    if resume_from is not None:
        curr, past, state = resume_from
        start_iter = state["iter"]
        prev_mod = state["prev_mod"]
        curr = curr.persist()
        past = past.persist()
    else:
        past = vstate.select("id", F.col("id").alias("comm")).persist()
        curr = past

    def comm_aggregates(assign: DataFrame) -> DataFrame:
        return (
            assign.join(_maybe_broadcast(vstate.select("id", "vdeg"), nv, cfg), "id")
            .groupBy("comm")
            .agg(F.sum("vdeg").alias("degree"), F.count(F.lit(1)).alias("size"))
        )

    comm_info = comm_aggregates(curr).persist()

    iters = start_iter
    while True:
        t0 = time.time()
        iters += 1

        decisions = _superstep(edges, curr, comm_info, vstate, const, nv, cfg)
        decisions = decisions.localCheckpoint(eager=True)

        srow = decisions.agg(
            F.sum("e_cc").alias("e_term"),
            F.sum(F.when(F.col("new_comm") != F.col("cc"), 1).otherwise(0)).alias("moved"),
        ).collect()[0]
        e_term, moved = float(srow["e_term"] or 0.0), int(srow["moved"] or 0)

        target = decisions.select("id", F.col("new_comm").alias("comm"))
        comm_info_next = comm_aggregates(target).persist()
        a_term = float(
            comm_info_next.agg(F.sum(F.col("degree") * F.col("degree"))).collect()[0][0]
        )
        curr_mod = abs(e_term * const - a_term * const * const)

        wall = time.time() - t0
        metrics.record(
            kind="superstep",
            level=level,
            iter=iters,
            q=curr_mod,
            delta_q=curr_mod - prev_mod,
            moved=moved,
            active=nv,
            edges_processed=ne,
            wall_s=wall,
            edges_per_sec=ne / wall if wall > 0 else 0.0,
        )

        if (curr_mod - prev_mod) < threshold:
            comm_info_next.unpersist()
            break

        prev_mod = curr_mod if curr_mod > lower else lower

        # rotation past←curr←target (louvain.cpp:565-570)
        old_past = past
        past = curr
        curr = target.localCheckpoint(eager=True)
        comm_info.unpersist()
        comm_info = comm_info_next
        if old_past is not past:
            old_past.unpersist()

        if cfg.checkpoint_dir and iters % cfg.checkpoint_every == 0:
            ckpt.write_superstep(
                cfg.checkpoint_dir,
                level,
                iters,
                curr,
                past,
                {"iter": iters, "prev_mod": prev_mod, "two_m": two_m, "nv": nv, "ne": ne},
            )

        if iters >= cfg.max_total_iterations:
            break

    edges.unpersist()
    vstate.unpersist()
    comm_info.unpersist()
    return PhaseResult(assignment=past, q=float(prev_mod), iters=iters, nv=nv)


def coarsen(edges: DataFrame, assignment: DataFrame, cfg: EngineConfig, nv: int) -> tuple[DataFrame, DataFrame]:
    """rebuild.cpp:294-478: super-edges with summed weights; communities
    renumbered densely (deterministic: ordered by community id — the
    SURVEY.md §7.4 parity contract replacing the reference's rank/insertion
    order). Returns (coarse_edges, renumber_map(comm, new_id)).
    """
    ren = dense_ids(assignment.select("comm"), "comm", "new_id")
    amap = assignment.join(F.broadcast(ren) if nv <= cfg.broadcast_max_rows else ren, "comm").select(
        "id", F.col("new_id").alias("comm")
    )
    amap_b = _maybe_broadcast(amap, nv, cfg)
    coarse = (
        edges.join(amap_b.select(F.col("id").alias("src"), F.col("comm").alias("ns")), "src")
        .join(amap_b.select(F.col("id").alias("dst"), F.col("comm").alias("nd")), "dst")
        .groupBy(F.col("ns").alias("src"), F.col("nd").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    return coarse, ren


def louvain(
    spark: SparkSession,
    edges: DataFrame,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> LouvainResult:
    """Full multi-level Louvain (reference main.cpp:242-513 protocol)."""
    from vite_spark.config import threshold_for_phase

    cfg = cfg or EngineConfig()
    metrics = metrics or MetricsCollector()
    res = LouvainResult(labels=None, metrics=metrics)

    cur_edges = edges
    comm_all: DataFrame | None = None  # (id, label) for original vertices
    prev_phase_mod = -1.0
    phase = 0
    short_phase = 0
    tot_iters = 0

    while True:
        th = threshold_for_phase(short_phase) if cfg.threshold_cycling else cfg.threshold
        pres = louvain_phase(
            spark, cur_edges, threshold=th, lower=-1.0, cfg=cfg, metrics=metrics, level=phase
        )
        tot_iters += pres.iters

        if (pres.q - prev_phase_mod) > th:
            # compose labels through this level (main.cpp:381-425)
            coarse, ren = coarsen(cur_edges, pres.assignment, cfg, nv=pres.nv)
            level_labels = pres.assignment.join(ren, "comm").select(
                "id", F.col("new_id").alias("label")
            )
            if comm_all is None:
                comm_all = level_labels.select("id", F.col("label"))
            else:
                comm_all = (
                    comm_all.join(
                        level_labels.select(
                            F.col("id").alias("label"), F.col("label").alias("nlabel")
                        ),
                        "label",
                    )
                    .select("id", F.col("nlabel").alias("label"))
                )
            comm_all = comm_all.localCheckpoint(eager=True)
            res.q_per_phase.append(pres.q)
            res.iters_per_phase.append(pres.iters)
            metrics.record(kind="phase", level=phase, q=pres.q, iters=pres.iters)
            if cfg.one_phase:
                break
            cur_edges = coarse.localCheckpoint(eager=True)
            if cfg.checkpoint_dir:
                ckpt.write_level_edges(
                    cfg.checkpoint_dir, phase + 1, cur_edges, {"phase": phase + 1}
                )
        else:
            if cfg.threshold_cycling and not cfg.one_phase and phase < 10:
                pres2 = louvain_phase(
                    spark, cur_edges, threshold=1.0e-6, lower=pres.q, cfg=cfg,
                    metrics=metrics, level=phase,
                )
                res.q_per_phase.append(pres2.q)
                res.iters_per_phase.append(pres2.iters)
            break

        prev_phase_mod = pres.q
        phase += 1
        short_phase = short_phase + 1 if short_phase < 12 else 0
        if phase >= cfg.max_phases or tot_iters > cfg.max_total_iterations:
            break

    res.labels = comm_all if comm_all is not None else edges.select(
        F.col("src").alias("id"), F.col("src").alias("label")
    ).distinct()
    res.labels = res.labels.withColumnRenamed("label", "comm")
    res.levels = phase + 1
    return res
