"""Engine configuration.

Mirrors the reference CLI surface (/root/reference/main.cpp:609-769) as a
dataclass: convergence threshold (-h), threshold cycling (-i), early
termination (-t 1..4), coloring (-c/-o), one-phase (-p), plus Spark-native
knobs (broadcast threshold, shuffle partitions, skew salting) that replace
Vite's -b edge-balanced partitioning and MPI tuning flags.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field


# Reference constants (/root/reference/utils.hpp:67-73, louvain.hpp:68-74)
TERMINATION_PHASE_COUNT = 200
MAX_TOTAL_ITERATIONS = 10_000
CONVERGENCE_THRESHOLD = 1.0e-6
ET_CUTOFF = 2          # freeze after community unchanged for this many extra iters (t1/t3)
P_CUTOFF = 0.02        # probability floor for probabilistic ET (t2/t4)
ET_ALPHA = 0.5         # probability decay for t2/t4 (louvain.cpp:384)
ET_PHASE_ABORT_FRACTION = 0.9  # documented intent of t3/t4 (README:358-369)


def threshold_for_phase(phase: int) -> float:
    """Threshold-cycling schedule (-i), /root/reference/main.cpp:249-263.

    1e-3 for phases 0-2, 1e-4 for 3-6, 1e-5 for 7-9, 1e-6 for 10-12,
    then the 13-phase pattern repeats.
    """
    p = phase % 13
    if p <= 2:
        return 1.0e-3
    if p <= 6:
        return 1.0e-4
    if p <= 9:
        return 1.0e-5
    return 1.0e-6


# Per-partition edge-row target for the packed kernels' scale-adaptive
# partitioning (guide §2: derive parallelism from input size, not a
# constant tuned to one mode). Each pack partition should carry enough
# rows that its per-superstep NumPy sweep dominates the fixed per-task
# dispatch cost (measured ~7 ms/task + ~190 ms/job on this host); 2M rows
# ≈ 30-60 ms of sweep per task. Overridable for clusters whose task
# dispatch or memory profile differs.
PACK_EDGES_PER_PART = int(
    os.environ.get("SPARK_GRAFT_PACK_EDGES_PER_PART", "4000000"))


def adaptive_pack_nparts(requested: int, ne: int | None,
                         target: int | None = None) -> int:
    """Cap the packed-kernel partition count so each partition holds
    ~``target`` units of per-superstep work (edge rows for the linear
    gather kernels; callers with superlinear per-partition work — the
    triangle wedge probe, the Louvain argmax sweep — pass their own work
    estimate/target). Only CAPS (never raises): large inputs keep the
    session's full parallelism, while small inputs stop paying nparts
    task dispatches + nparts² exchange files per superstep for
    microseconds of per-task work. Callers apply this only when
    cfg.shuffle_partitions is None — an explicit config pin (parity
    tests, resume-across-nparts tests, scaling probes) is honored as-is.
    """
    if not ne or ne <= 0 or requested <= 1:
        return requested
    t = target or PACK_EDGES_PER_PART
    return max(1, min(int(requested), -(-int(ne) // t)))


def resolve_scratch(scratch_dir: str | None) -> str | None:
    """Effective scratch dir for the packed kernels' pack/state/delta
    files. Explicit cfg value wins; $SPARK_GRAFT_SCRATCH next; else
    /dev/shm when present (single-node tmpfs: no disk writeback in the
    superstep path — measured ~2x on per-iteration walls at sf0.1 and
    2-3x step-wall variance on /tmp at 24M vertices); else None (system
    tempdir). On a multi-node cluster pass the shared scratch explicitly
    (cfg.scratch_dir), and set SPARK_GRAFT_SCRATCH=/tmp when the tmpfs
    is too small for the pack (~16 B/edge + per-run state)."""
    if scratch_dir is not None:
        return scratch_dir
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env or None
    return "/dev/shm" if os.path.isdir("/dev/shm") else None


@dataclass
class EngineConfig:
    # Convergence (reference -h / utils.hpp:71-73)
    threshold: float = CONVERGENCE_THRESHOLD
    # Threshold cycling (reference -i / main.cpp:249-263)
    threshold_cycling: bool = False
    # Stop after a single phase (reference -p)
    one_phase: bool = False
    # Early termination mode: 0=off, 1..4 = reference -t 1..4
    early_term: int = 0
    # Use distance-1 coloring (reference -c) / vertex ordering (-o)
    coloring: bool = False
    vertex_ordering: bool = False
    max_phases: int = TERMINATION_PHASE_COUNT
    max_total_iterations: int = MAX_TOTAL_ITERATIONS

    # --- Spark-native execution knobs ---
    # Broadcast per-vertex/per-community state when the row count is below
    # this (replaces Vite's ghost-exchange: small state ships to every
    # executor instead of shuffling the big edge table).
    broadcast_max_rows: int = 5_000_000
    # Degree above which a vertex's adjacency is salted into this many
    # sub-groups for two-stage aggregation (replaces reference -b edge
    # balancing, distgraph.cpp:72-116).
    skew_degree_threshold: int = 1_000_000
    skew_salt_parts: int = 32
    # Explicit two-stage salted aggregation for the L4 counter: stage 1
    # groups by (src, comm, salt(dst)) so a super-hub vertex's counter is
    # built by skew_salt_parts tasks before the final merge. Identical
    # results (integer-weight exact); parity-tested. OFF by default: the
    # map-side partial hash agg + AQE skew-join splitting already collapse
    # hub counters before the shuffle, and the extra stage costs ~1 shuffle
    # on the non-skewed bulk. FLIP THIS ON when a phase runs the
    # shuffle-join superstep (not the packed-CSR path) AND the degree
    # distribution has hubs above ~10^6 neighbors (check
    # graph_stats.max_vdeg) — that is where one reducer would otherwise
    # build a 10^6-row counter group alone.
    explicit_salting: bool = False
    # Shuffle partitions for superstep joins; None = session default.
    shuffle_partitions: int | None = None
    # Checkpoint directory for per-superstep resumable state (None =
    # localCheckpoint only, not resumable across processes).
    checkpoint_dir: str | None = None
    # Checkpoint every k supersteps (1 = every superstep, per north_star).
    # Lineage is ALWAYS cut eagerly once per superstep regardless — the
    # superstep plan references the assignment in several branches, and
    # analyzed plans don't share subtrees, so uncut plans grow
    # exponentially across iterations.
    checkpoint_every: int = 1
    # Use the packed-CSR delta-replay fast path (kernels/csr.py) for
    # distributed phases when its preconditions hold (local master,
    # dense-ish ids); falls back to the shuffle-join superstep otherwise.
    use_csr_kernel: bool = True
    # Packed-CSR state representation switch: at most this many dense ids
    # run the full per-worker state MIRROR (kernels/csr.py — O(nv) arrays
    # per worker process, fastest constant); beyond it the phase runs the
    # SHARDED state kernel (kernels/csr_sharded.py — O(nv/p + |universe_p|)
    # per partition, Vite's localCinfo/remoteCinfo memory model), which has
    # no dense-id ceiling. 5M ids ≈ 200 MB mirror per worker.
    csr_mirror_max_ids: int = 5_000_000
    # Force the sharded kernel at any size (parity tests / benchmarks).
    csr_force_sharded: bool = False
    # Retired v1 knob (kept so existing configs construct): the v2
    # sharded kernel keeps no snapshot/replay chain — per-partition state
    # is saved fresh each superstep and deltas are reader-routed, so
    # there is nothing to snapshot on an interval.
    csr_snapshot_every: int = 1
    # Persistent pack cache for the SHARDED kernel (the fileConvert-once
    # analog of the reference, convert.cpp:102-281: convert an immutable
    # graph once, run many analyses against the binary). When set, the
    # level-0 sharded pack (adjacency, universes, bounds, routes) is
    # written to <dir>/vite_pack on first use and REUSED by later runs —
    # only per-run transients (moves, flows, states) are recreated.
    # Caller contract: every run pointing here must use the SAME edge
    # table and shuffle-partition count; coarse levels never use the
    # cache. Intended for repeated benchmark/analysis runs.
    pack_cache_dir: str | None = None
    # Scratch directory for the packed-CSR kernels' pack/state/delta
    # files (None = the system tempdir). The files are the worker-to-
    # worker exchange medium (shared scratch on a real cluster); on one
    # node a tmpfs like /dev/shm removes disk writeback stalls from the
    # superstep path entirely — measured 2-3x step-wall variance on /tmp
    # at 24M vertices from pack+delta writeback alone. Caller's choice
    # because tmpfs capacity (typically RAM/2) must fit the pack.
    scratch_dir: str | None = None
    # Adaptive execution: when a level's edge table has at most this many
    # rows, run the whole phase driver-local on CSR NumPy kernels (the
    # oracle-validated sweep) instead of distributed supersteps. Coarse
    # levels always shrink below this, so deep levels never pay cluster
    # latency — mirroring how Vite's coarse phases collapse onto few ranks.
    # Kept small (100k rows ≈ a few ms of NumPy) so any real level-0 graph
    # — including the sf0.1 benchmark graph — runs the DISTRIBUTED path;
    # set to 0 to force the distributed path everywhere (scaling bench does).
    local_phase_max_edges: int = 100_000
    # COARSE-level (phase ≥ 1) local-tier gate for Louvain only: coarse
    # graphs already shrank by a level of coarsening, so the distributed
    # path's per-level fixed costs (pack build + one job per superstep)
    # dominate NumPy sweep time far beyond the level-0 gate. Measured at
    # sf0.1 (level-1 ≈ 190k super-edges): 6.02 vs 6.26 s whole-operator
    # medians, labels/Q/supersteps identical. Applied only when
    # local_phase_max_edges > 0 (= 0 forces the distributed path
    # everywhere — the scaling bench contract — and disables this too).
    local_phase_coarse_max_edges: int = 1_000_000
    # Borůvka MSF adaptive contraction tier (algos/msf.py): when a
    # round's picked pseudo-forest (one edge per active component) has
    # at most this many rows, the contraction map is computed
    # driver-local (NumPy min-label + pointer doubling) and broadcast —
    # the relabel join becomes map-side. Above it, the distributed
    # two-phase CC contraction runs. The threshold is the crossover
    # between the local tier's SERIAL cost (toPandas + pointer-doubling
    # union-find + createDataFrame: measured ~5 s/M rows, independent
    # of cores) and the distributed tier's wall (measured ~25 s on a
    # 746k-pair round-1 pseudo-forest at 16 cores — two-phase CC is
    # O(log)-rounds of small jobs, floor-bound at this size regardless
    # of cores). Local wins until the map is several million rows;
    # beyond that (a 10⁹-vertex round 1) the distributed tier both
    # fits memory and finally has enough per-round work to scale.
    msf_local_contract_max_rows: int = 4_000_000

    extra: dict = field(default_factory=dict)
