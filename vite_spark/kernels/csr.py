"""CSR-packed Arrow-UDF Louvain superstep — the BASELINE.json fast path.

One superstep = one job over partition ids. Per task the kernel mmaps its
partition's pre-packed adjacency (one-time pack, zero edge bytes over Arrow
per superstep) and sweeps the whole L4+L5 gather-scatter vectorized
(segment reduceat argmax) — no per-row Python anywhere.

State model (round-2 redesign — no O(nv) driver state, no O(nv) broadcast):
every python worker process keeps a full mirror of the mutable per-vertex /
per-community state (curr, comm_deg, comm_size) in a process-level cache
and advances it by applying per-superstep MOVE DELTAS, each broadcast
exactly once (O(moved) bytes, not O(nv)). The static arrays (vdeg, self_w,
presence) are assembled once per worker from the per-partition pack files.
The driver holds only scalars and the (small) delta broadcast handles — it
never materializes an nv-sized array. This is the Spark re-expression of
Vite's model (louvain.cpp:2583-2954): static local CSR per rank, only the
mutable community state is exchanged per iteration.

Cluster contract: the pack files require that every superstep task can read
the partition files it needs — true in local mode (one filesystem) and on
any shared-scratch cluster; the caller (algos/louvain.py) gates this path
on a local master and falls back to the shuffle-join superstep otherwise.
The delta broadcasts themselves are cluster-correct (torrent broadcast).

Decision semantics are IDENTICAL to the NumPy oracle
(vite_spark/oracle/louvain_ref.py) — gain/tie-break/guard are the same
algorithm applied per partition; parity is pytest-enforced.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


def sweep_partition_np(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    curr: np.ndarray,       # nv-sized: vertex → community
    vdeg: np.ndarray,       # nv-sized
    self_w: np.ndarray,     # nv-sized
    comm_deg: np.ndarray,   # nv-sized (community id space == vertex ids)
    comm_size: np.ndarray,
    const: float,
):
    """Louvain decisions for the vertices whose FULL adjacency is in this
    partition. Returns (ids, cc, new_comm, e_cc) for distinct src."""
    c_dst = curr[dst]
    # ONE grouping sort of (src, neighbor community) keys; everything after
    # is O(n) segment arithmetic (reduceat) — no further sorts, no unique,
    # no searchsorted (those dominated an earlier lexsort-based version)
    nvl = np.int64(len(curr))
    key = src * nvl + c_dst
    order = np.argsort(key, kind="stable")
    ks, ws = key[order], w[order]
    start = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    e_vc = np.add.reduceat(ws, start)
    gk = ks[start]
    g_src = (gk // nvl).astype(np.int64)
    g_comm = (gk % nvl).astype(np.int64)

    # vertex segments over the grouped rows (g_src is non-decreasing)
    new_seg = np.r_[True, g_src[1:] != g_src[:-1]]
    seg_id = np.cumsum(new_seg) - 1          # per grouped row → vertex index
    ids = g_src[new_seg]
    n_seg = len(ids)

    cc = curr[ids]
    e_cc = np.zeros(n_seg)
    own = g_comm == curr[g_src]
    e_cc[seg_id[own]] = e_vc[own]

    eix = e_cc - self_w[ids]
    ax = comm_deg[cc] - vdeg[ids]

    cand = ~own
    cs_seg = seg_id[cand]
    ccomm = g_comm[cand]
    gain = (
        2.0 * (e_vc[cand] - eix[cs_seg])
        - 2.0 * vdeg[ids][cs_seg] * (comm_deg[ccomm] - ax[cs_seg]) * const
    )
    pos_m = gain > 0.0
    cs_seg, ccomm, gain = cs_seg[pos_m], ccomm[pos_m], gain[pos_m]

    new_comm = cc.copy()
    if cs_seg.size:
        # cs_seg is still sorted; per-segment lexicographic argmax
        # (max gain, min comm) via two reduceats
        bnew = np.r_[True, cs_seg[1:] != cs_seg[:-1]]
        bounds = np.flatnonzero(bnew)
        segs = cs_seg[bounds]                          # segments w/ candidates
        max_g = np.maximum.reduceat(gain, bounds)
        row_max = np.repeat(max_g, np.diff(np.r_[bounds, len(gain)]))
        at_max = gain == row_max
        comm_masked = np.where(at_max, ccomm, np.iinfo(np.int64).max)
        c_best = np.minimum.reduceat(comm_masked, bounds)
        # singleton-swap guard (louvain.cpp:2275-2276)
        keep = ~(
            (comm_size[c_best] == 1)
            & (comm_size[cc[segs]] == 1)
            & (c_best > cc[segs])
        )
        new_comm[segs[keep]] = c_best[keep]
    return ids, cc, new_comm, e_cc


def csr_superstep(
    edges: DataFrame,
    state_bcast,            # pyspark Broadcast of (curr, vdeg, self_w, cd, cs)
    const: float,
) -> DataFrame:
    """decisions(id, cc, new_comm, e_cc) via one Arrow pass over edges.

    ``edges`` must be partitioned so each src's adjacency is wholly inside
    one partition (repartition(N, "src") gives exactly that).

    One-shot variant (full state broadcast, edges streamed): remains as the
    no-local-disk fallback and for single-sweep uses; iterative phases use
    the packed + delta-replay machinery below."""

    def run(pdf_iter):
        import pandas as pd

        curr, vdeg, self_w, cd, cs = state_bcast.value
        # mapInPandas yields Arrow batches; a vertex's adjacency may span
        # batches within the partition — pack the whole partition first
        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        ids, cc, new_comm, e_cc = sweep_partition_np(
            pdf["src"].to_numpy(np.int64),
            pdf["dst"].to_numpy(np.int64),
            pdf["weight"].to_numpy(np.float64),
            curr, vdeg, self_w, cd, cs, const,
        )
        yield pd.DataFrame(
            {"id": ids, "cc": cc, "new_comm": new_comm, "e_cc": e_cc}
        )

    return edges.mapInPandas(
        run, schema="id long, cc long, new_comm long, e_cc double"
    )


def pack_csr_partitions(edges: DataFrame, pack_dir: str, nparts: int) -> dict:
    """ONE Arrow pass per phase: pack each src-hash partition's adjacency
    into raw .npy files under pack_dir (the literal 'CSR-packed adjacency
    partitions' of BASELINE.json), together with the partition's OWNED
    vertex statics: distinct src ids, their weighted degrees and self-loop
    weights (louvain.cpp:2161-2186 computed per rank). Supersteps then
    never re-stream the edge table — tasks mmap their partition's arrays
    from the OS page cache and only move deltas travel.

    Returns {"ne": rows, "nv": owned vertices, "max_id": max id seen,
    "two_m": total weight} aggregated from per-partition sentinels — the
    driver never holds an nv-sized array.
    """
    import os

    os.makedirs(pack_dir, exist_ok=True)

    def pack(pdf_iter):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in pdf_iter if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            w = pdf["weight"].to_numpy(np.float64)
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            w = np.empty(0, np.float64)
        # pre-sort by (src, dst): the superstep's grouping sort then runs
        # on almost-sorted keys, and segments are contiguous
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        # owned statics: every edge of v lives in v's src partition, so the
        # per-partition degree sums are exact (no cross-partition merge)
        if len(src):
            first = np.r_[True, src[1:] != src[:-1]]
            starts = np.flatnonzero(first)
            own = src[starts]
            vdeg = np.add.reduceat(w, starts)
            sw = np.zeros_like(vdeg)
            self_rows = src == dst
            if self_rows.any():
                seg_of_row = np.cumsum(first) - 1
                np.add.at(sw, seg_of_row[self_rows], w[self_rows])
            max_id = int(max(src.max(), dst.max()))
        else:
            own = np.empty(0, np.int64)
            vdeg = np.empty(0, np.float64)
            sw = np.empty(0, np.float64)
            max_id = -1
        for name, arr in (("src", src), ("dst", dst), ("w", w),
                          ("own", own), ("vdeg", vdeg), ("selfw", sw)):
            _atomic_save(os.path.join(pack_dir, f"{name}_{pid}.npy"), arr)
        import pandas as pd

        yield pd.DataFrame({
            "pid": [pid], "rows": [len(src)], "nown": [len(own)],
            "max_id": [max_id], "sum_w": [float(w.sum())],
        })

    res = edges.mapInPandas(
        pack, schema="pid int, rows long, nown long, max_id long, sum_w double"
    ).collect()
    return {
        "ne": int(sum(r["rows"] for r in res)),
        "nv": int(sum(r["nown"] for r in res)),
        "max_id": max((r["max_id"] for r in res), default=-1),
        "two_m": float(sum(r["sum_w"] for r in res)),
    }


def _atomic_save(path: str, arr: np.ndarray) -> None:
    """np.save via tmp+rename: task retries / speculative duplicates write
    the same deterministic bytes, and readers never see a torn file."""
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:   # handle, not path: np.save(path) appends .npy
        np.save(f, arr)
    os.replace(tmp, path)


# Per-worker-process state cache: pack_dir → mutable replayed state. Python
# workers are reused across jobs (spark.python.worker.reuse), so in steady
# state each superstep applies only the newest delta. At most ONE phase's
# state is kept per worker (older pack_dirs evicted on first touch of a new
# one).
_WORKER_STATE: dict = {}


def _assemble_static(pack_dir: str, nparts: int, nv_dense: int):
    """Full static arrays from the per-partition pack files (once per
    worker process per phase; reads ride the shared OS page cache)."""
    import os

    vdeg = np.zeros(nv_dense)
    self_w = np.zeros(nv_dense)
    present = np.zeros(nv_dense, dtype=bool)
    for p in range(nparts):
        own = np.load(os.path.join(pack_dir, f"own_{p}.npy"))
        if len(own) == 0:
            continue
        vdeg[own] = np.load(os.path.join(pack_dir, f"vdeg_{p}.npy"))
        self_w[own] = np.load(os.path.join(pack_dir, f"selfw_{p}.npy"))
        present[own] = True
    return vdeg, self_w, present


def _replayed_state(pack_dir: str, nparts: int, nv_dense: int, deltas,
                    cache: bool = True) -> dict:
    """State after applying deltas[0..len-1] to the singleton init
    (louvain.cpp:2564-2581). With cache=True the worker's persistent mirror
    is advanced incrementally (typically by exactly one delta); cache=False
    replays fresh (used by the label job, which may need an EARLIER state
    than the cached one)."""
    st = _WORKER_STATE.get(pack_dir) if cache else None
    if st is None or st["applied"] > len(deltas):
        vdeg, self_w, present = _assemble_static(pack_dir, nparts, nv_dense)
        st = {
            "applied": 0,
            "curr": np.arange(nv_dense, dtype=np.int64),
            "cd": vdeg.copy(),
            "cs": present.astype(np.int64),
            "vdeg": vdeg,
            "self_w": self_w,
        }
        if cache:
            _WORKER_STATE.clear()   # at most one phase's mirror per worker
            _WORKER_STATE[pack_dir] = st
    for j in range(st["applied"], len(deltas)):
        mid, mnew = deltas[j].value
        mold = st["curr"][mid]
        st["curr"][mid] = mnew
        np.add.at(st["cd"], mnew, st["vdeg"][mid])
        np.add.at(st["cs"], mnew, 1)
        np.subtract.at(st["cd"], mold, st["vdeg"][mid])
        np.subtract.at(st["cs"], mold, 1)
        st["applied"] = j + 1
    return st


def _pid_frame(spark, nparts: int):
    # range with numPartitions=nparts → one pid per partition, NO shuffle
    from pyspark.sql import functions as F

    return spark.range(0, nparts, 1, nparts).select(
        F.col("id").cast("int").alias("pid")
    )


def csr_superstep_packed(
    spark,
    pack_dir: str,
    nparts: int,
    nv_dense: int,
    const: float,
    deltas: list,
) -> DataFrame:
    """Superstep over packed partitions with delta-replayed worker state.

    The job maps over partition ids only; each task advances its worker's
    state mirror to S_{k-1} (k-1 = len(deltas)), reports this partition's
    a-term partial Σ cd[owned]² at S_{k-1} (= the POST-move a-term of
    superstep k-1 — modularity is therefore assembled one job later by the
    driver, louvain.cpp:2468-2532), sweeps, and returns the move rows plus
    one sentinel row (id = -1) with (e_part, a_part, moved).

    Output schema: (id, new_comm, e_part, a_part, moved).
    """

    def run(pdf_iter):
        import os

        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                st = _replayed_state(pack_dir, nparts, nv_dense, deltas)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                a_part = float((st["cd"][own] ** 2).sum())
                src = np.load(os.path.join(pack_dir, f"src_{pid}.npy"),
                              mmap_mode="r")
                if len(src) == 0:
                    yield pd.DataFrame({
                        "id": [np.int64(-1)], "new_comm": [np.int64(0)],
                        "e_part": [0.0], "a_part": [a_part],
                        "moved": [np.int64(0)],
                    })
                    continue
                dst = np.load(os.path.join(pack_dir, f"dst_{pid}.npy"),
                              mmap_mode="r")
                w = np.load(os.path.join(pack_dir, f"w_{pid}.npy"),
                            mmap_mode="r")
                ids, cc, new_comm, e_cc = sweep_partition_np(
                    np.asarray(src), np.asarray(dst), np.asarray(w),
                    st["curr"], st["vdeg"], st["self_w"], st["cd"], st["cs"],
                    const,
                )
                mvd = new_comm != cc
                nm = int(mvd.sum())
                yield pd.DataFrame({
                    "id": np.r_[ids[mvd], np.int64(-1)],
                    "new_comm": np.r_[new_comm[mvd], np.int64(0)],
                    "e_part": np.r_[np.zeros(nm), e_cc.sum()],
                    "a_part": np.r_[np.zeros(nm), a_part],
                    "moved": np.r_[np.zeros(nm, np.int64), np.int64(nm)],
                })

    return _pid_frame(spark, nparts).mapInPandas(
        run,
        schema="id long, new_comm long, e_part double, a_part double, moved long",
    )


def csr_labels_packed(
    spark, pack_dir: str, nparts: int, nv_dense: int, deltas: list
) -> DataFrame:
    """(id, comm) for every present vertex at the state after applying
    ``deltas`` — each task emits labels for its OWNED vertices only, so the
    assignment is produced fully distributed (the driver never holds it).
    Replays fresh (cache bypassed): the requested state is usually EARLIER
    than the worker mirrors (the phase protocol returns pastComm)."""

    def run(pdf_iter):
        import os

        import pandas as pd

        st = None
        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                if len(own) == 0:
                    continue
                if st is None:  # one replay per task, shared across its pids
                    st = _replayed_state(pack_dir, nparts, nv_dense, deltas,
                                         cache=False)
                yield pd.DataFrame({"id": own, "comm": st["curr"][own]})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="id long, comm long"
    )
