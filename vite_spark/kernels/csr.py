"""CSR-packed Arrow-UDF Louvain superstep — the BASELINE.json fast path.

One superstep = one `mapInPandas` pass over the persisted, src-partitioned
edge table. Per Arrow batch the kernel packs the rows into NumPy arrays and
does the whole L4+L5 gather-scatter vectorized (np.unique key grouping,
add.reduceat segment sums, lexsort argmax) against BROADCAST per-vertex /
per-community state — no shuffle at all inside the superstep, no per-row
Python anywhere. This is the literal Spark re-expression of Vite's model:
edges stay put (CSR partitions), the small mutable state travels
(broadcast ≡ ghost exchange), decisions flow back as a tiny DataFrame.

Applicable while the per-vertex state fits in a broadcast
(cfg.broadcast_max_rows); beyond that the join-based superstep in
algos/louvain.py takes over (state co-moves via shuffle joins).

The decision semantics are IDENTICAL to the NumPy oracle
(vite_spark/oracle/louvain_ref.py) — the gain/tie-break/guard code is the
same algorithm applied per partition; parity is pytest-enforced.
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

    NOTE: this streams the full edge table JVM→Arrow→Python every
    superstep (~measured 100 MB/s aggregate in local mode) — use the
    file-packed variant below for iterative runs; this one remains for
    one-shot sweeps and as the no-local-disk fallback."""

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


def pack_csr_partitions(edges: DataFrame, pack_dir: str, nparts: int) -> int:
    """ONE Arrow pass per phase: pack each src-hash partition's adjacency
    into raw .npy files under pack_dir (the literal 'CSR-packed adjacency
    partitions' of BASELINE.json). Supersteps then never re-stream the edge
    table — tasks mmap their partition's arrays from the OS page cache and
    only the (small) state travels. This IS Vite's execution model: static
    local CSR per rank, mutable state exchanged per iteration.

    On a real cluster pack_dir is executor-local scratch (same contract as
    shuffle files); in local mode it is one directory. Returns row count.
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
        np.save(os.path.join(pack_dir, f"src_{pid}.npy"), src[order])
        np.save(os.path.join(pack_dir, f"dst_{pid}.npy"), dst[order])
        np.save(os.path.join(pack_dir, f"w_{pid}.npy"), w[order])
        import pandas as pd

        yield pd.DataFrame({"pid": [pid], "rows": [len(src)]})

    res = edges.mapInPandas(pack, schema="pid int, rows long").collect()
    return int(sum(r["rows"] for r in res))


def csr_superstep_packed(
    spark,
    pack_dir: str,
    nparts: int,
    state_bcast,
    const: float,
) -> DataFrame:
    """Superstep over packed partitions. The job maps over partition ids
    only (zero edge bytes cross the JVM/Python boundary after the one-time
    pack) and returns ONLY what the driver needs: the move rows plus one
    sentinel row per partition carrying the partial e-term and move count
    (id = -1). One job, one small Arrow transfer per superstep.

    Output schema: (id, new_comm, e_part, moved); move rows have
    e_part = 0/moved = 0; sentinels have id = -1, new_comm = 0.
    """
    pids = spark.range(nparts).selectExpr("CAST(id AS INT) AS pid").repartition(
        nparts, "pid"
    )

    def run(pdf_iter):
        import os

        import pandas as pd

        curr, vdeg, self_w, cd, cs = state_bcast.value
        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                src = np.load(os.path.join(pack_dir, f"src_{pid}.npy"), mmap_mode="r")
                if len(src) == 0:
                    continue
                dst = np.load(os.path.join(pack_dir, f"dst_{pid}.npy"), mmap_mode="r")
                w = np.load(os.path.join(pack_dir, f"w_{pid}.npy"), mmap_mode="r")
                ids, cc, new_comm, e_cc = sweep_partition_np(
                    np.asarray(src), np.asarray(dst), np.asarray(w),
                    curr, vdeg, self_w, cd, cs, const,
                )
                mvd = new_comm != cc
                yield pd.DataFrame(
                    {
                        "id": np.r_[ids[mvd], np.int64(-1)],
                        "new_comm": np.r_[new_comm[mvd], np.int64(0)],
                        "e_part": np.r_[np.zeros(int(mvd.sum())), e_cc.sum()],
                        "moved": np.r_[
                            np.zeros(int(mvd.sum()), np.int64),
                            np.int64(mvd.sum()),
                        ],
                    }
                )

    return pids.mapInPandas(
        run, schema="id long, new_comm long, e_part double, moved long"
    )
