"""Sharded-state packed-CSR Louvain superstep — the beyond-the-mirror path.

The full-mirror kernel (kernels/csr.py) keeps O(nv) state arrays in every
python worker, which is the design ceiling the r2 verdict named: fine to a
few 10⁷ dense ids on one box, dead at 10⁹ on a cluster. This variant is
the faithful Spark re-expression of Vite's actual memory model
(distgraph.hpp:77-107: O(nv/p) owned state per rank; louvain.cpp:2583-2954:
localCinfo for owned communities + remoteCinfo maps for referenced ghosts):

per partition p the persistent state is
  - curr over U_p = own_p ∪ dst-universe(p)   (the ghost-vertex analog)
  - (tkeys, tcd, tcs): community aggregates for the REFERENCED community
    set = image(curr over U_p)                (the remoteCinfo analog)
  - (ocd, ocs): aggregates for OWNED community ids c ∈ own_p
    (the localCinfo analog; owned = the partition that owns vertex c,
    giving an exact disjoint partition of the global a-term Σ cd²)
— all O(|U_p| + nv/p), never O(nv).

The ghost exchange is replaced by SELF-DESCRIBING move records: each move
carries (mid, mold, mnew, csp | vdeg_mid, cdp) where cdp/csp are the
TARGET community's aggregates at the sweep state. That closes the one gap
a pure move stream leaves — when a community first enters a partition's
referenced set (only possible via an in-move of a universe vertex), its
base value is read off the very record that introduced it, then advanced
by the same superstep's flows; already-tracked communities advance by
flows alone (flow(c) = Σ vdeg of movers in − out, computable from the
stream by anyone). No second communication round, no owner lookup, no
intra-job file race: superstep k's tasks read only mv files of completed
jobs and their own pid's state snapshot.

State persistence is snapshot + replay (st_{j}_{pid}.npz every
``snapshot_every`` supersteps; intermediate states reconstructed by
replaying the O(moved) mv files), so the kernel is indifferent to which
python worker runs which partition — Spark's task placement is not sticky,
and a worker-memory cache would silently degrade to O(nparts · state).

Decision semantics are IDENTICAL to the NumPy oracle and the mirror
kernel (louvain.cpp:2220-2279 algebra; parity pytest-enforced). Weights
are integer-valued on every supported input, so flow-replayed aggregates
are bit-equal to recomputed ones and labels match exactly.

Known scale refinement (documented, not yet needed at this node count):
every partition scans the full O(moved) move stream per superstep; at
thousands of partitions the streams should be sharded by reader (the
exchangeVertexReqs analog — each writer knows, from pack-time universe
maps, which partitions reference each of its owned vertices).
"""

from __future__ import annotations

import os

import numpy as np

from vite_spark.kernels.csr import (
    _advance_et,
    _atomic_save,
    _buf,
    _grouping_order,
    _load_et,
    _pid_frame,
    _save_et,
    _take,
)


def _atomic_savez(path: str, **arrays) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def pack_csr_partitions_sharded(edges, pack_dir: str, nparts: int) -> dict:
    """One Arrow pass: per src-hash partition, write the (src,dst)-sorted
    adjacency with dst stored as int32 indices into the partition's sorted
    universe U_p (ux file) — half the bytes of global int64 dst and the
    key the sharded sweep needs — plus the owned statics (own, srcl, vdeg,
    selfw) exactly as the mirror pack (csr.py:269)."""
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
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        if len(src):
            first = np.r_[True, src[1:] != src[:-1]]
            starts = np.flatnonzero(first)
            own = src[starts]
            srcl = (np.cumsum(first) - 1).astype(np.int32)
            vdeg = np.add.reduceat(w, starts)
            sw = np.zeros_like(vdeg)
            self_rows = src == dst
            if self_rows.any():
                np.add.at(sw, srcl[self_rows].astype(np.int64), w[self_rows])
            ux = np.union1d(own, dst)          # sorted unique universe
            dstl = np.searchsorted(ux, dst).astype(np.int32)
            max_id = int(max(own.max(), dst.max()))
        else:
            own = np.empty(0, np.int64)
            srcl = np.empty(0, np.int32)
            vdeg = np.empty(0, np.float64)
            sw = np.empty(0, np.float64)
            ux = np.empty(0, np.int64)
            dstl = np.empty(0, np.int32)
            max_id = -1
        for name, arr in (("srcl", srcl), ("dstl", dstl), ("w", w),
                          ("own", own), ("vdeg", vdeg), ("selfw", sw),
                          ("ux", ux)):
            _atomic_save(os.path.join(pack_dir, f"{name}_{pid}.npy"), arr)
        yield pd.DataFrame({
            "pid": [pid], "rows": [len(src)], "nown": [len(own)],
            "nux": [len(ux)], "max_id": [max_id], "sum_w": [float(w.sum())],
        })

    res = edges.mapInPandas(
        pack,
        schema="pid int, rows long, nown long, nux long, max_id long, sum_w double",
    ).collect()
    return {
        "ne": int(sum(r["rows"] for r in res)),
        "nv": int(sum(r["nown"] for r in res)),
        "max_nown": max((r["nown"] for r in res), default=0),
        "max_nux": max((r["nux"] for r in res), default=0),
        "max_id": max((r["max_id"] for r in res), default=-1),
        "two_m": float(sum(r["sum_w"] for r in res)),
    }


def init_shard_state(spark, pack_dir: str, nparts: int):
    """One job after the pack: each partition assembles its GHOST degrees
    (vdeg over U_p, the one static that lives on other partitions) by
    probing every pack's (own, vdeg) pair — O(|U_p|·log(nv/p)) per probe,
    never a global array — and writes the singleton-init snapshot st_0:
    curr = identity over U_p, tracked = U_p with (vdeg, 1), owned
    aggregates = (vdeg_own, 1). This replaces Vite's one-time ghost setup
    (exchangeVertexReqs, distgraph)."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"))
                uvdeg = np.zeros(len(ux))
                hit = np.zeros(len(ux), dtype=bool)
                for q in range(nparts) if len(ux) else ():
                    own_q = np.load(os.path.join(pack_dir, f"own_{q}.npy"))
                    if len(own_q) == 0:
                        continue
                    vdeg_q = np.load(os.path.join(pack_dir, f"vdeg_{q}.npy"))
                    # probe the SMALL side into the big one: O(|own_q| ·
                    # log|U_p|) per pack, not O(|U_p| · log|own_q|) — at
                    # 32 partitions × 9M-entry universes the reverse
                    # direction cost ~10 min/rep at 4 cores (measured)
                    pos = np.searchsorted(ux, own_q)
                    pos_c = np.minimum(pos, len(ux) - 1)
                    m = ux[pos_c] == own_q
                    uvdeg[pos_c[m]] = vdeg_q[m]
                    hit[pos_c[m]] = True
                # symmetrized input ⇒ every universe vertex is someone's src
                assert bool(hit.all()), "universe vertex owned by no partition"
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                vdeg = np.load(os.path.join(pack_dir, f"vdeg_{pid}.npy"))
                _atomic_savez(
                    os.path.join(pack_dir, f"st_0_{pid}.npz"),
                    curr=ux.copy(),
                    tkeys=ux.copy(),
                    tcd=uvdeg,
                    tcs=np.ones(len(ux), np.int64),
                    ocd=vdeg.copy(),
                    ocs=np.ones(len(own), np.int64),
                )
                yield pd.DataFrame({"pid": [pid], "nux": [len(ux)]})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="pid int, nux long"
    ).collect()


def _load_move_stream(pack_dir: str, nparts: int, step: int):
    """Concatenated global move records of superstep ``step``:
    ints (4, m) = [mid, mold, mnew, csp], flts (2, m) = [vd, cdp]."""
    ints, flts = [], []
    for p in range(nparts):
        with np.load(os.path.join(pack_dir, f"smv_{step}_{p}.npz")) as z:
            ints.append(z["ints"])
            flts.append(z["flts"])
    return (np.concatenate(ints, axis=1) if len(ints) > 1 else ints[0],
            np.concatenate(flts, axis=1) if len(flts) > 1 else flts[0])


# Per-worker flow-table cache: the per-superstep community flow table is
# GLOBAL (identical for every partition), but each task replays it for its
# own pid — without the cache a worker serving p partitions recomputes the
# same O(moved·log moved) unique+scatter p times per superstep (measured
# dominant at 24M vertices / 4 cores). Keyed (pack_dir, step), small LRU.
_FLOW_CACHE: dict = {}
_FLOW_CACHE_MAX = 4


def _flow_table(mold, mnew, vd, cache_key=None):
    """Per-community aggregate flow of one superstep's full move stream:
    sorted unique community keys with (Σ vd in − out, count in − out)."""
    if cache_key is not None and cache_key in _FLOW_CACHE:
        return _FLOW_CACHE[cache_key]
    keys = np.concatenate([mnew, mold])
    dcd = np.concatenate([vd, -vd])
    dcs = np.concatenate([np.ones(len(mnew), np.int64),
                          -np.ones(len(mold), np.int64)])
    fkeys, inv = np.unique(keys, return_inverse=True)
    fcd = np.zeros(len(fkeys))
    fcs = np.zeros(len(fkeys), np.int64)
    np.add.at(fcd, inv, dcd)
    np.add.at(fcs, inv, dcs)
    out = (fkeys, fcd, fcs)
    if cache_key is not None:
        while len(_FLOW_CACHE) >= _FLOW_CACHE_MAX:
            _FLOW_CACHE.pop(next(iter(_FLOW_CACHE)))
        _FLOW_CACHE[cache_key] = out
    return out


def _positions(sorted_keys: np.ndarray, queries: np.ndarray):
    """(pos, mask) of ``queries`` in ``sorted_keys`` (mask = found)."""
    pos = np.searchsorted(sorted_keys, queries)
    if len(sorted_keys) == 0:
        return pos, np.zeros(len(queries), dtype=bool)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    return pos_c, sorted_keys[pos_c] == queries


def _apply_stream_sharded(st: dict, ints, flts, own: np.ndarray,
                          ux: np.ndarray, flow_key=None) -> None:
    """Advance one partition's sharded state by one superstep's global
    move stream. Order of operations matters only logically — all values
    below are taken from the PRE-step state carried in the records."""
    mid, mold, mnew, csp = ints
    vd, cdp = flts

    # 1) flows onto tracked (referenced) communities
    fkeys, fcd, fcs = _flow_table(mold, mnew, vd, cache_key=flow_key)
    tpos, tm = _positions(st["tkeys"], fkeys)
    np.add.at(st["tcd"], tpos[tm], fcd[tm])
    np.add.at(st["tcs"], tpos[tm], fcs[tm])

    # 2) flows onto owned community ids (exact disjoint a-term shard)
    opos, om = _positions(own, fkeys)
    np.add.at(st["ocd"], opos[om], fcd[om])
    np.add.at(st["ocs"], opos[om], fcs[om])

    # 3) curr over the universe
    upos, um = _positions(ux, mid)
    st["curr"][upos[um]] = mnew[um]

    # 4) newly-referenced communities: targets of universe movers that are
    # not yet tracked. Base = cdp/csp (the record's pre-step aggregates,
    # identical across co-movers) + this step's flow.
    cand = mnew[um]
    if len(cand):
        _, known = _positions(st["tkeys"], cand)
        fresh = ~known
        if fresh.any():
            nk, first = np.unique(cand[fresh], return_index=True)
            base_cd = cdp[um][fresh][first]
            base_cs = csp[um][fresh][first]
            fpos, fm = _positions(fkeys, nk)
            add_cd = np.where(fm, fcd[fpos], 0.0)
            add_cs = np.where(fm, fcs[fpos], 0)
            merged = np.concatenate([st["tkeys"], nk])
            order = np.argsort(merged, kind="stable")
            st["tkeys"] = merged[order]
            st["tcd"] = np.concatenate([st["tcd"], base_cd + add_cd])[order]
            st["tcs"] = np.concatenate(
                [st["tcs"], (base_cs + add_cs).astype(np.int64)]
            )[order]


def _prune_tracked(st: dict) -> None:
    """Shrink tracked to the live referenced set = image(curr). Image
    members are always tracked (invariant), so this is a pure subset."""
    image = np.unique(st["curr"])
    pos, m = _positions(st["tkeys"], image)
    assert bool(m.all()), "referenced community missing from tracked set"
    st["tkeys"] = image
    st["tcd"] = st["tcd"][pos]
    st["tcs"] = st["tcs"][pos].astype(np.int64)


def _load_state(pack_dir: str, nparts: int, pid: int, upto: int,
                snapshot_every: int, own: np.ndarray, ux: np.ndarray) -> dict:
    """State of partition ``pid`` after move files 1..upto: latest snapshot
    at or below ``upto`` + replay of the ≤ snapshot_every-1 newer deltas."""
    j0 = (upto // snapshot_every) * snapshot_every
    while j0 > 0 and not os.path.exists(
        os.path.join(pack_dir, f"st_{j0}_{pid}.npz")
    ):
        j0 -= snapshot_every
    with np.load(os.path.join(pack_dir, f"st_{j0}_{pid}.npz")) as z:
        st = {k: z[k].copy() for k in ("curr", "tkeys", "tcd", "tcs",
                                       "ocd", "ocs")}
    debug = bool(os.environ.get("VITE_SHARDED_DEBUG"))
    for j in range(j0 + 1, upto + 1):
        ints, flts = _load_move_stream(pack_dir, nparts, j)
        _apply_stream_sharded(st, ints, flts, own, ux,
                              flow_key=(pack_dir, j))
        if debug:
            image = np.unique(st["curr"])
            _, m = _positions(st["tkeys"], image)
            if not bool(m.all()):
                bad = image[~m]
                np.savez(f"/tmp/sharded_debug_{os.getpid()}.npz",
                         bad=bad, tkeys=st["tkeys"], curr=st["curr"],
                         ux=ux, ints=ints, flts=flts,
                         meta=np.array([j, j0, upto]))
                raise AssertionError(
                    f"image not tracked after delta {j} (from st_{j0}, "
                    f"upto {upto}): {len(bad)} missing e.g. {bad[:8].tolist()}"
                )
    return st


def sweep_partition_sharded(
    dstl: np.ndarray,        # int32 rows → index into ux
    srcl: np.ndarray,        # int32 rows → index into own
    w: np.ndarray,
    own: np.ndarray,         # sorted owned global ids
    own_pos: np.ndarray,     # positions of own inside ux
    vdeg_own: np.ndarray,
    selfw_own: np.ndarray,
    st: dict,                # sharded state at the sweep input
    nv_dense: int,
    const: float,
):
    """One Louvain sweep over a packed partition against SHARDED state —
    the exact louvain.cpp:2220-2279 algebra of csr._decide_grouped with
    community aggregates resolved through the tracked (referenced-set)
    maps instead of O(nv) arrays. Returns (ids, cc, new_comm, e_cc)."""
    curr, tkeys, tcd, tcs = st["curr"], st["tkeys"], st["tcd"], st["tcs"]
    n = len(dstl)
    nvl = np.int64(nv_dense)

    c_dst = _buf("sh_c_dst", n, np.int64)
    np.take(curr, dstl, out=c_dst)
    key = _buf("sh_key", n, np.int64)
    # upcast int32 srcl BEFORE multiplying (int32-loop overflow hazard —
    # see the same comment in csr.sweep_partition_np)
    key[:] = srcl
    key *= nvl
    key += c_dst
    order = _grouping_order(srcl, c_dst, key, int(nvl), len(own))
    ks = _take(key, order, "sh_ks")
    ws = _take(w, order, "sh_ws")
    start = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    e_vc = np.add.reduceat(ws, start)
    gk = ks[start]
    g_srcidx = gk // nvl
    g_comm = gk % nvl
    new_seg = np.r_[True, g_srcidx[1:] != g_srcidx[:-1]]

    seg_srcl = g_srcidx[new_seg]                 # per segment: own index
    ids = own[seg_srcl]
    cc = curr[own_pos[seg_srcl]]                 # global community ids
    vdeg_ids = vdeg_own[seg_srcl]
    selfw_ids = selfw_own[seg_srcl]

    seg_id = np.cumsum(new_seg) - 1
    n_seg = len(ids)
    e_cc = np.zeros(n_seg)
    own_mask = g_comm == cc[seg_id]
    e_cc[seg_id[own_mask]] = e_vc[own_mask]
    eix = e_cc - selfw_ids

    tcc, m_cc = _positions(tkeys, cc)
    assert bool(m_cc.all()), "own community not tracked"
    ax = tcd[tcc] - vdeg_ids

    cand = ~own_mask
    cs_seg = seg_id[cand]
    ccomm = g_comm[cand]
    tcan, m_can = _positions(tkeys, ccomm)
    if not bool(m_can.all()):
        bad = np.unique(ccomm[~m_can])
        raise AssertionError(
            f"candidate community not tracked: {len(bad)} distinct "
            f"(e.g. {bad[:8].tolist()}), tracked={len(tkeys)}"
        )
    gain = (
        2.0 * (e_vc[cand] - eix[cs_seg])
        - 2.0 * vdeg_ids[cs_seg] * (tcd[tcan] - ax[cs_seg]) * const
    )
    pos_m = gain > 0.0
    cs_seg, ccomm, gain = cs_seg[pos_m], ccomm[pos_m], gain[pos_m]

    new_comm = cc.copy()
    if cs_seg.size:
        bnew = np.r_[True, cs_seg[1:] != cs_seg[:-1]]
        bounds = np.flatnonzero(bnew)
        segs = cs_seg[bounds]
        max_g = np.maximum.reduceat(gain, bounds)
        row_max = np.repeat(max_g, np.diff(np.r_[bounds, len(gain)]))
        at_max = gain == row_max
        comm_masked = np.where(at_max, ccomm, np.iinfo(np.int64).max)
        c_best = np.minimum.reduceat(comm_masked, bounds)
        tb, _ = _positions(tkeys, c_best)
        keep = ~(
            (tcs[tb] == 1)
            & (tcs[tcc[segs]] == 1)
            & (c_best > cc[segs])
        )
        new_comm[segs[keep]] = c_best[keep]
    return ids, cc, new_comm, e_cc


def csr_superstep_sharded(
    spark,
    pack_dir: str,
    nparts: int,
    nv_dense: int,
    const: float,
    step: int,
    snapshot_every: int = 4,
    early_term: int = 0,
):
    """Superstep ``step`` (1-based) with sharded per-partition state.

    Protocol identical to csr.csr_superstep_packed (one scalar sentinel
    row per partition; a_part = Σ ocd² over OWNED community ids at
    S_{step-1}, i.e. the post-move a-term of the previous superstep;
    modularity assembled one job late by the driver; early_term semantics
    incl. frozen-row skipping and pinned frozen_cw e-term contributions —
    see csr.csr_superstep_packed): only the state representation differs.
    Snapshots st_{j} are written by the task that first materializes S_j
    with j % snapshot_every == 0 — always the superstep-(j+1) task of the
    same pid, so there is no cross-task write race and retries rewrite
    identical bytes."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"))
                st = _load_state(pack_dir, nparts, pid, step - 1,
                                 snapshot_every, own, ux)
                j = step - 1
                if j % snapshot_every == 0 and j > 0:
                    _prune_tracked(st)
                    _atomic_savez(
                        os.path.join(pack_dir, f"st_{j}_{pid}.npz"), **st
                    )
                    old = j - 2 * snapshot_every
                    if old > 0:
                        try:
                            os.remove(os.path.join(
                                pack_dir, f"st_{old}_{pid}.npz"))
                        except OSError:
                            pass
                a_part = float((st["ocd"] ** 2).sum())
                et = _load_et(pack_dir, pid, step - 1, own) if early_term else None
                if len(own) == 0:
                    _atomic_savez(
                        os.path.join(pack_dir, f"smv_{step}_{pid}.npz"),
                        ints=np.empty((4, 0), np.int64),
                        flts=np.empty((2, 0), np.float64),
                    )
                    if early_term:
                        _save_et(pack_dir, pid, step, et)
                    yield pd.DataFrame({
                        "pid": [pid], "e_part": [0.0], "a_part": [a_part],
                        "moved": [np.int64(0)], "frozen": [np.int64(0)],
                    })
                    continue
                dstl = np.load(os.path.join(pack_dir, f"dstl_{pid}.npy"),
                               mmap_mode="r")
                srcl = np.load(os.path.join(pack_dir, f"srcl_{pid}.npy"),
                               mmap_mode="r")
                w = np.load(os.path.join(pack_dir, f"w_{pid}.npy"),
                            mmap_mode="r")
                vdeg_own = np.load(os.path.join(pack_dir, f"vdeg_{pid}.npy"))
                selfw_own = np.load(os.path.join(pack_dir, f"selfw_{pid}.npy"))
                own_pos = np.searchsorted(ux, own)
                n_frozen = 0
                if early_term:
                    n_frozen = int((~et["active"]).sum())
                    if n_frozen:
                        rows = et["active"][srcl]   # skip frozen src rows
                        srcl, dstl, w = srcl[rows], dstl[rows], w[rows]
                if len(dstl):
                    ids, cc, new_comm, e_cc = sweep_partition_sharded(
                        dstl, srcl, w, own, own_pos, vdeg_own, selfw_own,
                        st, nv_dense, const,
                    )
                else:
                    ids = np.empty(0, np.int64)
                    cc = new_comm = ids
                    e_cc = np.empty(0)
                mvd = new_comm != cc
                mnew_m = new_comm[mvd]
                tpos, tm = _positions(st["tkeys"], mnew_m)
                assert bool(tm.all())
                _atomic_savez(
                    os.path.join(pack_dir, f"smv_{step}_{pid}.npz"),
                    ints=np.vstack([ids[mvd], cc[mvd], mnew_m,
                                    st["tcs"][tpos]]),
                    flts=np.vstack([vdeg_own[np.searchsorted(own, ids[mvd])],
                                    st["tcd"][tpos]]),
                )
                e_part = float(e_cc.sum())
                if early_term:
                    e_part += float(et["frozen_cw"][~et["active"]].sum())
                    swept = np.searchsorted(own, ids)
                    et = _advance_et(et, step, early_term, cc, new_comm,
                                     e_cc, swept)
                    _save_et(pack_dir, pid, step, et)
                yield pd.DataFrame({
                    "pid": [pid], "e_part": [e_part],
                    "a_part": [a_part], "moved": [np.int64(mvd.sum())],
                    "frozen": [np.int64(n_frozen)],
                })

    return _pid_frame(spark, nparts).mapInPandas(
        run,
        schema="pid int, e_part double, a_part double, moved long, frozen long",
    )


def csr_labels_sharded(spark, pack_dir: str, nparts: int, n_deltas: int):
    """(id, comm) for owned vertices after move files 1..n_deltas: replay
    the own-filtered move stream from the identity — O(total moves) work,
    O(nv/p) memory, fully distributed (the driver never holds labels)."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                if len(own) == 0:
                    continue
                curr = own.copy()
                for j in range(1, n_deltas + 1):
                    ints, _ = _load_move_stream(pack_dir, nparts, j)
                    mid, mnew = ints[0], ints[2]
                    pos, m = _positions(own, mid)
                    curr[pos[m]] = mnew[m]
                yield pd.DataFrame({"id": own, "comm": curr})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="id long, comm long"
    )
