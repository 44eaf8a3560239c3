"""Packed-CSR connected components (min-label propagation) on the sharded
pack — the fourth north-rule-named algorithm over the shared kernel
infrastructure (Louvain kernels/csr*.py, PageRank kernels/csr_pr.py, LPA
kernels/csr_lpa.py).

The join-path `algos/components.connected_components` runs the identical
Jacobi operator — label_{t+1}(v) = min(label_t(v), min over N(v)) — as one
shuffle join + grouped min per superstep; measured 0.432 per-core scaling
efficiency 4→16 (BENCH.md r4) because at verification scale each round's
parallel work is small and the fixed per-round job machinery dominates.
This kernel runs the same operator over the sharded CSR pack
(kernels/csr_sharded.py: 1-D range ownership, per-partition sorted
universe ux, pack-time req_{owner}_{reader} interest sets), and it is the
SIMPLEST of the packed kernels: labels are integers (no float-order
domain gate — min is associative/commutative/idempotent, so every
summation order is exact), state is owner-authored like LPA's, and the
pack's (src, dst)-sorted row order means the per-iteration sweep needs no
grouping sort at all — srcl is non-decreasing, so the neighbor minimum is
ONE gather plus `np.minimum.reduceat` over the existing segment bounds.

Per iteration, ONE job; task p:

1. **Gather** curr over U_p at t-1 (identity at t=1) by slicing each
   owner's `cown_{t-1}_{q}` vector through the static req sets into the
   contiguous universe spans (the ascending-id-run invariant the Louvain
   dense advance and the LPA/PageRank exchanges use). Exchange volume is
   Σ_p |U_p| int64s per iteration — the ghost-set lower bound.
2. **Sweep**: nbr_min[s] = min over the partition's rows of curr[dstl]
   per src segment (minimum.reduceat; own = unique(src), so segments
   enumerate own indices densely — asserted); new = min(old, nbr_min).
3. Save `cown_{t}_{p}` (O(nv/p)); the changed count rides the sentinel
   row. Driver stops when Σ changed == 0 — the fixpoint is the exact
   `connected_components` contract (component = min vertex id), and the
   ITERATES match the join path one-for-one (same Jacobi operator on the
   same integers), so per-iteration changed counts are pytest-comparable.

Scale shape: per-partition memory O(nv/p + |U_p|), nothing O(nv) on any
worker, scalars only on the driver — the same 100×-survivability argument
as the LPA/PageRank kernels. Min-propagation converges in O(diameter)
iterations; for high-diameter graphs at cluster scale the
O(log²)-round `connected_components_twophase` (large-star/small-star)
remains the right DataFrame shape, and the join path remains the
multi-cluster fallback for non-local masters and open (non-vertex-closed)
inputs.

Reference analog: Vite has no CC; the owner-authored dense exchange is
its fillRemoteCommunities send shape (/root/reference/louvain.cpp:
2583-2954) at the always-dense operating point, shared with csr_lpa.py.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np

from vite_spark.kernels.csr import _atomic_save, _pid_frame
from vite_spark.kernels.csr_pr import _prepare_pack
from vite_spark.kernels.csr_sharded import (
    _load_bounds,
    _req_of,
    _ux_owner_span,
)

CC_TRANSIENT_PREFIXES = ("cown_",)


def _cc_job(spark, pack_dir, nparts, t, routing, ckpt_dir=None):
    """Iteration ``t``: gather labels at t-1, per-src neighbor min, save
    cown_{t}; one sentinel row (pid, changed) per partition. When
    ``ckpt_dir`` is set, each task also copies its new state vector there
    (runtime/iter_checkpoint.py layout; the driver commits the marker
    after the job returns)."""
    owners_of, _ = routing

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"),
                              mmap_mode="r")
                if len(own) == 0:
                    yield pd.DataFrame(
                        {"pid": [pid], "changed": [np.int64(0)]})
                    continue
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"),
                             mmap_mode="r")

                # --- gather curr over U_p at t-1 ---
                if t == 1:
                    curr = np.asarray(ux, dtype=np.int64)  # identity; read-only below
                else:
                    starts, bpids = _load_bounds(pack_dir)
                    curr = np.empty(len(ux), np.int64)
                    for q in owners_of.get(pid, ()):
                        lo, hi = _ux_owner_span(ux, starts, bpids, q)
                        req = _req_of(pack_dir, q, pid)
                        lq = np.load(os.path.join(
                            pack_dir, f"cown_{t - 1}_{int(q)}.npy"),
                            mmap_mode="r")
                        curr[lo:hi] = lq[req]
                own_pos = np.searchsorted(ux, own)
                old_own = curr[own_pos].copy()

                # --- sweep: per-src min of neighbor labels ---
                # pack rows are (src, dst)-sorted, so srcl is
                # non-decreasing and segments need no grouping sort;
                # own = unique(src) means the segments enumerate own
                # indices 0..nown-1 densely (srcl = cumsum-1 at pack time)
                srcl = np.load(os.path.join(
                    pack_dir, f"srcl_{pid}.npy"), mmap_mode="r")
                dstl = np.load(os.path.join(
                    pack_dir, f"dstl_{pid}.npy"), mmap_mode="r")
                starts_seg = np.flatnonzero(
                    np.r_[True, srcl[1:] != srcl[:-1]])
                assert len(starts_seg) == len(own), \
                    "pack invariant broken: segments must enumerate own"
                nbr_min = np.minimum.reduceat(curr[dstl], starts_seg)
                new_own = np.minimum(old_own, nbr_min)

                changed = int((new_own != old_own).sum())
                _atomic_save(
                    os.path.join(pack_dir, f"cown_{t}_{pid}.npy"), new_own)
                if ckpt_dir is not None:
                    from vite_spark.runtime.iter_checkpoint import \
                        save_shard
                    save_shard(ckpt_dir, pid, own, new_own)
                old = t - 2
                if old >= 1:
                    try:
                        os.remove(os.path.join(
                            pack_dir, f"cown_{old}_{pid}.npy"))
                    except OSError:
                        pass
                yield pd.DataFrame(
                    {"pid": [pid], "changed": [np.int64(changed)]})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="pid int, changed long"
    )


def _csr_cc_packless(spark, edges, max_iter, metrics, ne):
    """Packless single-task tier (caller gates on PACK_EDGES_PER_PART):
    ONE job maps the edge rows straight into the Jacobi min-label
    fixpoint — no range exchange, pack/route files, or per-iteration
    jobs. Integer min is order-free, so per-iteration labels and changed
    counts are identical to the packed job loop; same oracle rows cover
    it. Returns None when the input is not vertex-closed (sentinel) —
    the caller's join path handles open graphs."""
    import time as _time

    from pyspark.sql import functions as F

    def run(pdf_iter):
        import pandas as pd

        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        first = np.r_[True, src[1:] != src[:-1]]
        own = src[np.flatnonzero(first)]
        pos = np.searchsorted(own, dst)
        closed = bool((pos < len(own)).all()) and \
            bool((own[np.minimum(pos, len(own) - 1)] == dst).all())
        if not closed:
            yield pd.DataFrame({"kind": [np.int32(3)], "id": [0],
                                "component": [0]})
            return
        dstl = pos
        starts_seg = np.flatnonzero(first)
        lab = own.astype(np.int64, copy=True)
        chg = []
        for _t in range(1, max_iter + 1):
            nbr_min = np.minimum.reduceat(lab[dstl], starts_seg)
            new = np.minimum(lab, nbr_min)
            changed = int((new != lab).sum())
            chg.append(changed)
            lab = new
            if changed == 0:
                break
        yield pd.DataFrame({
            "kind": np.ones(len(chg), np.int32),
            "id": np.arange(1, len(chg) + 1, dtype=np.int64),
            "component": np.asarray(chg, dtype=np.int64),
        })
        yield pd.DataFrame({
            "kind": np.zeros(len(own), np.int32), "id": own,
            "component": lab,
        })

    t0 = _time.time()
    # no self-loop filter: the packed path packs edges as-is, and a
    # vertex with only self-loops must still receive its identity label
    mixed = edges.select("src", "dst").repartition(1).mapInPandas(
        run, schema="kind int, id long, component long"
    ).localCheckpoint(eager=True)
    wall = _time.time() - t0
    if mixed.filter(F.col("kind") == 3).count() > 0:
        return None
    crows = sorted(
        (int(r["id"]), int(r["component"]))
        for r in mixed.filter(F.col("kind") == 1).collect()
    )
    for t, c in crows:
        metrics.record(kind="cc_superstep", iter=t, changed=c,
                       wall_s=wall / max(len(crows), 1),
                       edges_processed=int(ne), mode="csr_sharded_min")
    return mixed.filter(F.col("kind") == 0).select("id", "component")


def csr_cc(spark, edges, max_iter, cfg, metrics):
    """Packed-CSR connected-components driver. Returns the
    (id, component) DataFrame, or None when a precondition fails (caller
    runs the join path): non-local master (the pack is a shared
    filesystem), or input not vertex-closed (a dst that is never a src
    has no owner to author its label)."""
    if not spark.sparkContext.master.startswith("local"):
        return None
    nparts = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ne_pre = None
    pin = None
    if (cfg.shuffle_partitions is None and not cfg.checkpoint_dir
            and not cfg.pack_cache_dir):
        from vite_spark.config import PACK_EDGES_PER_PART

        # one cache serves the gate count AND whichever tier runs next
        # (packless map or pack build) — see csr_pr's gate: without it
        # each consumer re-ran the caller's upstream derivation
        # (interleaved A/B at sf0.1: packed-CC query 4.66 s vs 7.52 s
        # medians, every pair wins). Skipped when already persisted.
        if not edges.is_cached:
            pin = edges = edges.persist()
        ne_pre = edges.count()
        if ne_pre == 0:
            if pin is not None:
                pin.unpersist()
            return None
        if ne_pre <= PACK_EDGES_PER_PART:
            try:
                # None → caller's join path (open graph)
                return _csr_cc_packless(spark, edges, max_iter, metrics,
                                        ne_pre)
            finally:
                if pin is not None:
                    pin.unpersist()
    prep = _prepare_pack(spark, edges, cfg, nparts, ne_precounted=ne_pre)
    if pin is not None:
        pin.unpersist()
    if prep is None:
        return None
    pack_dir, nparts, info, routing, cleanup = prep
    if info["nv"] == 0:
        if cleanup:
            shutil.rmtree(pack_dir, ignore_errors=True)
        return None

    from vite_spark.runtime import iter_checkpoint as ic

    ckroot = cfg.checkpoint_dir
    if nparts == 1 and not ckroot:
        # single-partition graphs: the partition owns every vertex
        # (ux == own under the vertex-closed precondition), so the whole
        # Jacobi min-label fixpoint runs inside ONE task of ONE job
        # instead of one driver-scheduled job per iteration. Integer
        # min is order-free — per-iteration labels and changed counts
        # are identical to the job loop; same oracle rows cover it.
        def run(pdf_iter):
            import pandas as pd

            for pdf in pdf_iter:
                for pid in pdf["pid"]:
                    pid = int(pid)
                    own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"),
                                  mmap_mode="r")
                    if len(own) == 0:
                        continue
                    srcl = np.load(os.path.join(
                        pack_dir, f"srcl_{pid}.npy"), mmap_mode="r")
                    dstl = np.load(os.path.join(
                        pack_dir, f"dstl_{pid}.npy"), mmap_mode="r")
                    starts_seg = np.flatnonzero(
                        np.r_[True, srcl[1:] != srcl[:-1]])
                    lab = np.asarray(own, dtype=np.int64).copy()
                    chg = []
                    for _t in range(1, max_iter + 1):
                        nbr_min = np.minimum.reduceat(lab[dstl], starts_seg)
                        new = np.minimum(lab, nbr_min)
                        changed = int((new != lab).sum())
                        chg.append(changed)
                        lab = new
                        if changed == 0:
                            break
                    yield pd.DataFrame({
                        "kind": np.ones(len(chg), np.int32),
                        "id": np.arange(1, len(chg) + 1, dtype=np.int64),
                        "component": np.asarray(chg, dtype=np.int64),
                    })
                    yield pd.DataFrame({
                        "kind": np.zeros(len(own), np.int32),
                        "id": np.asarray(own, dtype=np.int64),
                        "component": lab,
                    })

        try:
            import time as _time

            from pyspark.sql import functions as F

            t0 = _time.time()
            mixed = _pid_frame(spark, 1).mapInPandas(
                run, schema="kind int, id long, component long"
            ).localCheckpoint(eager=True)
            wall = _time.time() - t0
            crows = sorted(
                (int(r["id"]), int(r["component"]))
                for r in mixed.filter(F.col("kind") == 1).collect()
            )
            for t, c in crows:
                metrics.record(kind="cc_superstep", iter=t, changed=c,
                               wall_s=wall / max(len(crows), 1),
                               edges_processed=int(info["ne"]),
                               mode="csr_sharded_min")
            out = mixed.filter(F.col("kind") == 0).select("id", "component")
        finally:
            if cleanup:
                shutil.rmtree(pack_dir, ignore_errors=True)
            else:
                for f in os.listdir(pack_dir):
                    if f.startswith(CC_TRANSIENT_PREFIXES):
                        try:
                            os.remove(os.path.join(pack_dir, f))
                        except OSError:
                            pass
        return out
    start_t = 0
    if ckroot:
        ck = ic.latest_complete(ckroot, "cc")
        if ck is not None and ic.validate(ck, info, nparts):
            t0 = time.time()
            if ic.restore_job(spark, pack_dir, nparts,
                              ic.iter_dir(ckroot, "cc", ck["t"]),
                              f"cown_{ck['t']}"):
                start_t = min(int(ck["t"]), max_iter)
                metrics.record(kind="cc_resume", iter=start_t,
                               wall_s=time.time() - t0,
                               mode="csr_sharded_min")

    try:
        t_final = max(start_t, 1)
        for t in range(start_t + 1, max_iter + 1):
            t_final = t
            ck_dir = None
            if ckroot and t % max(cfg.checkpoint_every, 1) == 0:
                ck_dir = ic.prepare_iter(ckroot, "cc", t)
            t0 = time.time()
            sent = _cc_job(spark, pack_dir, nparts, t, routing,
                           ckpt_dir=ck_dir).collect()
            changed = int(sum(r["changed"] for r in sent))
            if ck_dir is not None:
                ic.mark_complete(ckroot, "cc", t, {
                    "changed": changed, "nv": int(info["nv"]),
                    "ne": int(info["ne"]), "nparts": nparts})
            metrics.record(kind="cc_superstep", iter=t, changed=changed,
                           wall_s=time.time() - t0,
                           edges_processed=int(info["ne"]),
                           mode="csr_sharded_min")
            if changed == 0:
                break

        def emit(pdf_iter):
            import pandas as pd

            for pdf in pdf_iter:
                for pid in pdf["pid"]:
                    pid = int(pid)
                    own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"),
                                  mmap_mode="r")
                    if len(own) == 0:
                        continue
                    lab = np.load(os.path.join(
                        pack_dir, f"cown_{t_final}_{pid}.npy"))
                    yield pd.DataFrame({"id": own, "component": lab})

        out = _pid_frame(spark, nparts).mapInPandas(
            emit, schema="id long, component long"
        ).localCheckpoint(eager=True)
    finally:
        if cleanup:
            shutil.rmtree(pack_dir, ignore_errors=True)
        else:
            for f in os.listdir(pack_dir):
                if f.startswith(CC_TRANSIENT_PREFIXES):
                    try:
                        os.remove(os.path.join(pack_dir, f))
                    except OSError:
                        pass
    return out
