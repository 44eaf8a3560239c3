"""Packed-CSR triangle counting on the sharded pack — the fifth and last
north-rule-named algorithm ("PageRank, connected components, label
propagation, triangle count") over the shared kernel infrastructure
(Louvain kernels/csr*.py, PageRank csr_pr.py, LPA csr_lpa.py, CC
csr_cc.py).

The join-path `algos/triangles.triangle_count` is the cluster-correct
DataFrame shape (degree-oriented wedge self-join + closing-edge join);
measured 0.661 per-core scaling efficiency 4→16 (BENCH.md r4) because the
O(Σ outdeg²) wedge table moves through TWO exchanges — precisely the
memory/shuffle traffic class that stops scaling past ~7 concurrent
streams on this host. This kernel keeps the identical algorithm —
degree-orientation makes every triangle a single wedge at its
minimum-order vertex — but moves the wedge traffic out of the shuffle:

Pack phase (once per input, cached like the Louvain pack):

1. **Rank relabel**: vertices get a dense rank by (degree, id) — the
   orientation order of algos/triangles._oriented — via a distributed
   two-job rank (repartitionByRange on (deg, id), per-partition counts →
   exclusive offsets → per-partition `offset + arange`). After the
   relabel, "lower (deg, id) endpoint" is simply the smaller integer, so
   the kernel never needs degree lookups.
2. **Orient + pack**: keep edges rank_src < rank_dst (each undirected
   edge once, low→high) and write the standard sharded CSR pack
   (kernels/csr_sharded.pack_csr_partitions_sharded: 1-D range ownership
   on src, per-partition sorted universe ux, (src,dst)-sorted rows,
   bounds.npz ownership table). Max oriented out-degree is bounded by
   ~sqrt(2m) (the arboricity argument), so no segment is hub-sized.

Count phase (ONE job, no shuffle, no barrier):

3. **Probe keys**: each partition's (src,dst)-sorted rows collapse to a
   single strictly-increasing int64 key array
   `krw_{pid}.npy = srcl * (|ux|+1) + dstl` — built once at pack time
   (one more pack artifact), so closing-edge membership is one
   searchsorted against an IMMUTABLE file.

Task p enumerates, per owned segment, all pairs
(v, w) = (dst[i], dst[i+k]) within the segment (per-segment dst is
ascending = orientation order, so v < w and each candidate closing edge
is queried in its stored direction exactly once). Each query is a
membership test against owner(v)'s key array (owner by the bounds
table — the getOwner analog, /root/reference/distgraph.hpp:260-271):
local queries (owner == p, the bulk under range partitioning) are
answered against p's own arrays with zero per-wedge searchsorteds (the
positions are pack coordinates the enumerator already holds); remote
queries are batched per owner to O(FLUSH) memory and probed directly
against the owner's `own/ux/krw` files. Those files are STATIC
pack-time artifacts, so reading them from any task is a lookup into an
immutable distributed index — a broadcast-join shape, not a
mutable-state exchange — which is why no second job or barrier is
needed. Single box: one read-only mmap copy in the page cache shared
by every worker. Real cluster: the same shared pack store the kernel
already requires (the reads are rank-sorted batches, one seek + one
sequential range per batch per owner).

Total = Σ hits: every triangle {a<b<c in rank order} is counted exactly
once, as wedge (b, c) at apex a with closing edge (b, c). The count is
an exact integer — no float-order domain gate needed (unlike the Louvain
sharded kernel) — and equals algos/triangles.triangle_count on every
input (same orientation, same distinct/self-loop handling;
pytest-enforced parity).

Scale shape: per-partition memory O(edges/p + FLUSH); the O(Σ outdeg²)
wedge volume never materializes anywhere — not in a shuffle (the join
path moves it through TWO exchanges), not even on scratch (the first
packed design routed it through per-reader files; the local fraction
plus static-index probes removed the files entirely) — it exists only
as per-pass NumPy transients inside the enumerating task. Nothing on
the driver but per-partition scalars. All int64 key arithmetic is
explicit-cast (NumPy 1.x value-based casting — the r3 int32-overflow
lesson, kernels/csr.py:199).

Preconditions (caller falls back to the join path on None): local
master (shared pack filesystem). Reference analog: Vite has no triangle
counting; the owner routing reuses csr_sharded.py's getOwner bounds
table, and the remote probe replaces its exchangeVertexReqs-style
request exchange (/root/reference/louvain.cpp:3251-3397) with one-sided
reads of immutable pack state — legal here precisely because, unlike
Louvain community state, the closing-edge index never changes.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np

from vite_spark.kernels.csr import _atomic_save
from vite_spark.kernels.csr_sharded import (
    _load_bounds,
    _positions,
    pack_csr_partitions_sharded,
)

# routed-query files written by the pre-r4 two-job design; scrubbed from
# reused pack caches so stale files can't linger
TRI_TRANSIENT_PREFIXES = ("twq_",)

# remote wedge queries buffered per task before a probe batch (bounds
# per-task memory; bigger batches amortize the per-owner searchsorteds)
FLUSH_PAIRS = 8_000_000


def _pid_tasks(spark, nparts):
    """pid frame with ~2 tasks per core instead of one task per pid: the
    count-phase jobs' per-pid work items are independent and every run()
    loop already iterates the pids inside its frame, so grouping pids per
    task changes nothing about the result — but it removes the per-task
    python-runner handshake (~50-85 ms/task measured on this host) that
    dominated the probe job's wall (a no-op 64-task mapInPandas job
    measured 5.5 s at 4 cores). 2× parallelism keeps enough slack for
    stragglers on skewed pid blocks."""
    from pyspark.sql import functions as F

    par = max(1, spark.sparkContext.defaultParallelism)
    ntasks = max(1, min(nparts, 2 * par))
    return spark.range(0, nparts, 1, ntasks).select(
        F.col("id").cast("int").alias("pid"))


def _rank_by_degree(spark, e, nparts):
    """(id, rk) — dense rank of every vertex by (degree, id), where
    degree = out-degree of the distinct self-loop-free edge table (equals
    the undirected degree on symmetric inputs — the same contract as
    algos/triangles._oriented). Two jobs: per-range-partition counts →
    exclusive offsets (nparts scalars on the driver) → offset + arange.
    """
    from pyspark.sql import functions as F

    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    d2 = deg.repartitionByRange(nparts, "deg", "id").persist()

    def cnt(pdf_iter):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        sd = np.int64(0)
        wd = np.int64(0)
        for p in pdf_iter:
            n += len(p)
            d = p["deg"].to_numpy(np.int64)
            sd += d.sum()
            wd += (d * (d - 1) // 2).sum()
        yield pd.DataFrame({"pid": [pid], "n": [np.int64(n)],
                            "sd": [sd], "wd": [wd]})

    rows = d2.mapInPandas(cnt, schema="pid int, n long, sd long, wd long"
                          ).collect()
    offs = {}
    acc = 0
    for r in sorted(rows, key=lambda r: r["pid"]):
        offs[int(r["pid"])] = acc
        acc += int(r["n"])
    boffs = spark.sparkContext.broadcast(offs)
    # degree stats ride the same job (Σdeg, Σ C(deg,2)) — the caller's
    # scale-adaptive partition cap needs them and formerly paid an
    # extra agg job
    stats = {"sum_deg": int(sum(int(r["sd"]) for r in rows)),
             "wedges_est": int(sum(int(r["wd"]) for r in rows))}

    def rk(pdf_iter):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        parts = [p for p in pdf_iter if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        pdf = pdf.sort_values(["deg", "id"], ignore_index=True)
        base = boffs.value.get(pid, 0)
        yield pd.DataFrame({
            "id": pdf["id"].to_numpy(np.int64),
            "rk": base + np.arange(len(pdf), dtype=np.int64),
        })

    return d2, d2.mapInPandas(rk, schema="id long, rk long"), stats


def _prepare_tri_pack(spark, edges, cfg, nparts):
    """(pack_dir, nparts, info, cleanup) — the oriented rank-relabeled
    sharded pack, cached under <pack_cache_dir>/tri_pack (NOT the shared
    vite_pack: the triangle pack stores a different graph — oriented,
    relabeled). Same caller contract as the Louvain pack cache: every
    run pointing at one cache dir must use the same edge table and
    shuffle-partition count."""
    from pyspark.sql import functions as F

    pack_dir = None
    cleanup = True
    if cfg.pack_cache_dir:
        pack_dir = os.path.join(cfg.pack_cache_dir, "tri_pack")
        cleanup = False
        mf = os.path.join(pack_dir, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as fh:
                man = json.load(fh)
            if not os.path.exists(os.path.join(pack_dir, "krw_0.npy")):
                # cache written before probe keys were pack-time artifacts
                _build_probe_keys(spark, pack_dir, man["nparts"])
            return pack_dir, man["nparts"], man["info"], False
    if pack_dir is None:
        from vite_spark.config import resolve_scratch

        pack_dir = tempfile.mkdtemp(prefix="vite_csr_tri_",
                                    dir=resolve_scratch(cfg.scratch_dir))
    else:
        os.makedirs(pack_dir, exist_ok=True)

    # persist the distinct self-loop-free table: the degree job, the
    # oriented range-boundary sample and the pack job each consume it,
    # and without the cache each re-runs the whole upstream derivation
    # (3/4 interleaved-pair win, median −35% on q_triangles_total).
    # Released alongside ranks/d2 — never outlives the pack build.
    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst")).distinct().persist())
    d2, ranks, dstats = _rank_by_degree(spark, e, nparts)
    ranks = ranks.persist()
    if cfg.shuffle_partitions is None:
        # scale-adaptive pack partition count (guide §2). The count
        # job's work is the WEDGE probe, not an edge gather, so the cap
        # is driven by the wedge-volume upper bound Σ C(deg, 2)
        # (computed inside the rank job's count pass — no extra job)
        # alongside |oriented| = Σdeg/2 — a small-edge graph with heavy
        # wedges keeps its parallelism
        from vite_spark.config import adaptive_pack_nparts

        work = max(dstats["sum_deg"] // 2, dstats["wedges_est"])
        nparts = adaptive_pack_nparts(nparts, work)
    oriented = (
        e.join(ranks.select(F.col("id").alias("src"),
                            F.col("rk").alias("rs")), "src")
        .join(ranks.select(F.col("id").alias("dst"),
                           F.col("rk").alias("rd")), "dst")
        .filter(F.col("rs") < F.col("rd"))
        .select(F.col("rs").alias("src"), F.col("rd").alias("dst"),
                F.lit(1.0).alias("weight"))
    )
    oriented = oriented.repartitionByRange(nparts, "src")
    # the range partitioner may collapse to fewer partitions on small
    # inputs — the pack's file set is per ACTUAL partition
    nparts = oriented.rdd.getNumPartitions()
    info = pack_csr_partitions_sharded(oriented, pack_dir, nparts)
    _build_probe_keys(spark, pack_dir, nparts)
    ranks.unpersist()
    d2.unpersist()
    e.unpersist()
    if not cleanup:
        with open(os.path.join(pack_dir, "manifest.json"), "w") as fh:
            json.dump({"info": info, "nparts": nparts}, fh)
    return pack_dir, nparts, info, cleanup


def _build_probe_keys(spark, pack_dir, nparts):
    """One job at pack time: per partition, save the strictly-increasing
    closing-edge key array `krw_{pid}.npy` (srcl·(|ux|+1) + dstl — rows
    are (src, dst)-sorted, so the composite is sorted). Both count-phase
    jobs membership-test against it via read-only mmap, so the array is
    built once per pack and lives once in the page cache instead of
    being recomputed into fresh private pages per task per run (fresh
    first-touch is host-serialized — BENCH.md host physics — and was the
    probe job's dominant cost, not the searchsorteds)."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                sp = os.path.join(pack_dir, f"srcl_{pid}.npy")
                if not os.path.exists(sp):
                    # empty input: the pack job may not materialize every
                    # partition's files (the count jobs only run for
                    # ne > 0) — write empty keys so the krw file set is
                    # complete for the cache-validity check
                    _atomic_save(os.path.join(pack_dir, f"krw_{pid}.npy"),
                                 np.empty(0, np.int64))
                    yield pd.DataFrame({"pid": [pid], "n": [0]})
                    continue
                srcl = np.load(sp, mmap_mode="r")
                dstl = np.load(os.path.join(pack_dir, f"dstl_{pid}.npy"),
                               mmap_mode="r")
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"),
                             mmap_mode="r")
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"),
                              mmap_mode="r")
                stride = np.int64(len(ux) + 1)
                assert len(own) < 2 ** 62 // max(int(stride), 1), \
                    "probe key would overflow int64"
                keys = (np.asarray(srcl, np.int64) * stride
                        + np.asarray(dstl, np.int64))
                _atomic_save(
                    os.path.join(pack_dir, f"krw_{pid}.npy"), keys)
                yield pd.DataFrame({"pid": [pid], "n": [len(keys)]})

    _pid_tasks(spark, nparts).mapInPandas(
        run, schema="pid int, n long").collect()


def _clear_transients(pack_dir):
    for f in os.listdir(pack_dir):
        if f.startswith(TRI_TRANSIENT_PREFIXES):
            try:
                os.remove(os.path.join(pack_dir, f))
            except OSError:
                pass


def _count_job(spark, pack_dir, nparts, flush_pairs):
    """Enumerate wedge queries, probe local ones in place and remote
    ones against the owners' static index files; one sentinel row
    (pid, wedges, queries, tri).

    Local shortcut: a query (v, w) whose closing edge would live in THIS
    partition (owner(v) == pid — rows are src-range-partitioned) is
    answered immediately against the partition's own sorted key array
    with positions the enumerator already holds. Range partitioning
    preserves rank locality (rank ≈ id order on near-regular graphs, and
    graphs with any neighborhood structure keep most wedge endpoints
    near the apex), so the local fraction is the bulk of the volume —
    measured ~90% on the scaling input. The remote residue is batched
    per owner (``flush_pairs`` bounds memory; closure-captured so the
    executor-side value is the driver's at dispatch time) and probed
    against the owner's immutable ``own/ux/krw`` pack files via
    read-only mmap — static data, so no barrier, no second job, no
    exchange files."""

    def run(pdf_iter):
        import pandas as pd

        # per-task cache of remote owners' static arrays (mmap handles)
        stats: dict = {}

        def owner_stats(q):
            st = stats.get(q)
            if st is None:
                op = os.path.join(pack_dir, f"own_{q}.npy")
                if not os.path.exists(op):
                    st = ()   # owner has no rows → no closing edges
                else:
                    own_q = np.load(op, mmap_mode="r")
                    ux_q = np.load(
                        os.path.join(pack_dir, f"ux_{q}.npy"),
                        mmap_mode="r")
                    krw_q = np.load(
                        os.path.join(pack_dir, f"krw_{q}.npy"),
                        mmap_mode="r")
                    st = (own_q, ux_q, np.int64(len(ux_q) + 1), krw_q)
                stats[q] = st
            return st

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                srcl = np.load(os.path.join(pack_dir, f"srcl_{pid}.npy"),
                               mmap_mode="r")
                nrows = len(srcl)
                if nrows == 0:
                    yield pd.DataFrame(
                        {"pid": [pid], "wedges": [np.int64(0)],
                         "queries": [np.int64(0)],
                         "tri": [np.int64(0)]})
                    continue
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"),
                             mmap_mode="r")
                dstl = np.load(os.path.join(pack_dir, f"dstl_{pid}.npy"),
                               mmap_mode="r")
                dst_g = np.asarray(ux, np.int64)[
                    np.asarray(dstl, np.int64)]
                srcl64 = np.asarray(srcl, np.int64)
                seg_start = np.flatnonzero(
                    np.r_[True, srcl64[1:] != srcl64[:-1]])
                seg_end = np.r_[seg_start[1:], nrows]
                lens = seg_end - seg_start
                row_end = np.repeat(seg_end, lens)
                idx = np.arange(nrows, dtype=np.int64)
                starts_b, bpids = _load_bounds(pack_dir)
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"),
                              mmap_mode="r")
                stride = np.int64(len(ux) + 1)
                # pack-time closing-edge key array, one page-cache copy
                # shared with the probe job and across reps
                key_rows = np.load(
                    os.path.join(pack_dir, f"krw_{pid}.npy"),
                    mmap_mode="r")
                # per-ROW precomputes hoisted out of the k-passes (each
                # pass's v = dst_g[i] re-queries the same rows):
                #   owner pid of dst_g (bounds routing),
                #   position of dst_g in own + found mask (local-probe v),
                # and w's ux position per pass is just dstl[i+k] — dstl
                # IS the ux index, so the local probe needs no
                # per-wedge searchsorted at all.
                rpos_b = np.searchsorted(
                    starts_b, dst_g, side="right") - 1
                rq = np.where(
                    rpos_b >= 0,
                    np.asarray(bpids, np.int64)[np.maximum(rpos_b, 0)],
                    np.int64(-1))
                rvl, rok = _positions(own, dst_g)
                rvl64 = rvl.astype(np.int64)
                dstl64 = np.asarray(dstl, np.int64)

                bufs: dict = {}
                buffered = 0
                wedges = 0
                queries = 0
                tri = 0

                def flush():
                    nonlocal buffered, queries, tri
                    for q, arrs in bufs.items():
                        arr = (np.concatenate(arrs, axis=1)
                               if len(arrs) > 1 else arrs[0])
                        queries += arr.shape[1]
                        st = owner_stats(q)
                        if not st:
                            continue
                        own_q, ux_q, stride_q, krw_q = st
                        vl, okv = _positions(own_q, arr[0])
                        wl, okw = _positions(ux_q, arr[1])
                        ok = okv & okw
                        if not ok.any():
                            continue
                        kq = (vl[ok].astype(np.int64) * stride_q
                              + wl[ok].astype(np.int64))
                        _, found = _positions(krw_q, kq)
                        tri += int(found.sum())
                    bufs.clear()
                    buffered = 0

                # offset-k pass: pairs (dst[i], dst[i+k]) within a
                # segment; per-segment dst ascending → v < w and the
                # query direction matches the stored orientation.
                # Segment contributions max(0, L-k) are monotone
                # decreasing in k, so the first empty pass ends the loop.
                for k in range(1, int(lens.max())):
                    m = idx + k < row_end
                    if not m.any():
                        break
                    i = idx[m]
                    qs = rq[i]
                    ok = qs >= 0      # v below every range: no out-edges
                    i, qs = i[ok], qs[ok]
                    wedges += len(i)
                    if not len(i):
                        continue
                    loc = qs == pid
                    if loc.any():
                        # the same membership test as the remote probe,
                        # on this partition's rows; v's own position and
                        # w's ux position come from the hoisted per-row
                        # arrays — zero searchsorteds beyond the
                        # key-array membership test itself
                        il = i[loc]
                        okb = rok[il]
                        if okb.any():
                            ilk = il[okb]
                            kq = (rvl64[ilk] * stride
                                  + dstl64[ilk + k])
                            _, found = _positions(key_rows, kq)
                            tri += int(found.sum())
                        rem = ~loc
                        i, qs = i[rem], qs[rem]
                    if not len(i):
                        continue
                    v = dst_g[i]
                    w = dst_g[i + k]
                    order = np.argsort(qs, kind="stable")
                    qs, v, w = qs[order], v[order], w[order]
                    qb = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
                    qe = np.r_[qb[1:], len(qs)]
                    for b, e_ in zip(qb, qe):
                        bufs.setdefault(int(qs[b]), []).append(
                            np.stack([v[b:e_], w[b:e_]]))
                    buffered += len(v)
                    if buffered >= flush_pairs:
                        flush()
                flush()
                yield pd.DataFrame(
                    {"pid": [pid], "wedges": [np.int64(wedges)],
                     "queries": [np.int64(queries)],
                     "tri": [np.int64(tri)]})

    return _pid_tasks(spark, nparts).mapInPandas(
        run, schema="pid int, wedges long, queries long, tri long")


def csr_triangles(spark, edges, cfg, metrics) -> int | None:
    """Packed-CSR global triangle count. Returns the exact count, or
    None when a precondition fails (caller runs the wedge-join path):
    non-local master (the pack is a shared filesystem)."""
    if not spark.sparkContext.master.startswith("local"):
        return None
    nparts = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pack_dir, nparts, info, cleanup = _prepare_tri_pack(
        spark, edges, cfg, nparts)
    try:
        if info["ne"] == 0:
            metrics.record(kind="triangles_packed", mode="tri_csr_packed",
                           wall_s=0.0, wedges=0, queries=0,
                           edges_oriented=0, triangles=0)
            return 0
        _clear_transients(pack_dir)  # scrub pre-r4 caches' routed files
        t0 = time.time()
        sent = _count_job(spark, pack_dir, nparts, FLUSH_PAIRS).collect()
        t1 = time.time()
        tri = int(sum(r["tri"] for r in sent))
        metrics.record(
            kind="triangles_packed", mode="tri_csr_packed",
            wall_s=t1 - t0,
            wedges=int(sum(r["wedges"] for r in sent)),
            queries=int(sum(r["queries"] for r in sent)),
            edges_oriented=int(info["ne"]), triangles=tri)
        return tri
    finally:
        if cleanup:
            shutil.rmtree(pack_dir, ignore_errors=True)
