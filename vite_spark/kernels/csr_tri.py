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

Count phase (TWO jobs, no shuffle of wedges through Spark):

1. **Wedge job** — task p enumerates, per owned segment, all pairs
   (v, w) = (dst[i], dst[i+k]) within the segment (per-segment dst is
   ascending = orientation order, so v < w and each candidate closing
   edge is queried in its stored direction exactly once). Pairs are
   routed to owner(v) by the bounds table (the getOwner analog,
   /root/reference/distgraph.hpp:260-271) and written as per-reader
   int64 files `twq_{reader}_{writer}_{chunk}.npy` — the same
   worker-to-worker file exchange medium every packed kernel here uses
   (shared scratch on a real cluster). Chunked flushes bound memory to
   O(FLUSH) regardless of wedge volume.
2. **Probe job** — task q loads its (src,dst)-sorted rows ONCE as a
   single strictly-increasing int64 key array
   `srcl * (|ux|+1) + dstl`, maps each incoming query (v, w) to local
   coordinates by two searchsorteds (v ∉ own or w ∉ ux → not an edge),
   and counts hits with one searchsorted per chunk. Queries whose v has
   no out-edges at all (above every range, or in a range gap) were
   already dropped by the router — they cannot be edges.

Total = Σ hits: every triangle {a<b<c in rank order} is counted exactly
once, as wedge (b, c) at apex a with closing edge (b, c). The count is
an exact integer — no float-order domain gate needed (unlike the Louvain
sharded kernel) — and equals algos/triangles.triangle_count on every
input (same orientation, same distinct/self-loop handling;
pytest-enforced parity).

Scale shape: per-partition memory O(edges/p + FLUSH); wedge traffic
O(Σ outdeg²) bytes moves through the scratch filesystem ONCE, against
the join path's two shuffles of the same volume plus sort machinery;
nothing on the driver but per-partition scalars. All int64 key
arithmetic is explicit-cast (NumPy 1.x value-based casting — the r3
int32-overflow lesson, kernels/csr.py:199).

Preconditions (caller falls back to the join path on None): local
master (shared pack filesystem). Reference analog: Vite has no triangle
counting; the per-reader routed exchange mirrors its exchangeVertexReqs
shape (/root/reference/louvain.cpp:3251-3397) reused from
csr_sharded.py.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import numpy as np

from vite_spark.kernels.csr import _atomic_save, _pid_frame
from vite_spark.kernels.csr_sharded import (
    _load_bounds,
    _positions,
    pack_csr_partitions_sharded,
)

TRI_TRANSIENT_PREFIXES = ("twq_",)

# pairs buffered per wedge task before flushing to per-reader files
FLUSH_PAIRS = 8_000_000


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
        n = sum(len(p) for p in pdf_iter)
        yield pd.DataFrame({"pid": [pid], "n": [np.int64(n)]})

    rows = d2.mapInPandas(cnt, schema="pid int, n long").collect()
    offs = {}
    acc = 0
    for r in sorted(rows, key=lambda r: r["pid"]):
        offs[int(r["pid"])] = acc
        acc += int(r["n"])
    boffs = spark.sparkContext.broadcast(offs)

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

    return d2, d2.mapInPandas(rk, schema="id long, rk long")


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
            return pack_dir, man["nparts"], man["info"], False
    if pack_dir is None:
        pack_dir = tempfile.mkdtemp(prefix="vite_csr_tri_",
                                    dir=cfg.scratch_dir)
    else:
        os.makedirs(pack_dir, exist_ok=True)

    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst")).distinct())
    d2, ranks = _rank_by_degree(spark, e, nparts)
    ranks = ranks.persist()
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
    ranks.unpersist()
    d2.unpersist()
    if not cleanup:
        with open(os.path.join(pack_dir, "manifest.json"), "w") as fh:
            json.dump({"info": info, "nparts": nparts}, fh)
    return pack_dir, nparts, info, cleanup


def _clear_transients(pack_dir):
    for f in os.listdir(pack_dir):
        if f.startswith(TRI_TRANSIENT_PREFIXES):
            try:
                os.remove(os.path.join(pack_dir, f))
            except OSError:
                pass


def _wedge_job(spark, pack_dir, nparts, flush_pairs):
    """Enumerate + route wedge queries; one sentinel row (pid, wedges).
    ``flush_pairs`` is closure-captured (not read as a module global) so
    the executor-side value is the driver's at dispatch time."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                srcl = np.load(os.path.join(pack_dir, f"srcl_{pid}.npy"),
                               mmap_mode="r")
                nrows = len(srcl)
                if nrows == 0:
                    yield pd.DataFrame(
                        {"pid": [pid], "wedges": [np.int64(0)]})
                    continue
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"))
                dstl = np.load(os.path.join(pack_dir, f"dstl_{pid}.npy"))
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

                bufs: dict = {}
                chunk: dict = {}
                buffered = 0
                wedges = 0

                def flush():
                    nonlocal buffered
                    for q, arrs in bufs.items():
                        arr = (np.concatenate(arrs, axis=1)
                               if len(arrs) > 1 else arrs[0])
                        c = chunk.get(q, 0)
                        chunk[q] = c + 1
                        _atomic_save(
                            os.path.join(pack_dir,
                                         f"twq_{q}_{pid}_{c}.npy"), arr)
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
                    v = dst_g[i]
                    w = dst_g[i + k]
                    pos = np.searchsorted(starts_b, v, side="right") - 1
                    ok = pos >= 0     # v below every range: no out-edges
                    v, w, pos = v[ok], w[ok], pos[ok]
                    wedges += len(v)
                    if not len(v):
                        continue
                    qs = np.asarray(bpids, np.int64)[pos]
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
                    {"pid": [pid], "wedges": [np.int64(wedges)]})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="pid int, wedges long")


def _probe_job(spark, pack_dir, nparts):
    """Closing-edge membership tests; sentinel rows (pid, tri, queries)."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for pid in pdf["pid"]:
                pid = int(pid)
                prefix = f"twq_{pid}_"
                files = [f for f in os.listdir(pack_dir)
                         if f.startswith(prefix)]
                if not files:
                    yield pd.DataFrame({"pid": [pid], "tri": [np.int64(0)],
                                        "queries": [np.int64(0)]})
                    continue
                own = np.load(os.path.join(pack_dir, f"own_{pid}.npy"))
                ux = np.load(os.path.join(pack_dir, f"ux_{pid}.npy"))
                srcl = np.load(os.path.join(pack_dir, f"srcl_{pid}.npy"))
                dstl = np.load(os.path.join(pack_dir, f"dstl_{pid}.npy"))
                stride = np.int64(len(ux) + 1)
                assert len(own) < 2 ** 62 // max(int(stride), 1), \
                    "probe key would overflow int64"
                key_rows = (np.asarray(srcl, np.int64) * stride
                            + np.asarray(dstl, np.int64))
                tri = 0
                nq = 0
                for f in sorted(files):
                    a = np.load(os.path.join(pack_dir, f))
                    v = np.asarray(a[0], np.int64)
                    w = np.asarray(a[1], np.int64)
                    nq += len(v)
                    if len(own) == 0 or len(v) == 0:
                        continue
                    vl, okv = _positions(own, v)
                    wl, okw = _positions(ux, w)
                    ok = okv & okw
                    if not ok.any():
                        continue
                    kq = vl[ok].astype(np.int64) * stride + wl[ok]
                    _, found = _positions(key_rows, kq)
                    tri += int(found.sum())
                yield pd.DataFrame({"pid": [pid], "tri": [np.int64(tri)],
                                    "queries": [np.int64(nq)]})

    return _pid_frame(spark, nparts).mapInPandas(
        run, schema="pid int, tri long, queries long")


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
        _clear_transients(pack_dir)
        t0 = time.time()
        wsent = _wedge_job(spark, pack_dir, nparts, FLUSH_PAIRS).collect()
        t1 = time.time()
        psent = _probe_job(spark, pack_dir, nparts).collect()
        t2 = time.time()
        tri = int(sum(r["tri"] for r in psent))
        metrics.record(
            kind="triangles_packed", mode="tri_csr_packed",
            wall_s=t2 - t0, wedge_wall_s=round(t1 - t0, 3),
            probe_wall_s=round(t2 - t1, 3),
            wedges=int(sum(r["wedges"] for r in wsent)),
            queries=int(sum(r["queries"] for r in psent)),
            edges_oriented=int(info["ne"]), triangles=tri)
        return tri
    finally:
        if cleanup:
            shutil.rmtree(pack_dir, ignore_errors=True)
        else:
            _clear_transients(pack_dir)
