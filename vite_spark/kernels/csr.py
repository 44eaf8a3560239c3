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
    # group (src, neighbor community): keys fit in int64 for nv < 2^31
    nvl = np.int64(len(curr))
    key = src * nvl + c_dst
    order = np.argsort(key, kind="stable")
    ks, ws = key[order], w[order]
    start = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    e_vc = np.add.reduceat(ws, start)
    g_src = (ks[start] // nvl).astype(np.int64)
    g_comm = (ks[start] % nvl).astype(np.int64)

    ids = np.unique(src)
    idx_of_gsrc = np.searchsorted(ids, g_src)

    cc = curr[ids]
    e_cc = np.zeros(len(ids))
    own = g_comm == curr[g_src]
    e_cc[idx_of_gsrc[own]] = e_vc[own]

    eix = e_cc - self_w[ids]
    ax = comm_deg[cc] - vdeg[ids]

    cand = ~own
    cs_idx = idx_of_gsrc[cand]
    ccomm = g_comm[cand]
    cev = e_vc[cand]
    gain = (
        2.0 * (cev - eix[cs_idx])
        - 2.0 * vdeg[ids][cs_idx] * (comm_deg[ccomm] - ax[cs_idx]) * const
    )
    pos_m = gain > 0.0
    cs_idx, ccomm, gain = cs_idx[pos_m], ccomm[pos_m], gain[pos_m]

    new_comm = cc.copy()
    if cs_idx.size:
        sel = np.lexsort((ccomm, -gain, cs_idx))
        cs_s, ccomm_s = cs_idx[sel], ccomm[sel]
        first = np.flatnonzero(np.r_[True, cs_s[1:] != cs_s[:-1]])
        v_best, c_best = cs_s[first], ccomm_s[first]
        keep = ~(
            (comm_size[c_best] == 1)
            & (comm_size[cc[v_best]] == 1)
            & (c_best > cc[v_best])
        )
        new_comm[v_best[keep]] = c_best[keep]
    return ids, cc, new_comm, e_cc


def csr_superstep(
    edges: DataFrame,
    state_bcast,            # pyspark Broadcast of (curr, vdeg, self_w, cd, cs)
    const: float,
) -> DataFrame:
    """decisions(id, cc, new_comm, e_cc) via one Arrow pass over edges.

    ``edges`` must be partitioned so each src's adjacency is wholly inside
    one partition (repartition(N, "src") gives exactly that)."""

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
