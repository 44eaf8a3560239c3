"""Grouping-key width regression (caught in r3): NumPy 1.x value-based
casting routes np.multiply(int32_arr, int64_scalar, out=int64) through the
INT32 loop, so the packed sweep's key = srcl·nv + c_dst silently
overflowed once max(srcl)·nv ≥ 2^31 — any benchmark-scale graph — while
every fixture-scale parity test stayed green. These tests run the sweep at
exactly that scale, no Spark needed."""

from __future__ import annotations

import numpy as np

from vite_spark.kernels.csr import sweep_partition_np
from vite_spark.kernels.csr_sharded import sweep_partition_sharded


def _ring(nv: int, half: int):
    ids = np.arange(nv, dtype=np.int64)
    srcs, dsts = [], []
    for k in range(1, half + 1):
        srcs += [ids, (ids + k) % nv]
        dsts += [(ids + k) % nv, ids]
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    order = np.lexsort((d, s))
    return s[order], d[order], np.ones(len(s))


def test_packed_key_no_int32_overflow():
    """Packed path (int32 srcl) must agree with the generic path (int64
    src) at nv·max(srcl) ≥ 2^31: nv = 70_000 with a single full partition
    gives key values up to ~4.9e9."""
    nv, half = 70_000, 2
    s, d, w = _ring(nv, half)
    assert (nv - 1) * nv >= 2**31   # the overflow regime

    curr = np.arange(nv, dtype=np.int64)
    vdeg = np.zeros(nv)
    np.add.at(vdeg, s, w)
    self_w = np.zeros(nv)
    cd = vdeg.copy()
    cs = np.ones(nv, np.int64)
    const = 1.0 / w.sum()

    # generic path: key built from int64 src — immune to the int32 loop
    g_ids, g_cc, g_new, g_ecc = sweep_partition_np(
        s, d, w, curr, vdeg, self_w, cd, cs, const
    )
    # packed path: srcl is the int32 dense index (here: identity)
    first = np.r_[True, s[1:] != s[:-1]]
    srcl = (np.cumsum(first) - 1).astype(np.int32)
    own = s[np.flatnonzero(first)]
    p_ids, p_cc, p_new, p_ecc = sweep_partition_np(
        None, d, w, curr, vdeg, self_w, cd, cs, const,
        srcl=srcl, own_ids=own,
    )
    assert np.array_equal(g_ids, p_ids)
    assert np.array_equal(g_new, p_new)
    assert np.allclose(g_ecc, p_ecc)


def test_sharded_key_no_int32_overflow():
    """Sharded sweep with huge GLOBAL ids (nv_dense ~ 5e9, srcl tiny):
    overflow would corrupt g_comm = key % nv; decisions must match the
    same sweep run with small ids shifted back."""
    nv_small, half = 64, 2
    s, d, w = _ring(nv_small, half)
    shift = 5_000_000_000          # ids become ~5e9; nv_dense > 2^32

    def run(base):
        sb, db = s + base, d + base
        first = np.r_[True, sb[1:] != sb[:-1]]
        srcl = (np.cumsum(first) - 1).astype(np.int32)
        own = sb[np.flatnonzero(first)]
        ux = np.union1d(own, db)
        dstl = np.searchsorted(ux, db).astype(np.int32)
        vdeg = np.zeros(len(own))
        np.add.at(vdeg, srcl.astype(np.int64), w)
        st = {
            "curr": ux.copy(),
            "tkeys": ux.copy(),
            "tcd": vdeg[np.searchsorted(own, ux)],
            "tcs": np.ones(len(ux), np.int64),
        }
        ids, cc, new_comm, e_cc = sweep_partition_sharded(
            dstl, srcl, w, own, np.searchsorted(ux, own), vdeg,
            np.zeros(len(own)), st, int(base + nv_small), 1.0 / w.sum(),
        )
        return ids - base, new_comm - base, e_cc

    i0, n0, e0 = run(0)
    i1, n1, e1 = run(shift)
    assert np.array_equal(i0, i1)
    assert np.array_equal(n0, n1)
    assert np.allclose(e0, e1)


def test_sharded_ids_beyond_old_key_domain():
    """The tracked-index sweep key (srcl·ntrk + idx) is partition-local,
    so global ids may exceed the OLD srcl·nv_dense key's 2^63 bound
    entirely: ids ~ 4.6e18 (nown·nv_dense ≈ 2.9e20 ≫ 2^63) must still
    produce decisions identical to the same graph at small ids."""
    nv_small, half = 64, 2
    s, d, w = _ring(nv_small, half)
    shift = 4_600_000_000_000_000_000        # ids ~ 0.5 · int64 max

    def run(base):
        sb, db = s + base, d + base
        first = np.r_[True, sb[1:] != sb[:-1]]
        srcl = (np.cumsum(first) - 1).astype(np.int32)
        own = sb[np.flatnonzero(first)]
        ux = np.union1d(own, db)
        dstl = np.searchsorted(ux, db).astype(np.int32)
        vdeg = np.zeros(len(own))
        np.add.at(vdeg, srcl.astype(np.int64), w)
        st = {
            "curr": ux.copy(),
            "tkeys": ux.copy(),
            "tcd": vdeg[np.searchsorted(own, ux)],
            "tcs": np.ones(len(ux), np.int64),
        }
        nv_dense = int(base + nv_small)
        if base:
            assert len(own) * nv_dense >= 2**63   # beyond the old guard
        ids, cc, new_comm, e_cc = sweep_partition_sharded(
            dstl, srcl, w, own, np.searchsorted(ux, own), vdeg,
            np.zeros(len(own)), st, nv_dense, 1.0 / w.sum(),
        )
        return ids - base, new_comm - base, e_cc

    i0, n0, e0 = run(0)
    i1, n1, e1 = run(shift)
    assert np.array_equal(i0, i1)
    assert np.array_equal(n0, n1)
    assert np.allclose(e0, e1)


def test_sharded_key_near_int64_max():
    """The boundary-condition pattern pin (r3 VERDICT next#3): a sharded
    sweep whose grouping key srcl*nv_dense + c_dst lands just BELOW 2^63
    (nown=100k, nv_dense ~ 9e13 -> max key ~ 9.0e18 vs int64 max 9.22e18)
    must produce decisions identical to the same graph at small ids. Any
    int32 (or float64) intermediate re-entering the key path corrupts the
    grouping here long before fixture scale would notice."""
    nv_small, half = 100_000, 2
    s, d, w = _ring(nv_small, half)
    shift = 90_000_000_000_000          # ids ~ 9e13

    def run(base):
        sb, db = s + base, d + base
        first = np.r_[True, sb[1:] != sb[:-1]]
        srcl = (np.cumsum(first) - 1).astype(np.int32)
        own = sb[np.flatnonzero(first)]
        ux = np.union1d(own, db)
        dstl = np.searchsorted(ux, db).astype(np.int32)
        vdeg = np.zeros(len(own))
        np.add.at(vdeg, srcl.astype(np.int64), w)
        st = {
            "curr": ux.copy(),
            "tkeys": ux.copy(),
            "tcd": vdeg[np.searchsorted(own, ux)],
            "tcs": np.ones(len(ux), np.int64),
        }
        nv_dense = int(base + nv_small)
        if base:
            # this lands just inside the OLD global-id key's domain; the
            # tracked-index key is partition-local so the margin no
            # longer matters, but the boundary remains the sharpest
            # place to catch a narrow intermediate re-entering the path
            assert len(own) * nv_dense < 2**63
            assert len(own) * nv_dense > 2**62
        ids, cc, new_comm, e_cc = sweep_partition_sharded(
            dstl, srcl, w, own, np.searchsorted(ux, own), vdeg,
            np.zeros(len(own)), st, nv_dense, 1.0 / w.sum(),
        )
        return ids - base, new_comm - base, e_cc

    i0, n0, e0 = run(0)
    i1, n1, e1 = run(shift)
    assert np.array_equal(i0, i1)
    assert np.array_equal(n0, n1)
    assert np.allclose(e0, e1)
