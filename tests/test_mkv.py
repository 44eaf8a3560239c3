"""Matroska muxer/demuxer (vite_spark/text/mkv.py).

Validation strategy (no mkvtoolnix/ffmpeg in the container): EBML vint
framing pinned against RFC 8794's own encoding rules with hand-built byte
literals; the container roundtrip validated through TWO independent
codebases (x265 encode → mkv mux → mkv demux → de265 decode, bit-exact vs
the pre-mux decode); and the extracted elementary stream cross-asserted
IDENTICAL to what the independently-written ISOBMFF demuxer (text/mp4.py)
extracts from an MP4 of the same input — two container implementations
agreeing NAL-for-NAL on bytes neither wrote for the other.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vite_spark.text.mkv import (
    decode_vint,
    demux_mkv,
    encode_vint,
    is_mkv,
    mux_mkv,
    walk_elements,
)


def _have_hevc():
    from vite_spark.text.syscodecs import have_hevc
    return have_hevc()


def _first_simpleblock(mkv: bytes) -> tuple[int, int]:
    """(body_begin, body_end) of the first SimpleBlock (0xA3), located by
    structure — a raw byte search for 0xA3 can hit codec payload bytes."""
    _, hb, he = next(iter(walk_elements(mkv, 0, len(mkv))))
    _, sb, se = next(iter(walk_elements(mkv, he, len(mkv))))
    for eid, b, e in walk_elements(mkv, sb, se):
        if eid == 0x1F43B675:                         # Cluster
            for cid, cb, ce in walk_elements(mkv, b, e):
                if cid == 0xA3:
                    return cb, ce
    raise AssertionError("no SimpleBlock found")


# ---------------------------------------------------------------------------
# EBML primitives — spec literals, no codec needed
# ---------------------------------------------------------------------------

def test_vint_spec_literals():
    # RFC 8794 §4: 1-byte vints carry 7 data bits behind marker 0x80
    assert encode_vint(0) == b"\x80"
    assert encode_vint(2) == b"\x82"
    assert encode_vint(126) == b"\xfe"
    # 127 is all-ones in 1 byte (= "unknown") → must widen to 2 bytes
    assert encode_vint(127) == b"\x40\x7f"
    assert encode_vint(16382) == b"\x7f\xfe"          # 2-byte max known
    assert encode_vint(16383) == b"\x20\x3f\xff"      # widened to 3
    for v in [0, 1, 126, 127, 128, 16382, 16383, 2**21 - 3, 2**56 - 2]:
        enc = encode_vint(v)
        dec, nxt = decode_vint(enc, 0)
        assert dec == v and nxt == len(enc)
    # non-minimal encodings are legal for sizes and must decode
    assert decode_vint(b"\x40\x01", 0) == (1, 2)
    assert decode_vint(b"\x10\x00\x00\x01", 0) == (1, 4)
    # all-ones = unknown size
    assert decode_vint(b"\xff", 0) == (None, 1)
    assert decode_vint(b"\x7f\xff", 0) == (None, 2)
    with pytest.raises(ValueError):
        decode_vint(b"\x00\x80", 0)                   # >8-byte marker
    with pytest.raises(ValueError):
        decode_vint(b"\x40", 0)                       # truncated


def test_walk_elements_hand_built():
    # EBML header with one child: DocType (0x4282) = "matroska"
    child = b"\x42\x82\x88matroska"
    data = b"\x1a\x45\xdf\xa3" + encode_vint(len(child)) + child
    (eid, b, e), = list(walk_elements(data, 0, len(data)))
    assert eid == 0x1A45DFA3
    (cid, cb, ce), = list(walk_elements(data, b, e))
    assert cid == 0x4282 and data[cb:ce] == b"matroska"
    # child extent overrunning its parent is an error, not a silent clamp
    bad = b"\x1a\x45\xdf\xa3" + encode_vint(4) + b"\x42\x82\x88mat"
    with pytest.raises(ValueError):
        for _ in walk_elements(bad, 0, len(bad)):
            for _ in walk_elements(bad, 6, 10):
                pass


def test_is_mkv_rejects_other_doctypes():
    assert not is_mkv(None)
    assert not is_mkv(b"")
    assert not is_mkv(b"\x1a\x45\xdf\xa3")            # magic alone
    webm = (b"\x1a\x45\xdf\xa3" + encode_vint(7)
            + b"\x42\x82\x84webm")
    assert not is_mkv(webm)
    mat = (b"\x1a\x45\xdf\xa3" + encode_vint(11)
           + b"\x42\x82\x88matroska")
    assert is_mkv(mat)


# ---------------------------------------------------------------------------
# container roundtrip through two independent codec implementations
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mkv_mux_demux_roundtrip_bit_exact():
    from vite_spark.text.mp4 import split_annexb
    from vite_spark.text.syscodecs import decode_hevc, encode_hevc

    rng = np.random.default_rng(31)
    for n, h, w, fps in [(6, 18, 26, 3), (1, 16, 16, 30), (8, 21, 37, 5)]:
        frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
        es = encode_hevc(frames, fps=fps)
        mkv = mux_mkv(es, w, h, fps)
        assert is_mkv(mkv)
        d = demux_mkv(mkv)
        assert (d["width"], d["height"], d["n_samples"]) == (w, h, n)
        assert d["fps"] == float(fps)
        assert d["duration_s"] == pytest.approx(n / fps, abs=1e-9)
        assert np.array_equal(decode_hevc(d["annexb"]), frames)
        assert sorted(split_annexb(d["annexb"])) == sorted(split_annexb(es))


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mkv_multi_cluster_and_mp4_cross_agreement():
    """cluster_frames=2 forces multiple Clusters (exercising cluster-base
    + relative timestamp reassembly), and the extracted Annex-B stream is
    asserted BYTE-IDENTICAL to the one the independently-written ISOBMFF
    demuxer extracts from an MP4 of the same input."""
    from vite_spark.text.mp4 import demux_mp4, mux_mp4
    from vite_spark.text.syscodecs import decode_hevc, encode_hevc

    rng = np.random.default_rng(32)
    frames = rng.integers(0, 256, (7, 16, 24, 3), np.uint8)
    es = encode_hevc(frames, fps=4)
    mkv = mux_mkv(es, 24, 16, 4, cluster_frames=2)
    assert mkv.count(b"\x1f\x43\xb6\x75") >= 4        # ≥4 Cluster IDs
    d = demux_mkv(mkv)
    assert d["n_samples"] == 7 and d["fps"] == 4.0
    assert np.array_equal(decode_hevc(d["annexb"]), frames)
    d_mp4 = demux_mp4(mux_mp4(es, 24, 16, 4))
    assert d["annexb"] == d_mp4["annexb"]
    assert (d["width"], d["height"], d["n_samples"], d["fps"]) == (
        d_mp4["width"], d_mp4["height"], d_mp4["n_samples"], d_mp4["fps"])


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mkv_rejections():
    from vite_spark.text.syscodecs import encode_hevc

    frames = np.full((3, 16, 16, 3), 90, np.uint8)
    es = encode_hevc(frames, fps=4)
    mkv = mux_mkv(es, 16, 16, 4)

    with pytest.raises(ValueError, match="Matroska"):
        demux_mkv(b"\x00" * 64)
    with pytest.raises(ValueError):
        demux_mkv(mkv[: len(mkv) // 2])               # truncated mid-segment

    # flip the first SimpleBlock's flags byte to claim EBML lacing: the
    # demuxer must refuse loudly rather than misparse frame bytes
    cb, _ = _first_simpleblock(mkv)
    # body = track vint (0x81), int16 ts, flags
    flags_at = cb + 1 + 2
    laced = mkv[:flags_at] + bytes([mkv[flags_at] | 0x06]) + mkv[flags_at + 1:]
    with pytest.raises(ValueError, match="laced"):
        demux_mkv(laced)

    # foreign codec ID: V_MPEGH/ISO/HEVC → V_AV1!!!!!!!!! (same length
    # keeps every other offset valid)
    foreign = mkv.replace(b"V_MPEGH/ISO/HEVC", b"V_AV1!!!!!!!!!!!", 1)
    with pytest.raises(ValueError, match="codec"):
        demux_mkv(foreign)


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mkv_structure_spec_literal():
    """Structural invariants via raw byte reads, independent of the
    walker: EBML magic first, Segment ID after the header, DefaultDuration
    = 1e9/fps ns, SimpleBlock track vint 0x81 + keyframe flag 0x80, and
    the Info Duration double equal to n/fps seconds in ms ticks."""
    from vite_spark.text.syscodecs import encode_hevc

    frames = np.full((3, 16, 16, 3), 200, np.uint8)
    mkv = mux_mkv(encode_hevc(frames, fps=5), 16, 16, 5)
    assert mkv[:4] == b"\x1a\x45\xdf\xa3"
    _, hb, he = next(iter(walk_elements(mkv, 0, len(mkv))))
    assert mkv[he:he + 4] == b"\x18\x53\x80\x67"      # Segment follows
    i = mkv.index(b"\x23\xe3\x83")                    # DefaultDuration
    sz, p = decode_vint(mkv, i + 3)
    assert int.from_bytes(mkv[p:p + sz], "big") == round(1e9 / 5)
    i = mkv.index(b"\x44\x89\x88")                    # Duration, 8-byte
    assert struct.unpack_from(">d", mkv, i + 3)[0] == 3 * 1000.0 / 5
    cb, _ = _first_simpleblock(mkv)
    assert mkv[cb] == 0x81                            # track 1 vint
    assert mkv[cb + 3] == 0x80                        # keyframe, no lacing


# ---------------------------------------------------------------------------
# Spark sampling path (driver-fixture contract)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mkv_media_from_docs_contract(spark):
    """Driver-fixture contract: formulas match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_MKV), through the REAL
    mux-on-executor → EBML-demux → decode sampling path, with the per-doc
    fps read back from the container's DefaultDuration and multi-Cluster
    files (cluster_frames=2) reassembled across cluster boundaries."""
    import hashlib

    import pandas as pd

    from vite_spark.text.multimodal import mkv_media_from_docs, sample_mkv_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    media = mkv_media_from_docs(docs)
    out = sample_mkv_frames(media, max_frames=4).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        w, hh = doc_id % 14 + 16, doc_id % 12 + 16
        n = doc_id % 5 + 1
        fps = doc_id % 3 + 2
        ns = min(n, 4)
        h = hashlib.sha256(text.encode()).digest()
        for j in range(ns):
            k = j * n // ns
            r = rows[(doc_id, k)]
            assert (r["width"], r["height"], r["n_frames"]) == (w, hh, n)
            assert r["ts_s"] == k / fps
            assert r["mean_r"] == round(h[9 + 3 * k] / 255.0, 6)
            assert r["mean_g"] == round(h[10 + 3 * k] / 255.0, 6)
            assert r["mean_b"] == round(h[11 + 3 * k] / 255.0, 6)
    assert len(out) == sum(min(d % 5 + 1, 4) for d in (0, 7, 44))


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_video_dispatch_routes_mkv(spark):
    """sample_video_frames routes Matroska payloads by magic to the EBML
    demuxer and carries the container fps through to ts_s."""
    import pandas as pd

    from vite_spark.text.multimodal import mkv_media_from_docs, sample_video_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": ["beta"]})
    )
    out = sample_video_frames(mkv_media_from_docs(docs), max_frames=4).collect()
    fps = 7 % 3 + 2
    assert len(out) == min(7 % 5 + 1, 4)
    assert all(r["ts_s"] == r["frame_idx"] / fps for r in out)
