"""Pure-Python Matroska (MKV) muxer/demuxer for HEVC video tracks.

Implemented from the public specs alone: EBML (RFC 8794 — variable-size
integers, element framing), the Matroska element registry (RFC 9559 —
Segment/Info/Tracks/Cluster/SimpleBlock), and the Matroska codec mapping
for H.265 ("V_MPEGH/ISO/HEVC": CodecPrivate carries the ISO/IEC 14496-15
HEVCDecoderConfigurationRecord and block payloads are length-prefixed NAL
units, exactly as inside an MP4 'mdat') — so the hvcC build/parse and NAL
(re)framing helpers are shared with text/mp4.py rather than re-derived.

Closes the "non-ISOBMFF containers (MKV)" stub named in COVERAGE.md: with
this module every container the video sampler advertises (AVI, MP4, MKV,
raw Annex-B) demuxes for real. Scope is the same as the MP4 module's —
one progressive HEVC video track, no lacing (this muxer never writes it;
the demuxer rejects it loudly rather than guessing at Xiph/EBML lace
sizes without third-party bytes to validate against).

No reference counterpart: the C++ reference (ECP-ExaGraph/vite) is a
graph engine with no media layer; this exists for the round brief's
multimodal-column requirement.
"""

from __future__ import annotations

import struct

from vite_spark.text.mp4 import (
    _length_prefixed,
    _split_length_prefixed,
    annexb_to_access_units,
    build_hvcc,
    parse_hvcc,
)

# ---------------------------------------------------------------------------
# EBML primitives (RFC 8794)
# ---------------------------------------------------------------------------

# Element IDs are stored WITH their length marker (Matroska convention).
EBML = 0x1A45DFA3
EBML_VERSION = 0x4286
EBML_READ_VERSION = 0x42F7
EBML_MAX_ID_LENGTH = 0x42F2
EBML_MAX_SIZE_LENGTH = 0x42F3
DOCTYPE = 0x4282
DOCTYPE_VERSION = 0x4287
DOCTYPE_READ_VERSION = 0x4285
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
MUXING_APP = 0x4D80
WRITING_APP = 0x5741
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
FLAG_LACING = 0x9C
CODEC_ID = 0x86
CODEC_PRIVATE = 0x63A2
DEFAULT_DURATION = 0x23E383
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
VOID = 0xEC
CRC32 = 0xBF

_TRACK_TYPE_VIDEO = 1
_CODEC_HEVC = b"V_MPEGH/ISO/HEVC"


def encode_vint(value: int) -> bytes:
    """Minimal-width EBML variable-size integer (data value, marker bit
    folded in). All-ones payloads mean "unknown" in the spec, so width k
    holds values up to 2**(7k) - 2."""
    if value < 0:
        raise ValueError("vint values are unsigned")
    for k in range(1, 9):
        if value < (1 << (7 * k)) - 1:
            return (value | (1 << (7 * k))).to_bytes(k, "big")
    raise ValueError(f"vint overflow: {value}")


def decode_vint(data: bytes, pos: int) -> tuple[int | None, int]:
    """(value, next_pos); value is None for the all-ones "unknown size"."""
    if pos >= len(data):
        raise ValueError("EBML truncated at vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid vint (>8 bytes)")
    k = 8 - first.bit_length() + 1          # leading zeros + 1
    if pos + k > len(data):
        raise ValueError("EBML truncated inside vint")
    raw = int.from_bytes(data[pos:pos + k], "big")
    value = raw & ((1 << (7 * k)) - 1)
    if value == (1 << (7 * k)) - 1:
        return None, pos + k
    return value, pos + k


def _read_id(data: bytes, pos: int) -> tuple[int, int]:
    """Element ID (1-4 bytes, stored with marker) → (id, next_pos)."""
    if pos >= len(data):
        raise ValueError("EBML truncated at element ID")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid element ID")
    k = 8 - first.bit_length() + 1
    if k > 4:
        raise ValueError("element ID longer than 4 bytes")
    if pos + k > len(data):
        raise ValueError("EBML truncated inside element ID")
    return int.from_bytes(data[pos:pos + k], "big"), pos + k


def _id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + encode_vint(len(payload)) + payload


def _uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def _float(eid: int, value: float) -> bytes:
    return _elem(eid, struct.pack(">d", value))


def _string(eid: int, value: bytes) -> bytes:
    return _elem(eid, value)


def _parse_uint(data: bytes) -> int:
    return int.from_bytes(data, "big")


def _parse_float(data: bytes) -> float:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    raise ValueError(f"EBML float must be 4 or 8 bytes, got {len(data)}")


def walk_elements(data: bytes, start: int, end: int):
    """Yield (element_id, payload_begin, payload_end) for the children of
    [start, end). Unknown-size elements are only legal for the outermost
    Segment in this demuxer's scope and are handled by its caller."""
    pos = start
    while pos < end:
        eid, p = _read_id(data, pos)
        size, p = decode_vint(data, p)
        if size is None:
            # unknown-size child: runs to the parent's end (RFC 8794 §6.2)
            yield eid, p, end
            return
        if p + size > end:
            raise ValueError(
                f"element 0x{eid:X} extent {p + size} beyond parent end {end}")
        yield eid, p, p + size
        pos = p + size


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------

def mux_mkv(hevc_annexb: bytes, width: int, height: int, fps: int,
            cluster_frames: int = 100) -> bytes:
    """Annex-B H.265 elementary stream → Matroska: EBML header + Segment
    (Info with millisecond TimestampScale and total Duration, one video
    TrackEntry with the hvcC as CodecPrivate and DefaultDuration=1e9/fps,
    Clusters of keyframe-flagged SimpleBlocks holding length-prefixed
    samples). A new Cluster starts every `cluster_frames` frames so the
    int16 in-cluster relative timestamp can never overflow."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    params, aus = annexb_to_access_units(hevc_annexb)
    length_size = 4
    samples = [_length_prefixed(au, length_size) for au in aus]
    n = len(samples)
    hvcc = build_hvcc(params[32], params[33], params[34], length_size)

    header = _elem(EBML, b"".join([
        _uint(EBML_VERSION, 1),
        _uint(EBML_READ_VERSION, 1),
        _uint(EBML_MAX_ID_LENGTH, 4),
        _uint(EBML_MAX_SIZE_LENGTH, 8),
        _string(DOCTYPE, b"matroska"),
        _uint(DOCTYPE_VERSION, 4),
        _uint(DOCTYPE_READ_VERSION, 2),
    ]))

    ts_scale = 1_000_000                     # 1 ms ticks (Matroska default)
    info = _elem(INFO, b"".join([
        _uint(TIMESTAMP_SCALE, ts_scale),
        _float(DURATION, n * 1000.0 / fps),
        _string(MUXING_APP, b"vite_spark"),
        _string(WRITING_APP, b"vite_spark"),
    ]))

    video = _elem(VIDEO, _uint(PIXEL_WIDTH, width)
                  + _uint(PIXEL_HEIGHT, height))
    track = _elem(TRACK_ENTRY, b"".join([
        _uint(TRACK_NUMBER, 1),
        _uint(TRACK_UID, 1),
        _uint(TRACK_TYPE, _TRACK_TYPE_VIDEO),
        _uint(FLAG_LACING, 0),
        _string(CODEC_ID, _CODEC_HEVC),
        _uint(DEFAULT_DURATION, round(1e9 / fps)),
        _string(CODEC_PRIVATE, hvcc),
        video,
    ]))
    tracks = _elem(TRACKS, track)

    clusters = []
    for base in range(0, n, cluster_frames):
        cluster_ts = base * 1000 // fps
        body = [_uint(CLUSTER_TIMESTAMP, cluster_ts)]
        for k in range(base, min(base + cluster_frames, n)):
            rel = k * 1000 // fps - cluster_ts
            body.append(_elem(
                SIMPLE_BLOCK,
                encode_vint(1)                       # track number
                + struct.pack(">h", rel)             # relative timestamp
                + b"\x80"                            # keyframe, no lacing
                + samples[k],
            ))
        clusters.append(_elem(CLUSTER, b"".join(body)))

    segment = _elem(SEGMENT, info + tracks + b"".join(clusters))
    return header + segment


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------

def is_mkv(payload: bytes | None) -> bool:
    """EBML magic + DocType 'matroska' (webm is excluded: its codec set is
    VP8/VP9/AV1, which this HEVC-track demuxer can't honor)."""
    if payload is None or len(payload) < 4 or payload[:4] != b"\x1a\x45\xdf\xa3":
        return False
    try:
        _, hb, he = next(iter(walk_elements(payload, 0, len(payload))))
        for eid, b, e in walk_elements(payload, hb, he):
            if eid == DOCTYPE:
                return payload[b:e].rstrip(b"\x00") == b"matroska"
    except ValueError:
        return False
    return False


def _track_fields(data: bytes, b: int, e: int) -> dict:
    t: dict = {}
    for eid, cb, ce in walk_elements(data, b, e):
        if eid == TRACK_NUMBER:
            t["number"] = _parse_uint(data[cb:ce])
        elif eid == TRACK_TYPE:
            t["type"] = _parse_uint(data[cb:ce])
        elif eid == CODEC_ID:
            t["codec"] = data[cb:ce].rstrip(b"\x00")
        elif eid == CODEC_PRIVATE:
            t["private"] = data[cb:ce]
        elif eid == DEFAULT_DURATION:
            t["default_duration"] = _parse_uint(data[cb:ce])
        elif eid == VIDEO:
            for vid, vb, ve in walk_elements(data, cb, ce):
                if vid == PIXEL_WIDTH:
                    t["width"] = _parse_uint(data[vb:ve])
                elif vid == PIXEL_HEIGHT:
                    t["height"] = _parse_uint(data[vb:ve])
    return t


def _block_payload(data: bytes, b: int, e: int, want_track: int):
    """SimpleBlock/Block body → (frame_bytes, rel_ts_ms) or None when the
    block belongs to another track. Lacing is rejected, not guessed."""
    tn, p = decode_vint(data, b)
    if tn is None:
        raise ValueError("block with unknown track number")
    if p + 3 > e:
        raise ValueError("block truncated before flags")
    rel = struct.unpack_from(">h", data, p)[0]
    flags = data[p + 2]
    if tn != want_track:
        return None
    if flags & 0x06:
        raise ValueError(
            "laced Matroska blocks are not supported (this muxer never "
            "writes lacing; third-party laced files need a lace parser)")
    return data[p + 3:e], rel


def demux_mkv(payload: bytes) -> dict:
    """Matroska → {'annexb', 'fps', 'width', 'height', 'n_samples',
    'duration_s'} for the first HEVC video track — the same contract as
    mp4.demux_mp4, so the two containers are interchangeable upstream.
    The Annex-B stream is the CodecPrivate parameter sets followed by
    every block's NALs in storage order (= decode order)."""
    if not is_mkv(payload):
        raise ValueError("not a Matroska file (EBML magic/DocType)")
    elems = walk_elements(payload, 0, len(payload))
    next(elems)                                        # EBML header
    try:
        seg_id, seg_b, seg_e = next(elems)
    except StopIteration:
        raise ValueError("no Segment element") from None
    if seg_id != SEGMENT:
        raise ValueError(f"expected Segment, got 0x{seg_id:X}")

    ts_scale = 1_000_000
    duration_ticks: float | None = None
    track: dict | None = None
    blocks: list[tuple[bytes, int]] = []

    for eid, b, e in walk_elements(payload, seg_b, seg_e):
        if eid == INFO:
            for iid, ib, ie in walk_elements(payload, b, e):
                if iid == TIMESTAMP_SCALE:
                    ts_scale = _parse_uint(payload[ib:ie])
                elif iid == DURATION:
                    duration_ticks = _parse_float(payload[ib:ie])
        elif eid == TRACKS:
            for tid, tb, te in walk_elements(payload, b, e):
                if tid != TRACK_ENTRY:
                    continue
                t = _track_fields(payload, tb, te)
                if t.get("type") == _TRACK_TYPE_VIDEO and track is None:
                    if t.get("codec") != _CODEC_HEVC:
                        raise ValueError(
                            f"unsupported video codec "
                            f"{t.get('codec', b'?').decode(errors='replace')}"
                            " (V_MPEGH/ISO/HEVC only)")
                    track = t
        elif eid == CLUSTER:
            if track is None:
                raise ValueError("Cluster before Tracks")
            cluster_ts = 0
            for cid, cb, ce in walk_elements(payload, b, e):
                if cid == CLUSTER_TIMESTAMP:
                    cluster_ts = _parse_uint(payload[cb:ce])
                elif cid == SIMPLE_BLOCK:
                    r = _block_payload(payload, cb, ce, track["number"])
                    if r is not None:
                        blocks.append((r[0], cluster_ts + r[1]))
                elif cid == BLOCK_GROUP:
                    for gid, gb, ge in walk_elements(payload, cb, ce):
                        if gid == BLOCK:
                            r = _block_payload(payload, gb, ge,
                                               track["number"])
                            if r is not None:
                                blocks.append((r[0], cluster_ts + r[1]))

    if track is None:
        raise ValueError("no HEVC video track")
    if not blocks:
        raise ValueError("no blocks for the video track")
    if "private" not in track:
        raise ValueError("video track has no CodecPrivate (hvcC)")
    param_nals, length_size = parse_hvcc(track["private"])

    out = bytearray()
    for nal in param_nals:
        out += b"\x00\x00\x00\x01" + nal
    for frame, _ in blocks:
        for nal in _split_length_prefixed(frame, length_size):
            out += b"\x00\x00\x00\x01" + nal

    if "default_duration" in track and track["default_duration"] > 0:
        fps = 1e9 / track["default_duration"]
        # DefaultDuration is ns-quantized; undo the quantization when the
        # muxed rate was integral (round(1e9/fps) loses <1e-7 relative)
        if abs(fps - round(fps)) < 1e-6:
            fps = float(round(fps))
    elif len(blocks) > 1 and blocks[-1][1] > blocks[0][1]:
        span_s = (blocks[-1][1] - blocks[0][1]) * ts_scale / 1e9
        fps = (len(blocks) - 1) / span_s
    else:
        raise ValueError("cannot derive frame rate (no DefaultDuration and "
                         "fewer than two timestamped blocks)")

    duration_s = (duration_ticks * ts_scale / 1e9
                  if duration_ticks is not None else len(blocks) / fps)
    return {
        "annexb": bytes(out),
        "fps": fps,
        "width": track.get("width", 0),
        "height": track.get("height", 0),
        "n_samples": len(blocks),
        "duration_s": duration_s,
    }
