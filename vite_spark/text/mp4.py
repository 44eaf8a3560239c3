"""ISOBMFF (MP4) container muxer/demuxer — pure Python from the public
specs (ISO/IEC 14496-12 box structure, 14496-15 §8.3.3 HEVC sample
entry / HEVCDecoderConfigurationRecord).

This closes the "no container demuxer" stub for MP4 video: an .mp4
holding an H.265 track demuxes to (Annex-B elementary stream, fps from
the mdhd timescale, dims from the sample entry), and the stream then
decodes through the system libde265 (text/syscodecs.decode_hevc). Unlike
a raw .h265 file, the container carries REAL timing, so samplers read
fps from the bytes instead of taking it as a parameter.

Validation stance: the muxer/demuxer roundtrip alone would be a
self-check, so the box walker and the hvcC → Annex-B converter are ALSO
exercised on third-party ISOBMFF bytes — libheif-authored HEIC files
(HEIF is ISOBMFF too: meta/iloc/iprp instead of moov/trak), whose
primary-item HEVC payload this module extracts (extract_heic_hevc) and
feeds to the independent libde265; a single wrong iloc offset width or
hvcC array walk and the decoder errors out. Tests pin both directions.

Scope, honestly: progressive (non-fragmented) MP4 with one video track,
'hvc1'/'hev1' sample entries, stts/stsc/stsz/stco(co64) sample tables.
Fragmented MP4 (moof) and non-HEVC tracks raise loudly.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# generic box walking
# ---------------------------------------------------------------------------

# boxes that contain other boxes directly (no fullbox header in between)
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"mvex", b"moof", b"traf", b"iprp", b"ipco",
}


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end, box_start) for each box in
    data[start:end]. Handles 64-bit largesize; rejects malformed sizes
    loudly rather than looping forever."""
    end = len(data) if end is None else end
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError(f"truncated box header at offset {i}")
        size = struct.unpack_from(">I", data, i)[0]
        btype = data[i + 4:i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError(f"truncated largesize box at offset {i}")
            size = struct.unpack_from(">Q", data, i + 8)[0]
            body = i + 16
        elif size == 0:          # box extends to end of file
            size = end - i
        if size < body - i or i + size > end:
            raise ValueError(
                f"box '{btype.decode(errors='replace')}' at {i} has bad "
                f"size {size} (container ends at {end})")
        yield btype, body, i + size, i
        i += size


def find_boxes(data: bytes, btype: bytes, start: int = 0,
               end: int | None = None) -> list[tuple[int, int]]:
    """All (payload_start, payload_end) spans of top-level boxes of a type."""
    return [(b, e) for t, b, e, _ in walk_boxes(data, start, end) if t == btype]


def find_box(data: bytes, path: list[bytes], start: int = 0,
             end: int | None = None) -> tuple[int, int]:
    """Resolve a nested box path like [b'moov', b'trak', b'mdia'] to the
    FIRST match's (payload_start, payload_end). Raises KeyError if absent."""
    spans = [(start, len(data) if end is None else end)]
    for btype in path:
        nxt = []
        for s, e in spans:
            nxt.extend(find_boxes(data, btype, s, e))
        if not nxt:
            raise KeyError(f"box path {b'/'.join(path).decode()} not found")
        spans = nxt
    return spans[0]


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version)
                + struct.pack(">I", flags)[1:] + payload)


# ---------------------------------------------------------------------------
# Annex-B <-> NAL lists, SPS profile/tier/level, hvcC
# ---------------------------------------------------------------------------

def split_annexb(stream: bytes) -> list[bytes]:
    """Annex-B elementary stream → list of NAL unit byte strings (start
    codes stripped, emulation-prevention bytes left in place — they are
    part of the NAL payload in both framings)."""
    nals, i, n = [], 0, len(stream)
    starts = []
    while i + 2 < n:
        if stream[i] == 0 and stream[i + 1] == 0:
            if stream[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 3 < n and stream[i + 2] == 0 and stream[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("no Annex-B start codes in stream")
    for j, (sc, body) in enumerate(starts):
        end = starts[j + 1][0] if j + 1 < len(starts) else n
        nals.append(stream[body:end])
    return nals


def _nal_type(nal: bytes) -> int:
    return (nal[0] >> 1) & 0x3F


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove 00 00 03 emulation-prevention bytes (H.265 §7.3.1.1)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(rbsp):
        b = rbsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _sps_ptl(sps_nal: bytes) -> dict:
    """profile_tier_level fields from an SPS NAL — they sit at FIXED bit
    positions (H.265 §7.3.2.2.1: 2-byte NAL header, then 4+3+1 bits, then
    profile_tier_level §7.3.3), so no full SPS parse is needed."""
    r = _strip_emulation(sps_nal)
    if len(r) < 15:
        raise ValueError("SPS too short for profile_tier_level")
    # r[0:2] NAL header; r[2]: sps_video_parameter_set_id(4)
    # sps_max_sub_layers_minus1(3) sps_temporal_id_nesting_flag(1)
    max_sub_layers_minus1 = (r[2] >> 1) & 0x7
    b = r[3]
    return {
        "profile_space": (b >> 6) & 0x3,
        "tier_flag": (b >> 5) & 0x1,
        "profile_idc": b & 0x1F,
        "compat_flags": struct.unpack_from(">I", r, 4)[0],
        "constraint_flags": r[8:14],
        "level_idc": r[14],
        "temporal_id_nested": r[2] & 1,
        "num_temporal_layers": max_sub_layers_minus1 + 1,
    }


def build_hvcc(vps: bytes, sps: bytes, pps: bytes,
               length_size: int = 4) -> bytes:
    """HEVCDecoderConfigurationRecord (14496-15 §8.3.3.1) from the three
    parameter-set NALs, profile/tier/level lifted from the SPS itself."""
    ptl = _sps_ptl(sps)
    rec = bytearray()
    rec.append(1)                                           # configurationVersion
    rec.append((ptl["profile_space"] << 6) | (ptl["tier_flag"] << 5)
               | ptl["profile_idc"])
    rec += struct.pack(">I", ptl["compat_flags"])
    rec += ptl["constraint_flags"]
    rec.append(ptl["level_idc"])
    rec += struct.pack(">H", 0xF000)                        # min_spatial_seg
    rec.append(0xFC)                                        # parallelismType
    rec.append(0xFC | 3)                                    # chromaFormat 4:4:4
    rec.append(0xF8)                                        # bitDepthLumaMinus8
    rec.append(0xF8)                                        # bitDepthChromaMinus8
    rec += struct.pack(">H", 0)                             # avgFrameRate
    rec.append((ptl["num_temporal_layers"] << 3)
               | (ptl["temporal_id_nested"] << 2)
               | (length_size - 1))                         # constantFrameRate=0
    arrays = [(32, vps), (33, sps), (34, pps)]
    rec.append(len(arrays))
    for ntype, nal in arrays:
        rec.append(0x80 | ntype)                            # array_completeness=1
        rec += struct.pack(">H", 1)
        rec += struct.pack(">H", len(nal)) + nal
    return bytes(rec)


def parse_hvcc(rec: bytes) -> tuple[list[bytes], int]:
    """hvcC record → (parameter-set NALs in array order, NAL length size)."""
    if len(rec) < 23 or rec[0] != 1:
        raise ValueError("bad HEVCDecoderConfigurationRecord")
    length_size = (rec[21] & 0x3) + 1
    n_arrays = rec[22]
    nals = []
    i = 23
    for _ in range(n_arrays):
        if i + 3 > len(rec):
            raise ValueError("truncated hvcC array header")
        n_nalus = struct.unpack_from(">H", rec, i + 1)[0]
        i += 3
        for _ in range(n_nalus):
            if i + 2 > len(rec):
                raise ValueError("truncated hvcC nalu length")
            ln = struct.unpack_from(">H", rec, i)[0]
            i += 2
            if i + ln > len(rec):
                raise ValueError("truncated hvcC nalu body")
            nals.append(rec[i:i + ln])
            i += ln
    return nals, length_size


def _length_prefixed(nals: list[bytes], length_size: int) -> bytes:
    out = bytearray()
    fmt = {1: ">B", 2: ">H", 4: ">I"}[length_size]
    for nal in nals:
        out += struct.pack(fmt, len(nal)) + nal
    return bytes(out)


def _split_length_prefixed(sample: bytes, length_size: int) -> list[bytes]:
    nals, i = [], 0
    fmt = {1: ">B", 2: ">H", 4: ">I"}[length_size]
    while i < len(sample):
        if i + length_size > len(sample):
            raise ValueError("truncated NAL length prefix in sample")
        ln = struct.unpack_from(fmt, sample, i)[0]
        i += length_size
        if i + ln > len(sample):
            raise ValueError("NAL length overruns sample")
        nals.append(sample[i:i + ln])
        i += ln
    return nals


def annexb_to_access_units(stream: bytes):
    """Split an Annex-B H.265 stream into (param_sets, access_units):
    VPS/SPS/PPS pulled out (they move to hvcC), remaining NALs grouped
    one access unit per VCL NAL with preceding non-VCL NALs (SEI)
    attached. Assumes one slice per picture — exactly what encode_hevc
    emits (x265 slices=1); multi-slice input raises (a second VCL NAL
    with first_slice_segment_in_pic_flag=0 would start mid-AU here)."""
    params = {}
    aus, pending = [], []
    for nal in split_annexb(stream):
        t = _nal_type(nal)
        if t in (32, 33, 34):
            params[t] = nal
        elif t < 32:
            if not (nal[2] & 0x80):     # first_slice_segment_in_pic_flag
                raise ValueError("multi-slice pictures not supported here")
            aus.append(pending + [nal])
            pending = []
        else:
            pending.append(nal)
    if pending:
        if not aus:
            raise ValueError("stream has no VCL NAL units")
        aus[-1].extend(pending)         # trailing suffix SEI
    if set(params) != {32, 33, 34}:
        raise ValueError("stream must carry VPS+SPS+PPS (repeat-headers "
                         "off still emits them once up front)")
    return params, aus


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------

_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def mux_mp4(hevc_annexb: bytes, width: int, height: int, fps: int) -> bytes:
    """Annex-B H.265 elementary stream → progressive MP4: ftyp + mdat
    (length-prefixed samples) + moov (one 'vide' track, 'hvc1' sample
    entry with hvcC, stts with delta 1 at timescale=fps — the container
    now CARRIES the timing a raw elementary stream loses)."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    params, aus = annexb_to_access_units(hevc_annexb)
    length_size = 4
    samples = [_length_prefixed(au, length_size) for au in aus]
    n = len(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomhvc1")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8        # first sample starts after mdat header

    hvcc = build_hvcc(params[32], params[33], params[34], length_size)
    sample_entry = _box(b"hvc1",
                        b"\x00" * 6 + struct.pack(">H", 1)       # data_ref_idx
                        + b"\x00" * 16
                        + struct.pack(">HH", width, height)
                        + struct.pack(">II", 0x00480000, 0x00480000)
                        + b"\x00" * 4
                        + struct.pack(">H", 1)                   # frame_count
                        + b"\x00" * 32                           # compressorname
                        + struct.pack(">Hh", 0x0018, -1)
                        + _box(b"hvcC", hvcc))
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", 0, 0,
                    struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _fullbox(b"url ", 0, 1, b"")                     # self-contained
    dref = _fullbox(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _fullbox(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _fullbox(b"mdhd", 0, 0,
                    struct.pack(">IIII", 0, 0, fps, n)
                    + struct.pack(">HH", 0x55C4, 0))        # language 'und'
    hdlr = _fullbox(b"hdlr", 0, 0,
                    b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _fullbox(b"tkhd", 0, 3,
                    struct.pack(">IIIII", 0, 0, 1, 0, n)
                    + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                    + _MATRIX
                    + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _fullbox(b"mvhd", 0, 0,
                    struct.pack(">IIII", 0, 0, fps, n)
                    + struct.pack(">I", 0x00010000)
                    + struct.pack(">H", 0x0100) + b"\x00" * 10
                    + _MATRIX + b"\x00" * 24
                    + struct.pack(">I", 2))                 # next_track_ID
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------

def is_mp4(payload: bytes | None) -> bool:
    """ISOBMFF ftyp with an MP4-family brand (HEIF brands are claimed by
    syscodecs.is_heif and deliberately excluded here)."""
    return (payload is not None and len(payload) >= 12
            and payload[4:8] == b"ftyp"
            and payload[8:12] in (b"isom", b"iso2", b"iso4", b"iso5",
                                  b"iso6", b"mp41", b"mp42", b"hvc1",
                                  b"hev1", b"dash", b"avc1", b"M4V "))


def demux_mp4(payload: bytes) -> dict:
    """Progressive MP4 → {'annexb', 'fps', 'width', 'height',
    'n_samples', 'duration_s'} for the first (only) HEVC video track.
    The Annex-B stream is the hvcC parameter sets followed by each
    sample's NALs, start-code framed — directly decodable by
    syscodecs.decode_hevc."""
    if not is_mp4(payload):
        raise ValueError("not an MP4 (missing/unknown ftyp brand)")
    if any(t == b"moof" for t, _, _, _ in walk_boxes(payload)):
        raise ValueError("fragmented MP4 (moof) not supported")
    trak_b, trak_e = find_box(payload, [b"moov", b"trak"])
    stbl_b, stbl_e = find_box(payload, [b"mdia", b"minf", b"stbl"],
                              trak_b, trak_e)

    # --- sample entry + hvcC ---
    stsd_b, stsd_e = find_box(payload, [b"stsd"], stbl_b, stbl_e)
    entry_t, entry_b, entry_e, _ = next(
        walk_boxes(payload, stsd_b + 8, stsd_e))
    if entry_t not in (b"hvc1", b"hev1"):
        raise ValueError(f"unsupported sample entry "
                         f"{entry_t.decode(errors='replace')} (HEVC only)")
    width, height = struct.unpack_from(">HH", payload, entry_b + 24)
    hvcc_b, hvcc_e = find_box(payload, [b"hvcC"], entry_b + 78, entry_e)
    param_nals, length_size = parse_hvcc(payload[hvcc_b:hvcc_e])

    # --- timing ---
    mdhd_b, _ = find_box(payload, [b"mdia", b"mdhd"], trak_b, trak_e)
    version = payload[mdhd_b]
    if version == 0:
        timescale, duration = struct.unpack_from(">II", payload, mdhd_b + 12)
    else:
        timescale = struct.unpack_from(">I", payload, mdhd_b + 20)[0]
        duration = struct.unpack_from(">Q", payload, mdhd_b + 24)[0]
    stts_b, _ = find_box(payload, [b"stts"], stbl_b, stbl_e)
    n_stts = struct.unpack_from(">I", payload, stts_b + 4)[0]
    if n_stts < 1:
        raise ValueError("empty stts")
    delta = struct.unpack_from(">I", payload, stts_b + 12)[0]
    if delta <= 0:
        raise ValueError("non-positive sample delta")
    fps = timescale / delta

    # --- sample sizes ---
    stsz_b, _ = find_box(payload, [b"stsz"], stbl_b, stbl_e)
    fixed, n_samples = struct.unpack_from(">II", payload, stsz_b + 4)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", payload,
                                        stsz_b + 12))

    # --- chunk offsets (stco or co64) + stsc run-length map ---
    try:
        stco_b, _ = find_box(payload, [b"stco"], stbl_b, stbl_e)
        n_chunks = struct.unpack_from(">I", payload, stco_b + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload,
                                          stco_b + 8))
    except KeyError:
        stco_b, _ = find_box(payload, [b"co64"], stbl_b, stbl_e)
        n_chunks = struct.unpack_from(">I", payload, stco_b + 4)[0]
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload,
                                          stco_b + 8))
    stsc_b, _ = find_box(payload, [b"stsc"], stbl_b, stbl_e)
    n_stsc = struct.unpack_from(">I", payload, stsc_b + 4)[0]
    runs = [struct.unpack_from(">III", payload, stsc_b + 8 + 12 * i)
            for i in range(n_stsc)]   # (first_chunk, samples_per_chunk, _)

    # walk chunks in order, assigning per-sample absolute offsets
    sample_offsets = []
    si = 0
    for ci in range(n_chunks):
        spc = 0
        for first, per, _ in runs:
            if ci + 1 >= first:
                spc = per
        pos = offsets[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            sample_offsets.append(pos)
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(f"stsc/stco cover {si} samples, stsz says "
                         f"{n_samples}")

    out = bytearray()
    for nal in param_nals:
        out += b"\x00\x00\x00\x01" + nal
    for off, sz in zip(sample_offsets, sizes):
        if off + sz > len(payload):
            raise ValueError("sample extent beyond file end")
        for nal in _split_length_prefixed(payload[off:off + sz],
                                          length_size):
            out += b"\x00\x00\x00\x01" + nal
    return {
        "annexb": bytes(out), "fps": fps, "width": width, "height": height,
        "n_samples": n_samples, "duration_s": duration / timescale,
    }


# ---------------------------------------------------------------------------
# HEIC (HEIF still) extraction — third-party-bytes validation surface
# ---------------------------------------------------------------------------

def extract_heic_hevc(payload: bytes) -> dict:
    """libheif-authored HEIC → {'annexb', 'width', 'height'} for the
    CODED 'hvc1' item (iinf item type; the pitm primary may be a derived
    iden/grid wrapper around it): iprp/ipco + ipma carry its hvcC
    (parameter sets + NAL length size) and ispe (coded dims), iloc the
    coded extents. This is the cross-validation path that keeps the
    ISOBMFF walker honest on bytes this repo did not write — the
    extracted stream must decode through libde265 at the advertised
    dims."""
    meta_b, meta_e = find_box(payload, [b"meta"])
    body = meta_b + 4                       # meta is a FullBox

    # --- iinf: find the coded hvc1 item ---
    iinf_b, iinf_e = find_box(payload, [b"iinf"], body, meta_e)
    iinf_ver = payload[iinf_b]
    i = iinf_b + 4
    if iinf_ver == 0:
        n_items = struct.unpack_from(">H", payload, i)[0]
        i += 2
    else:
        n_items = struct.unpack_from(">I", payload, i)[0]
        i += 4
    coded_id = None
    for t, b, e, _ in walk_boxes(payload, i, iinf_e):
        if t != b"infe":
            continue
        ver = payload[b]
        if ver >= 2:
            # ver2: flags(3) item_ID(2) protection(2) type(4);
            # ver3: item_ID widens to 4 bytes
            item_id = (struct.unpack_from(">H", payload, b + 4)[0]
                       if ver == 2
                       else struct.unpack_from(">I", payload, b + 4)[0])
            toff = b + (8 if ver == 2 else 10)
            if payload[toff:toff + 4] == b"hvc1":
                coded_id = item_id
                break
    if coded_id is None:
        raise ValueError("HEIC without an hvc1 coded item")
    primary = coded_id

    # --- ipma: property indices for the coded item ---
    ipco_b, ipco_e = find_box(payload, [b"iprp", b"ipco"], body, meta_e)
    props = [(t, b, e) for t, b, e, _ in walk_boxes(payload, ipco_b, ipco_e)]
    ipma_b, ipma_e = find_box(payload, [b"iprp", b"ipma"], body, meta_e)
    ipma_ver = payload[ipma_b]
    ipma_flags = int.from_bytes(payload[ipma_b + 1:ipma_b + 4], "big")
    i = ipma_b + 4
    n_assoc = struct.unpack_from(">I", payload, i)[0]
    i += 4
    my_props = None
    for _ in range(n_assoc):
        if ipma_ver < 1:
            item_id = struct.unpack_from(">H", payload, i)[0]
            i += 2
        else:
            item_id = struct.unpack_from(">I", payload, i)[0]
            i += 4
        cnt = payload[i]
        i += 1
        idxs = []
        for _ in range(cnt):
            if ipma_flags & 1:
                v = struct.unpack_from(">H", payload, i)[0]
                i += 2
                idxs.append(v & 0x7FFF)
            else:
                idxs.append(payload[i] & 0x7F)
                i += 1
        if item_id == primary:
            my_props = idxs
    if not my_props:
        raise ValueError("coded item has no ipma property associations")
    hvcc_span = ispe_span = None
    for idx in my_props:                    # 1-based into ipco
        if 1 <= idx <= len(props):
            t, b, e = props[idx - 1]
            if t == b"hvcC":
                hvcc_span = (b, e)
            elif t == b"ispe":
                ispe_span = (b, e)
    if hvcc_span is None or ispe_span is None:
        raise ValueError("coded item lacks hvcC/ispe properties")
    param_nals, length_size = parse_hvcc(
        payload[hvcc_span[0]:hvcc_span[1]])
    width, height = struct.unpack_from(">II", payload, ispe_span[0] + 4)

    # iloc (14496-12 §8.11.3): versioned offset/length field widths
    iloc_b, iloc_e = find_box(payload, [b"iloc"], body, meta_e)
    ver = payload[iloc_b]
    i = iloc_b + 4
    sizes_byte = payload[i]
    offset_size, length_size_f = sizes_byte >> 4, sizes_byte & 0xF
    base_offset_size = payload[i + 1] >> 4
    index_size = (payload[i + 1] & 0xF) if ver in (1, 2) else 0
    i += 2
    if ver < 2:
        item_count = struct.unpack_from(">H", payload, i)[0]
        i += 2
    else:
        item_count = struct.unpack_from(">I", payload, i)[0]
        i += 4

    def read_n(pos, nbytes):
        return int.from_bytes(payload[pos:pos + nbytes], "big"), pos + nbytes

    extents_for_primary = None
    for _ in range(item_count):
        if ver < 2:
            item_id, i = read_n(i, 2)
        else:
            item_id, i = read_n(i, 4)
        if ver in (1, 2):
            construction, i = read_n(i, 2)      # reserved(12)+method(4)
            construction &= 0xF
        else:
            construction = 0
        i += 2                                  # data_reference_index
        base_offset, i = read_n(i, base_offset_size)
        extent_count, i = read_n(i, 2)
        extents = []
        for _ in range(extent_count):
            if index_size:
                _, i = read_n(i, index_size)
            off, i = read_n(i, offset_size)
            ln, i = read_n(i, length_size_f)
            extents.append((base_offset + off, ln))
        if item_id == primary:
            if construction not in (0, 1):
                raise ValueError(f"iloc construction method {construction} "
                                 "not supported (file- or idat-offset only)")
            extents_for_primary = (construction, extents)
    if extents_for_primary is None:
        raise ValueError(f"primary item {primary} not in iloc")

    construction, extents = extents_for_primary
    if construction == 1:       # offsets relative to the meta box's idat
        idat_b, idat_e = find_box(payload, [b"idat"], body, meta_e)
        data = b"".join(payload[idat_b + o:idat_b + o + ln]
                        for o, ln in extents)
        if sum(ln for _, ln in extents) > idat_e - idat_b:
            raise ValueError("idat extent beyond idat box")
    else:
        data = b"".join(payload[o:o + ln] for o, ln in extents)
    out = bytearray()
    for nal in param_nals:
        out += b"\x00\x00\x00\x01" + nal
    for nal in _split_length_prefixed(data, length_size):
        out += b"\x00\x00\x00\x01" + nal
    return {"annexb": bytes(out), "width": width, "height": height}
