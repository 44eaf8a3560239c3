"""Pure-NumPy baseline JPEG (JFIF) codec — ITU-T T.81 sequential DCT.

JPEG is the one image format this repo previously stubbed, on the
assumption it needs external codec libraries. It doesn't: baseline JPEG
is canonical-Huffman entropy coding over quantized 8x8 DCT blocks, all
of which is specified in the public T.81 spec and implementable directly
in NumPy. This module makes the JPEG decode path REAL:

- ``decode_jpeg``: full baseline decode — marker walk, DQT/DHT/SOF0/
  DRI/SOS, interleaved-MCU Huffman decode with byte-unstuffing and
  restart markers, dequantize → de-zigzag → IDCT, chroma upsampling for
  any (H,V) sampling factors (4:4:4, 4:2:2, 4:2:0, ...), JFIF
  YCbCr→RGB. It builds its Huffman tables from the file's own DHT
  segments, so it decodes real-world encoder output (spec Annex K
  tables included), not just this repo's.
- ``encode_jpeg``: baseline encode of grayscale or RGB (4:4:4). The
  Huffman tables are CUSTOM canonical tables declared in DHT (12 DC
  categories at 5 bits, all 162 AC symbols at 9 bits) — bigger output
  than the spec's Annex-K defaults but unambiguously valid, and it keeps
  this file free of 162-entry magic tables. Default quantization is
  all-ones, which makes constant-color blocks roundtrip EXACTLY (DC of a
  constant block is 8·(c−128), an integer; all AC vanish) — the property
  the driver-oracle fixture relies on.

Progressive JPEG (SOF2) is ALSO real (T.81 Annex G.1): multi-scan
spectral selection + successive approximation, EOB-run codes, DC/AC
refinement scans. ``decode_jpeg`` accumulates per-component coefficient
arrays across scans and reconstructs once at EOI; ``encode_jpeg(...,
progressive=True)`` emits a scan script exercising every progressive
feature (interleaved DC first scan at Al=1, DC refinement, per-component
spectral bands at Al=2, two full-band AC refinement passes, EOB-run
accumulation with buffered correction bits — the jcphuff-style encoder
protocol, implemented from the spec). Because successive approximation
is lossless once every refinement scan lands, the progressive and
baseline encodings of the same image carry IDENTICAL coefficients, so
decode(progressive bytes) must be bit-identical to decode(baseline
bytes) — the cross-check the tests pin against the real-world-validated
baseline path. Arithmetic-coded and 12-bit JPEGs are rejected loudly —
they are different codecs, not missing table lookups.

DCT convention: the orthonormal 8-point DCT-II matrix T (T @ X @ T.T)
equals T.81's FDCT with the 1/4·C(u)C(v) scaling folded in.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables --------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Raster indices in zigzag-scan order, generated from the traversal
    rule (up-right on even anti-diagonals) instead of transcribed."""
    order = []
    for d in range(15):
        cells = [(r, d - r) for r in range(8) if 0 <= d - r < 8]
        if d % 2 == 0:
            cells.reverse()
        order += [r * 8 + c for r, c in cells]
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    t[0] /= np.sqrt(2)
    return t


_T = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81's canonical code generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _canonical_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view of the same table."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# encoder-side custom tables: every DC category 0..11 at 5 bits, every AC
# (run, size) symbol plus EOB/ZRL at 9 bits — canonical, no all-ones code
_ENC_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0]

# progressive AC table: the baseline symbols PLUS the EOBn run codes
# (run<<4 with size 0 for run 0..14 — EOB runs of 1..32767 blocks)
_ENC_ACP_VALS = [run << 4 for run in range(15)] + [0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_ENC_ACP_VALS), 0, 0, 0, 0, 0, 0, 0]


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- bit I/O with 0xFF byte stuffing --------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1               # stuffed byte
            else:
                # a real marker mid-entropy means the stream undershot
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02x} in JPEG entropy stream"
                    if nxt is not None else "truncated JPEG entropy stream"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_restart(self, expect: int):
        """Byte-align and consume the RSTn marker at a restart interval."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("missing JPEG restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (expect & 7):
            raise ValueError(f"JPEG restart marker out of order (0xFF{m:02x})")
        self.pos += 2


# --- encoder ---------------------------------------------------------------


def _encode_block(bw: _BitWriter, block: np.ndarray, quant: np.ndarray,
                  dc_pred: int, dc_tab, ac_tab) -> int:
    coef = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    q = np.round(coef / quant).astype(np.int64).ravel()[_ZIGZAG]
    diff = int(q[0]) - dc_pred
    t = _category(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(q[1:])[0])) + 1 if (q[1:] != 0).any() else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]          # ZRL: 16 zeros
            bw.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_tab[(run << 4) | t]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]              # EOB
        bw.write(code, ln)
    return int(q[0])


# --- progressive encoder (T.81 Annex G.1; jcphuff-style protocol) ----------


def _prog_coefs(planes, quant):
    """Quantized zigzag-order coefficient arrays, one (bh, bw, 64) int32
    per component — the same math as _encode_block's front half,
    vectorized over all blocks."""
    out = []
    for p in planes:
        h, w = p.shape
        bh, bw_ = (h + 7) // 8, (w + 7) // 8
        pad = np.pad(p, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
        blocks = pad.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
        coef = _T @ blocks @ _T.T
        q = np.round(coef / quant).astype(np.int32).reshape(bh, bw_, 64)
        out.append(q[:, :, _ZIGZAG])
    return out


def _sos_segment(comps: list[tuple[int, int, int]], ss: int, se: int,
                 ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _prog_dc_first(bwr: _BitWriter, coefs: list[np.ndarray], al: int, dc_tab):
    """Interleaved DC first scan: DPCM over the Al-shifted DC values
    (arithmetic shift, per G.1.2.1)."""
    bh, bw_ = coefs[0].shape[:2]
    preds = [0] * len(coefs)
    for by in range(bh):
        for bx in range(bw_):
            for ci, cf in enumerate(coefs):
                v = int(cf[by, bx, 0]) >> al
                diff = v - preds[ci]
                preds[ci] = v
                t = _category(diff)
                code, ln = dc_tab[t]
                bwr.write(code, ln)
                if t:
                    bwr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _prog_dc_refine(bwr: _BitWriter, coefs: list[np.ndarray], al: int):
    """DC refinement: one raw bit (bit Al, two's complement) per block."""
    bh, bw_ = coefs[0].shape[:2]
    for by in range(bh):
        for bx in range(bw_):
            for cf in coefs:
                bwr.write((int(cf[by, bx, 0]) >> al) & 1, 1)


def _emit_eobn(bwr: _BitWriter, eobrun: int, ac_tab):
    r = eobrun.bit_length() - 1
    code, ln = ac_tab[r << 4]
    bwr.write(code, ln)
    if r:
        bwr.write(eobrun - (1 << r), r)


def _prog_ac_first(bwr: _BitWriter, cf3: np.ndarray, ss: int, se: int,
                   al: int, ac_tab):
    """Single-component AC first scan over band [ss, se]: values are the
    quantized coefficients divided by 2^Al truncated toward zero
    (sign-magnitude, G.1.2.2), with EOB runs accumulated across blocks."""
    bh, bw_ = cf3.shape[:2]
    eobrun = 0
    for by in range(bh):
        for bx in range(bw_):
            band = cf3[by, bx, ss:se + 1]
            vals = [int(v) >> al if v >= 0 else -((-int(v)) >> al)
                    for v in band]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _emit_eobn(bwr, eobrun, ac_tab)
                    eobrun = 0
                continue
            if eobrun:
                _emit_eobn(bwr, eobrun, ac_tab)
                eobrun = 0
            run = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]
                    bwr.write(code, ln)
                    run -= 16
                t = _category(v)
                code, ln = ac_tab[(run << 4) | t]
                bwr.write(code, ln)
                bwr.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if nz[-1] < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _emit_eobn(bwr, eobrun, ac_tab)
                    eobrun = 0
    if eobrun:
        _emit_eobn(bwr, eobrun, ac_tab)


def _prog_ac_refine(bwr: _BitWriter, cf3: np.ndarray, ss: int, se: int,
                    al: int, ac_tab):
    """Single-component AC refinement (Ah = Al+1): newly-significant
    coefficients as (run-of-zero-history, size 1) symbols with a sign
    bit; already-nonzero coefficients contribute one correction bit each,
    buffered and flushed after the next symbol/EOBn so the decoder reads
    them interleaved in k order (G.1.2.3)."""
    bh, bw_ = cf3.shape[:2]
    eobrun = 0
    pending: list[int] = []          # correction bits awaiting a flush

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            _emit_eobn(bwr, eobrun, ac_tab)
            eobrun = 0
            for b in pending:
                bwr.write(b, 1)
            pending = []

    for by in range(bh):
        for bx in range(bw_):
            band = cf3[by, bx, ss:se + 1]
            absv = [abs(int(v)) >> al for v in band]
            eob = 0                  # 1 past the last newly-nonzero index
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i + 1
            r = 0
            newbits: list[int] = []  # this block's buffered corrections
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    flush_eob()
                    code, ln = ac_tab[0xF0]
                    bwr.write(code, ln)
                    r -= 16
                    for b in newbits:
                        bwr.write(b, 1)
                    newbits = []
                if a > 1:            # already nonzero: correction bit
                    newbits.append(a & 1)
                    continue
                flush_eob()
                code, ln = ac_tab[(r << 4) | 1]
                bwr.write(code, ln)
                bwr.write(0 if band[i] < 0 else 1, 1)
                r = 0
                for b in newbits:
                    bwr.write(b, 1)
                newbits = []
            if r > 0 or newbits:
                eobrun += 1
                pending += newbits
                if eobrun == 0x7FFF or len(pending) > 900:
                    flush_eob()
    flush_eob()


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(img: np.ndarray, quant: np.ndarray | None = None,
                progressive: bool = False) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → JFIF bytes (4:4:4,
    custom canonical Huffman tables, all-ones quantization by default so
    constant-color content roundtrips exactly). With ``progressive=True``
    the same quantized coefficients are emitted as an SOF2 multi-scan
    stream (DC at Al=1 + refinement, per-component spectral bands 1-5 and
    6-63 at Al=2, then two full-band refinement passes to Al=0) —
    successive approximation is lossless once all scans land, so decode
    output is bit-identical to the baseline encoding's."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3 and 0 not in img.shape[:2]:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [np.round(p).clip(0, 255) for p in (y, cb, cr)]
    else:
        raise ValueError(f"expected (H, W) gray or (H, W, 3) RGB, got {img.shape}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64)
    if quant.shape != (8, 8) or (quant < 1).any() or (quant > 255).any():
        raise ValueError("quant table must be 8x8 with entries in 1..255")

    out = bytearray(b"\xff\xd8")                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])        # DQT, 8-bit, id 0
    out += bytes(quant.ravel()[_ZIGZAG].astype(np.uint8))
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])      # id, 1x1 sampling (4:4:4), quant 0
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"       # SOF2/SOF0
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    if progressive:
        out += _dht_segment(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
        out += _dht_segment(1, 0, _ENC_ACP_BITS, _ENC_ACP_VALS)
        dc_tab = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
        ac_tab = _canonical_codes(_ENC_ACP_BITS, _ENC_ACP_VALS)
        coefs = _prog_coefs(planes, quant)
        all_ids = [(ci + 1, 0, 0) for ci in range(nc)]
        scans = [("dc_first", all_ids, 0, 0, 0, 1),
                 ("dc_refine", all_ids, 0, 0, 1, 0)]
        for ci in range(nc):
            one = [(ci + 1, 0, 0)]
            scans += [("ac_first", one, 1, 5, 0, 2),
                      ("ac_first", one, 6, 63, 0, 2),
                      ("ac_refine", one, 1, 63, 2, 1),
                      ("ac_refine", one, 1, 63, 1, 0)]
        for kind, ids, ss, se, ah, al in scans:
            out += _sos_segment(ids, ss, se, ah, al)
            writer = _BitWriter()
            if kind == "dc_first":
                _prog_dc_first(writer, coefs, al, dc_tab)
            elif kind == "dc_refine":
                _prog_dc_refine(writer, coefs, al)
            elif kind == "ac_first":
                _prog_ac_first(writer, coefs[ids[0][0] - 1], ss, se, al, ac_tab)
            else:
                _prog_ac_refine(writer, coefs[ids[0][0] - 1], ss, se, al, ac_tab)
            writer.flush()
            out += writer.out
        out += b"\xff\xd9"                                         # EOI
        return bytes(out)
    out += _dht_segment(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_segment(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    padded = [np.pad(p, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
              for p in planes]
    dc_tab = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    writer = _BitWriter()
    preds = [0] * nc
    for by in range(bh):
        for bx in range(bw_):
            for ci, plane in enumerate(padded):   # interleaved 4:4:4 MCU
                blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                preds[ci] = _encode_block(writer, blk, quant, preds[ci],
                                          dc_tab, ac_tab)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def is_jpeg(payload: bytes | None) -> bool:
    return (payload is not None and len(payload) >= 4
            and payload[:2] == b"\xff\xd8" and payload[2] == 0xFF)


def _receive_extend(br: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = br.bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB (grayscale replicated).

    Implements the full T.81 baseline path: DQT/DHT/SOF0/DRI/SOS marker
    walk, interleaved-MCU canonical-Huffman decode with byte unstuffing
    and restart-marker handling, dequantize → de-zigzag → IDCT, per-
    component replication upsampling for any sampling factors, JFIF
    YCbCr→RGB. Rejects progressive/arithmetic/12-bit forms loudly."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (missing SOI marker)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None        # (h, w, [(cid, hs, vs, tq)])
    restart = 0
    progressive = False
    coefs: dict[int, np.ndarray] | None = None   # cid -> (nby, nbx, 64) zigzag
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                   # EOI before scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                         # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2: pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                   # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                bp += 1
                if pq == 0:
                    tab = np.frombuffer(body, np.uint8, 64, bp).astype(np.int64)
                    bp += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, bp).astype(np.int64)
                    bp += 128
                qtabs[tq] = tab[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:                 # DHT
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 15
                bits = list(body[bp + 1: bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17: bp + 17 + n])
                htabs[(cls, tid)] = _canonical_decode_map(bits, vals)
                bp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/SOF1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (precision={prec})")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF 0x{marker:02x})")
        elif marker == 0xDD:                 # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                 # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i: 3 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            if not progressive:
                return _decode_scan(payload, pos + seglen, frame, scan,
                                    qtabs, htabs, restart)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _progressive_scan(payload, pos + seglen, frame, scan,
                                    (ss, se, aa >> 4, aa & 15), htabs,
                                    restart, coefs)
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qtabs)
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, qtabs, htabs, restart):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        hs, vs, tq = by_id[cs]
        if tq not in qtabs or (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("JPEG scan references a missing DQT/DHT table")
        order.append((cs, hs, vs, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))
    hmax = max(hs for _, hs, _, _, _, _ in order)
    vmax = max(vs for _, _, vs, _, _, _ in order)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {cs: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
              for cs, hs, vs, _, _, _ in order}
    br = _BitReader(payload, pos)
    preds = {cs: 0 for cs, *_ in order}
    rst = 0
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_to_restart(rst)
                rst = (rst + 1) & 7
                preds = {cs: 0 for cs in preds}
            for cs, hs, vs, quant, dtab, atab in order:
                for v in range(vs):
                    for u in range(hs):
                        t = _huff_symbol(br, dtab)
                        diff = _receive_extend(br, t)
                        preds[cs] += diff
                        q = np.zeros(64, dtype=np.int64)
                        q[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = _huff_symbol(br, atab)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index out of range")
                            q[k] = _receive_extend(br, rs & 15)
                            k += 1
                        coef = (q[_UNZIGZAG].reshape(8, 8) * quant).astype(np.float64)
                        blk = _T.T @ coef @ _T + 128.0
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        planes[cs][y0:y0 + 8, x0:x0 + 8] = blk
            n_mcu += 1
    full = []
    for cs, hs, vs, *_ in order:
        p = planes[cs]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    return _to_rgb(full)


def _to_rgb(full: list[np.ndarray]) -> np.ndarray:
    """Cropped float component planes → uint8 RGB (shared by the baseline
    and progressive reconstruction paths)."""
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.stack([g, g, g], axis=2))
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive decoder (T.81 Annex G.2) -----------------------------------


def _frame_geometry(frame):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(frame) -> dict[int, np.ndarray]:
    """Per-component coefficient store, zigzag order, padded to the full
    interleaved-MCU grid so both scan kinds index the same arrays."""
    _, _, comps = frame
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    return {cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
            for cid, hs, vs, _ in comps}


def _comp_block_grid(frame, cid) -> tuple[int, int]:
    """Non-interleaved block grid for one component: ceil(comp dims / 8)
    where comp dims are the frame dims scaled by sampling (A.1.1)."""
    h, w, comps = frame
    hmax, vmax, _, _ = _frame_geometry(frame)
    hs, vs = next((hs, vs) for c, hs, vs, _ in comps if c == cid)
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(payload, pos, frame, scan, band, htabs, restart,
                      coefs) -> int:
    """Decode one progressive scan into the coefficient store and return
    the offset just past its entropy data. Implements all four scan
    kinds: DC first (interleaved DPCM of Al-shifted values), DC
    refinement (raw bits), AC first (spectral band with EOB runs), AC
    refinement (newly-significant insertions + interleaved correction
    bits) — T.81 G.2 / the jdphuff decode protocol."""
    h, w, comps = frame
    ss, se, ah, al = band
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se=0")
    if not is_dc and len(scan) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    dtabs, atab = {}, None
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        if is_dc and ah == 0:
            if (0, td) not in htabs:
                raise ValueError("JPEG scan references a missing DHT table")
            dtabs[cs] = htabs[(0, td)]
        if not is_dc:
            if (1, ta) not in htabs:
                raise ValueError("JPEG scan references a missing DHT table")
            atab = htabs[(1, ta)]
    # MCU list: interleaved (multi-component DC) or one block per MCU
    if len(scan) == 1:                       # non-interleaved (B.2.3)
        cs = scan[0][0]
        nby, nbx = _comp_block_grid(frame, cs)
        mcus = [[(cs, by, bx)] for by in range(nby) for bx in range(nbx)]
    else:
        mcus = []
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for cs, _, _ in scan:
                    hs, vs, _ = by_id[cs]
                    for v in range(vs):
                        for u in range(hs):
                            blocks.append((cs, my * vs + v, mx * hs + u))
                mcus.append(blocks)
    br = _BitReader(payload, pos)
    preds = {cs: 0 for cs, *_ in scan}
    eobrun = 0
    rst = 0
    p1 = 1 << al
    for n, blocks in enumerate(mcus):
        if restart and n and n % restart == 0:
            br.align_to_restart(rst)
            rst = (rst + 1) & 7
            preds = {cs: 0 for cs in preds}
            eobrun = 0
        for cs, by, bx in blocks:
            cf = coefs[cs][by, bx]
            if is_dc:
                if ah == 0:
                    t = _huff_symbol(br, dtabs[cs])
                    preds[cs] += _receive_extend(br, t)
                    cf[0] = preds[cs] << al
                elif br.bit():
                    cf[0] |= p1
            elif ah == 0:
                eobrun = _ac_first_block(br, cf, ss, se, al, atab, eobrun)
            else:
                eobrun = _ac_refine_block(br, cf, ss, se, al, atab, eobrun)
    return br.pos


def _ac_first_block(br, cf, ss, se, al, atab, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_symbol(br, atab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:                      # EOBn: run of 2^r + ext blocks
                eobrun = (1 << r) - 1        # current block consumed here
                if r:
                    eobrun += br.bits(r)
                break
            k += 16                          # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG AC index out of range")
            cf[k] = _receive_extend(br, s) << al
            k += 1
    return eobrun


def _ac_refine_block(br, cf, ss, se, al, atab, eobrun) -> int:
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        # decoder has |coef| >= 2^(al+1) here; move it toward larger
        # magnitude iff bit al is not already set (G.2's correction rule)
        if br.bit() and (int(cf[k]) & p1) == 0:
            cf[k] += p1 if cf[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_symbol(br, atab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r          # decremented in the tail below
                    if r:
                        eobrun += br.bits(r)
                    break
                val = 0                      # ZRL: skip 16 zero-history coefs
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement size")
                val = p1 if br.bit() else m1
            while k <= se:
                if cf[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("JPEG AC refinement overran its band")
                cf[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:                       # trailing corrections, this block
            if cf[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qtabs) -> np.ndarray:
    h, w, comps = frame
    hmax, vmax, _, _ = _frame_geometry(frame)
    full = []
    for cid, hs, vs, tq in comps:
        if tq not in qtabs:
            raise ValueError("JPEG frame references a missing DQT table")
        cf = coefs[cid]
        nby, nbx = cf.shape[:2]
        blocks = cf[:, :, _UNZIGZAG].reshape(nby, nbx, 8, 8) * qtabs[tq]
        pix = _T.T @ blocks.astype(np.float64) @ _T + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    return _to_rgb(full)
