"""Pure-NumPy/Python FLAC codec (RFC 9639 / the public FLAC format spec).

Why FLAC and not MP3: FLAC is fully implementable from the spec with no
large constant tables — Rice/unary entropy coding, fixed polynomial
predictors (orders 0-4 with binomial coefficients), stream-carried LPC
coefficients, CRC-8/CRC-16 integrity — whereas a trustworthy MP3 decoder
needs the spec's 512-entry synthesis window and 34 Huffman tables, which
cannot be reproduced reliably from memory (see COVERAGE.md). FLAC is
LOSSLESS, so encode → decode roundtrips samples BIT-EXACTLY and the
driver fixture's amplitude statistics stay SQL-oracle-able, same policy
as the WAV/ADPCM/AU paths.

Decoder scope: everything a fixed-blocksize encoder can emit plus what
real-world encoders use — constant / verbatim / fixed(0-4) / LPC
subframes, all four stereo decorrelation modes (independent, left/side,
right/side, mid/side), 4- and 5-bit Rice partitions with escape-to-raw,
wasted bits, UTF-8-style frame numbering, and both CRCs VERIFIED (a
flipped bit anywhere fails loudly, which substitutes for the missing
third-party sample files as far as structural integrity goes).

Encoder scope: fixed 4096-sample blocks (last short), per-channel best
fixed predictor by residual magnitude, single-partition Rice with
escape, and optional mid/side or left/side decorrelation for stereo so
the decoder's reconstruction paths are exercised by tests, not just the
independent one.
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0b11111111111110

# CRC-8 poly x^8+x^2+x+1 (0x07), CRC-16 poly x^16+x^15+x^2+1 (0x8005),
# both init 0, MSB-first — per the FLAC spec.


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, np.uint32)
    for i in range(256):
        r = i << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[i] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TAB[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code (corrupt stream)")
        return q

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return ((r << 1) ^ (r >> 63)).astype(np.uint64)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# fixed predictor residuals: order-k forward difference (binomial coeffs)
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (values up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + 1:    # capacity: (7-nbytes) + 6*(nbytes-1)
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large")
    lead_bits = 7 - nbytes
    cont = [(n >> (6 * i)) & 0x3F for i in range(nbytes - 1)][::-1]
    lead = ((0xFF << (lead_bits + 1)) & 0xFF) | (n >> (6 * (nbytes - 1)))
    return bytes([lead] + [0x80 | c for c in cont])


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_BLOCK = 4096


def _rice_param(u: np.ndarray) -> int:
    if len(u) == 0 or not u.any():
        return 0
    mean = float(u.mean())
    k = max(0, int(np.ceil(np.log2(mean + 1))) - 1)
    return min(k, 14)


def _write_residual(bw: _BitWriter, res: np.ndarray):
    """Single-partition 4-bit Rice, escaping to raw when Rice would blow
    up (spec escape code 0b1111 + 5-bit raw bit width)."""
    u = _zigzag(res)
    k = _rice_param(u)
    bw.write(0, 2)              # coding method: 4-bit Rice
    bw.write(0, 4)              # partition order 0
    # escape if any quotient is enormous
    if len(u) and int(u.max()) >> k > 1 << 16:
        width = int(max(int(u.max()).bit_length() + 1, 2))
        if width > 31:
            raise ValueError("residual too wide for raw escape")
        bw.write(0xF, 4)
        bw.write(width, 5)
        for v in res:
            bw.write(int(v) & ((1 << width) - 1), width)
        return
    bw.write(k, 4)
    for uv in u:
        uv = int(uv)
        bw.write_unary(uv >> k)
        bw.write(uv & ((1 << k) - 1), k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    if len(x) and (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)          # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_order, best_cost = 0, None
    max_order = min(4, len(x) - 1)
    for o in range(max_order + 1):
        cost = int(np.abs(_fixed_residual(x, o)).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = o, cost
    res = _fixed_residual(x, best_order)
    if len(res) and int(np.abs(res).max()) >= 1 << 30:
        bw.write(0, 1)
        bw.write(1, 6)          # VERBATIM fallback
        bw.write(0, 1)
        for v in x:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)   # FIXED, order
    bw.write(0, 1)                       # no wasted bits
    for v in x[:best_order]:             # warmup
        bw.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(bw, res)


def encode_flac(samples: np.ndarray, sample_rate: int,
                stereo_mode: str = "auto") -> bytes:
    """(n, channels) int16 → FLAC bytes. Lossless: decode_flac returns
    the exact input. stereo_mode: 'independent', 'mid_side',
    'left_side', 'right_side', or 'auto' (mid/side for 2 channels)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("expected (n, channels) int16 samples")
    n, ch = samples.shape
    if not 1 <= ch <= 8 or n < 1:
        raise ValueError(f"unsupported shape {samples.shape}")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("bad sample rate")
    if stereo_mode == "auto":
        stereo_mode = "mid_side" if ch == 2 else "independent"
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    frames = []
    for f0 in range(0, n, _BLOCK):
        blk = samples[f0:f0 + _BLOCK].astype(np.int64)
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)
        bw.write(0, 1)                       # fixed blocksize strategy
        if bs == _BLOCK:
            bsbits, bstail = 0b1100, None    # 256 * 2^(12-8) = 4096
        else:
            bsbits, bstail = 0b0111, bs - 1  # 16-bit follows
        bw.write(bsbits, 4)
        bw.write(0, 4)                       # sample rate: from STREAMINFO
        assign = {"independent": ch - 1, "left_side": 8,
                  "right_side": 9, "mid_side": 10}[stereo_mode]
        bw.write(assign, 4)
        bw.write(0b100, 3)                   # 16 bits per sample
        bw.write(0, 1)
        for b in _utf8_number(f0 // _BLOCK):
            bw.write(b, 8)
        if bstail is not None:
            bw.write(bstail, 16)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        for b in hdr:
            bw.write(b, 8)
        bw.write(crc8(hdr), 8)

        if stereo_mode == "independent":
            chans = [(blk[:, c], 16) for c in range(ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right                      # 17 bits
            if stereo_mode == "left_side":
                chans = [(left, 16), (side, 17)]
            elif stereo_mode == "right_side":
                chans = [(side, 17), (right, 16)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, 16), (side, 17)]
        for x, bps in chans:
            _encode_subframe(bw, x, bps)
        bw.align()
        body = bw.bytes()
        frames.append(body + struct.pack(">H", crc16(body)))

    si = _BitWriter()
    si.write(_BLOCK if n >= _BLOCK else n % _BLOCK or n, 16)  # min blocksize
    si.write(_BLOCK, 16)                                      # max blocksize
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)                                           # bps-1 = 15
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + b"\x00" * 16                    # MD5 unset
    header = (b"fLaC"
              + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
              + streaminfo)
    return header + b"".join(frames)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def is_flac(payload: bytes | None) -> bool:
    return payload is not None and len(payload) > 42 and payload[:4] == b"fLaC"


_BPS_BITS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    kbits = 4 if method == 0 else 5
    esc = (1 << kbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if bs % nparts or bs // nparts <= order and nparts > 1:
        if bs % nparts:
            raise ValueError("block size not divisible by partition count")
    out = np.empty(bs - order, np.int64)
    pos = 0
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        k = br.read(kbits)
        if k == esc:
            width = br.read(5)
            for i in range(cnt):
                out[pos + i] = (br.read_signed(width) if width else 0)
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                out[pos + i] = _unzigzag(u)
        pos += cnt
    return out


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):                           # wasted-bits flag
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0:                           # CONSTANT
        x = np.full(bs, br.read_signed(bps), np.int64)
    elif stype == 1:                         # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(bs)], np.int64)
    elif 8 <= stype <= 12:                   # FIXED
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        if order == 0:
            x = res.copy()
        else:
            x = np.empty(bs, np.int64)
            x[:order] = warm
            coef = {1: [1], 2: [2, -1], 3: [3, -3, 1],
                    4: [4, -6, 4, -1]}[order]
            for i in range(order, bs):
                x[i] = res[i - order] + sum(
                    c * x[i - 1 - j] for j, c in enumerate(coef))
    elif stype >= 32:                        # LPC
        order = (stype & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, np.int64)
        x[:order] = warm
        for i in range(order, bs):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            x[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n, channels) int16, sample_rate). Both CRCs are
    verified per frame; any reserved field or truncation raises."""
    if not is_flac(payload):
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        btype = hdr & 0x7F
        body = payload[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    sr = (int.from_bytes(streaminfo[10:13], "big") >> 4)
    ch_si = ((streaminfo[12] >> 1) & 0x7) + 1
    bps_si = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = ((streaminfo[13] & 0xF) << 32) | int.from_bytes(
        streaminfo[14:18], "big")
    if bps_si != 16:
        raise ValueError(f"only 16-bit FLAC supported here, got {bps_si}")

    chunks = []
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != _SYNC:
            raise ValueError(f"lost frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("reserved bit set in frame header")
        br.read(1)                                   # blocking strategy
        bsbits = br.read(4)
        srbits = br.read(4)
        assign = br.read(4)
        szbits = br.read(3)
        if br.read(1):
            raise ValueError("reserved bit set in frame header")
        _read_utf8_number(br)
        if bsbits == 0:
            raise ValueError("reserved block size code")
        elif bsbits == 1:
            bs = 192
        elif bsbits <= 5:
            bs = 576 << (bsbits - 2)
        elif bsbits == 6:
            bs = br.read(8) + 1
        elif bsbits == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bsbits - 8)
        if srbits == 12:
            br.read(8)
        elif srbits in (13, 14):
            br.read(16)
        elif srbits == 15:
            raise ValueError("invalid sample rate code")
        br.align()
        hdr_len = br.byte - frame_start
        if crc8(payload[frame_start:br.byte]) != payload[br.byte]:
            raise ValueError("frame header CRC-8 mismatch")
        br.byte += 1

        bps = 16 if szbits == 0 else _BPS_BITS.get(szbits)
        if bps is None:
            raise ValueError("reserved sample size code")
        if assign < 8:
            nch = assign + 1
            subs = [_decode_subframe(br, bs, bps) for _ in range(nch)]
            blk = np.stack(subs, axis=1)
        elif assign in (8, 9, 10):
            nch = 2
            extra0 = 1 if assign == 9 else 0
            extra1 = 1 if assign in (8, 10) else 0
            a = _decode_subframe(br, bs, bps + extra0)
            b = _decode_subframe(br, bs, bps + extra1)
            if assign == 8:                          # left/side
                left, right = a, a - b
            elif assign == 9:                        # right/side
                left, right = a + b, b
            else:                                    # mid/side: the lost
                # low bit of (l+r) is recoverable from side's parity
                side = b
                mid2 = (a << 1) | (side & 1)
                left = (mid2 + side) >> 1
                right = left - side
            blk = np.stack([left, right], axis=1)
        else:
            raise ValueError("reserved channel assignment")
        if nch != ch_si:
            raise ValueError("frame channel count != STREAMINFO")
        br.align()
        if crc16(payload[frame_start:br.byte]) != struct.unpack_from(
                ">H", payload, br.byte)[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.byte + 2
        chunks.append(blk)

    out = np.concatenate(chunks) if chunks else np.empty((0, ch_si), np.int64)
    if total and len(out) > total:
        out = out[:total]
    if len(out) and (out.max() > 32767 or out.min() < -32768):
        raise ValueError("decoded samples exceed int16 range (corrupt)")
    return out.astype(np.int16), sr
