"""FLAC codec tests (vite_spark/text/flac.py — RFC 9639 / public spec).

No FLAC library or third-party sample files exist in this container, so
validation follows the strongest available ladder:
  1. public CRC check values ("123456789" → CRC-8/0x07 = 0xF4,
     CRC-16/0x8005-msb-first = 0xFEE8) pin the integrity polynomials;
  2. hand-built bitstreams written field-by-field from the spec exercise
     the DECODER-ONLY paths the encoder never emits (LPC subframes,
     multi-partition residuals, 5-bit Rice, wasted bits) against
     NumPy-recomputed expected signals;
  3. bit-exact roundtrips across every encoder mode (CONSTANT, FIXED 0-4,
     VERBATIM, raw-escape, all four stereo decorrelations, multi-block,
     odd tails) — FLAC is lossless, so equality is exact, not allclose;
  4. every corruption class (flipped header bit, flipped body bit,
     truncation, bad magic) must raise loudly via the in-stream CRCs.
"""

import struct

import numpy as np
import pytest

from vite_spark.text import flac
from vite_spark.text.flac import (
    _BitReader,
    _BitWriter,
    _utf8_number,
    _read_utf8_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    is_flac,
)


# ---------------------------------------------------------------------------
# 1. integrity polynomials against public check values
# ---------------------------------------------------------------------------

def test_crc_public_check_values():
    # CRC-8 poly 0x07 init 0 (aka CRC-8/SMBUS-without-init): the standard
    # "123456789" check value is 0xF4. CRC-16 poly 0x8005 MSB-first
    # init 0 (aka CRC-16/BUYPASS/UMTS) checks to 0xFEE8. Both are the
    # FLAC frame CRCs per the spec.
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0
    assert crc16(b"") == 0


def test_utf8_frame_number_roundtrip_boundaries():
    vals = [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
            (1 << 21) - 1, 1 << 21, (1 << 26) - 1, 1 << 26,
            (1 << 31) - 1, (1 << 36) - 1]
    for v in vals:
        enc = _utf8_number(v)
        br = _BitReader(enc)
        assert _read_utf8_number(br) == v, v
        assert br.byte == len(enc)


# ---------------------------------------------------------------------------
# helpers to hand-build a single-frame stream field-by-field
# ---------------------------------------------------------------------------

def _streaminfo(n, sr, ch, blocksize):
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)
    si.write(n, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:]
            + body)


def _frame_header(bs, ch):
    bw = _BitWriter()
    bw.write(flac._SYNC, 14)
    bw.write(0, 2)                 # reserved + fixed-blocksize strategy
    bw.write(0b0111, 4)            # blocksize: 16-bit follows
    bw.write(0, 4)                 # sample rate from STREAMINFO
    bw.write(ch - 1, 4)            # independent channels
    bw.write(0b100, 3)             # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)                 # frame number 0 (fits in one byte)
    bw.write(bs - 1, 16)
    bw.align()
    hdr = bw.bytes()
    return hdr + bytes([crc8(hdr)])


def _finish_frame(hdr, bw):
    bw.align()
    body = hdr + bw.bytes()
    return body + struct.pack(">H", crc16(body))


# ---------------------------------------------------------------------------
# 2. decoder-only paths via hand-built bitstreams
# ---------------------------------------------------------------------------

def test_decode_lpc_subframe_hand_built():
    """LPC subframe (order 2, qlp precision 12, shift 3): the encoder
    never emits LPC, so build the bitstream by hand and recompute the
    expected reconstruction x[i] = res[i] + (c0*x[i-1] + c1*x[i-2]) >> 3
    independently in NumPy."""
    bs = 16
    warm = [100, -200]
    coefs = [14, -7]               # stable: pred ≈ 1.75·x₁ − 0.875·x₂
    shift = 3
    res = [3, -1, 0, 7, -2, 5, 1, 0, -4, 2, 6, -3, 1, 0]

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b100001, 6)          # LPC, order-1 field = 1 → order 2
    bw.write(0, 1)                 # no wasted bits
    for w in warm:
        bw.write(w & 0xFFFF, 16)
    bw.write(12 - 1, 4)            # precision-1
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c & 0xFFF, 12)
    # residual: 4-bit Rice, partition order 0, k=4
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(4, 4)
    for r in res:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        bw.write_unary(u >> 4)
        bw.write(u & 15, 4)

    hdr = _frame_header(bs, 1)
    payload = _streaminfo(bs, 8000, 1, bs) + _finish_frame(hdr, bw)

    expected = np.empty(bs, np.int64)
    expected[:2] = warm
    for i in range(2, bs):
        pred = (coefs[0] * expected[i - 1]
                + coefs[1] * expected[i - 2]) >> shift
        expected[i] = res[i - 2] + pred
    out, sr = decode_flac(payload)
    assert sr == 8000
    np.testing.assert_array_equal(out[:, 0], expected.astype(np.int16))


def test_decode_multi_partition_and_5bit_rice():
    """Partition order 2 (4 partitions) with the 5-bit Rice method
    (coding method 1), different k per partition — all decoder-only."""
    bs = 16
    order = 1
    warm = [50]
    res = list(range(-7, 8))       # 15 residuals (bs - order)

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED order 1
    bw.write(0, 1)
    for w in warm:
        bw.write(w & 0xFFFF, 16)
    bw.write(1, 2)                 # coding method 1: 5-bit Rice
    bw.write(2, 4)                 # partition order 2 → 4 partitions of 4
    ks = [0, 2, 5, 3]
    pos = 0
    for p, k in enumerate(ks):
        cnt = bs // 4 - (order if p == 0 else 0)
        bw.write(k, 5)
        for r in res[pos:pos + cnt]:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)
        pos += cnt

    hdr = _frame_header(bs, 1)
    payload = _streaminfo(bs, 44100, 1, bs) + _finish_frame(hdr, bw)

    expected = np.empty(bs, np.int64)
    expected[0] = warm[0]
    for i in range(1, bs):
        expected[i] = res[i - 1] + expected[i - 1]
    out, sr = decode_flac(payload)
    assert sr == 44100
    np.testing.assert_array_equal(out[:, 0], expected.astype(np.int16))


def test_decode_wasted_bits_subframe():
    """CONSTANT subframe with 3 wasted bits: stored value is the sample
    >> 3, reconstruction shifts it back."""
    bs = 8
    stored = -123                  # reconstructed sample = -123 << 3 = -984
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)                 # CONSTANT
    bw.write(1, 1)                 # wasted-bits flag
    bw.write_unary(2)              # unary 2 → wasted = 3
    bw.write(stored & ((1 << 13) - 1), 13)   # bps 16 - 3 wasted
    hdr = _frame_header(bs, 1)
    payload = _streaminfo(bs, 8000, 1, bs) + _finish_frame(hdr, bw)
    out, _ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], np.full(bs, -984, np.int16))


def test_decode_escape_to_raw_partition_hand_built():
    """Rice escape code (0b1111 + 5-bit width) inside a hand-built
    residual, independent of the encoder's own escape heuristic."""
    bs = 8
    order = 0
    res = [1000, -1000, 32000, -32000, 5, -5, 0, 7]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001000, 6)          # FIXED order 0
    bw.write(0, 1)
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0xF, 4)               # escape
    bw.write(17, 5)                # 17-bit raw residuals
    for r in res:
        bw.write(r & ((1 << 17) - 1), 17)
    hdr = _frame_header(bs, 1)
    payload = _streaminfo(bs, 8000, 1, bs) + _finish_frame(hdr, bw)
    out, _ = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], np.array(res, np.int16))


# ---------------------------------------------------------------------------
# 3. encoder → decoder bit-exact roundtrips across every mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,kind", [
    ((1, 1), "constant"),
    ((100, 1), "constant"),
    ((300, 3), "constant"),
    ((4096, 1), "ramp"),            # exactly one full block
    ((4097, 2), "ramp"),            # block + 1-sample tail
    ((10000, 2), "noise"),
    ((5000, 1), "noise"),
    ((777, 8), "noise"),            # max channel count
    ((6000, 2), "sine"),
])
def test_roundtrip_bit_exact(shape, kind):
    rng = np.random.default_rng(hash(shape) % (1 << 32))
    n, ch = shape
    if kind == "constant":
        s = np.full(shape, -12345, np.int16)
    elif kind == "ramp":
        s = ((np.arange(n)[:, None] * 3 - 5000) % 20000 - 10000
             ).astype(np.int16) * np.ones((1, ch), np.int16)
    elif kind == "sine":
        t = np.arange(n)[:, None]
        s = (3000 * np.sin(t / 50.0 + np.arange(ch))).astype(np.int16)
    else:
        s = rng.integers(-32768, 32768, shape).astype(np.int16)
    payload = encode_flac(s, 22050)
    assert is_flac(payload)
    out, sr = decode_flac(payload)
    assert sr == 22050
    np.testing.assert_array_equal(out, s)


@pytest.mark.parametrize("mode", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_roundtrip_every_stereo_mode(mode):
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, (5000, 2)).astype(np.int16)
    out, _ = decode_flac(encode_flac(s, 16000, stereo_mode=mode))
    np.testing.assert_array_equal(out, s)
    # odd (l+r) parity stresses the mid/side lost-bit reconstruction
    s2 = s.copy()
    s2[:, 0] |= 1
    s2[:, 1] &= ~np.int16(1)
    out2, _ = decode_flac(encode_flac(s2, 16000, stereo_mode=mode))
    np.testing.assert_array_equal(out2, s2)


def test_roundtrip_escape_to_raw_signal():
    # alternating extremes give residuals too wide for sane Rice — the
    # encoder's escape heuristic must fire and still roundtrip exactly
    s = np.tile(np.array([32767, -32768], np.int16), 500)[:, None]
    out, _ = decode_flac(encode_flac(s, 8000))
    np.testing.assert_array_equal(out, s)


def test_roundtrip_many_blocks_utf8_frame_numbers():
    # >128 blocks pushes the frame number into multi-byte UTF-8 coding
    n = 4096 * 130 + 17
    s = (np.arange(n) % 251 - 125).astype(np.int16)[:, None]
    out, sr = decode_flac(encode_flac(s, 48000))
    assert sr == 48000
    np.testing.assert_array_equal(out, s)


def test_compression_actually_compresses():
    # a smooth signal must beat raw PCM16 by a wide margin; this guards
    # against a silently-degenerate all-VERBATIM encoder
    t = np.arange(50000)
    s = (8000 * np.sin(t / 300.0)).astype(np.int16)[:, None]
    payload = encode_flac(s, 44100)
    assert len(payload) < s.nbytes // 3
    out, _ = decode_flac(payload)
    np.testing.assert_array_equal(out, s)


# ---------------------------------------------------------------------------
# 4. corruption must fail loudly
# ---------------------------------------------------------------------------

def _valid_payload():
    rng = np.random.default_rng(3)
    s = rng.integers(-2000, 2000, (600, 2)).astype(np.int16)
    return encode_flac(s, 32000)


def test_rejects_bad_magic_and_truncation():
    p = _valid_payload()
    assert not is_flac(b"RIFF" + p[4:])
    with pytest.raises(ValueError):
        decode_flac(b"RIFF" + p[4:])
    with pytest.raises(ValueError):
        decode_flac(p[:len(p) // 2])
    with pytest.raises(ValueError):
        decode_flac(p[:40])


def test_rejects_flipped_bits_via_crcs():
    p = bytearray(_valid_payload())
    # find the first frame: right after the metadata blocks
    si_len = 4 + 4 + (int.from_bytes(p[5:8], "big"))
    hdr_flip = bytearray(p)
    hdr_flip[si_len + 2] ^= 0x04          # inside the frame header
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr_flip))
    body_flip = bytearray(p)
    body_flip[si_len + 20] ^= 0x10        # inside the frame body
    with pytest.raises(ValueError):
        decode_flac(bytes(body_flip))


# ---------------------------------------------------------------------------
# 5. Spark surface: fixture + real decode path, expectations recomputed
# ---------------------------------------------------------------------------

def test_flac_media_and_features_contract(spark):
    """flac_media_from_docs → extract_audio_features (fake=False) on a
    tiny documents table; every output column recomputed independently
    from the fixture contract — the in-repo version of the driver's
    DuckDB oracle, EXACT on the floats (lossless codec, dyadic sums)."""
    import hashlib

    from vite_spark.text.multimodal import (
        extract_audio_features,
        flac_media_from_docs,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (i % 4 + 1)) for i in range(23)],
        "doc_id long, text string",
    )
    media = flac_media_from_docs(docs)
    rows = {r["media_id"]: r
            for r in extract_audio_features(media).collect()}
    assert len(rows) == 23
    for i in range(23):
        text = f"document body {i} " * (i % 4 + 1)
        h = hashlib.sha256(text.encode()).digest()
        ch = i % 2 + 1
        sr = 16000 + i % 7 * 125
        n = i % 277 + 9
        step = i % 5 - 2
        v = int.from_bytes(h[10:12], "little") % 24001 - 12000
        idx = np.arange(n)[:, None]
        c = np.arange(ch)[None, :]
        s = (v + 512 * c + step * idx).astype(np.int16)
        x = s.astype(np.float64) / 32768.0
        r = rows[i]
        assert r["sample_rate"] == sr
        assert r["channels"] == ch
        assert r["n_samples"] == n
        assert r["duration_s"] == n / sr
        assert r["mean_amp"] == float(x.mean())
        assert r["rms_amp"] == float(np.sqrt((x * x).mean()))


def test_rejects_invalid_inputs_to_encoder():
    with pytest.raises(ValueError):
        encode_flac(np.zeros((5, 2), np.int32), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((5, 9), np.int16), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((0, 1), np.int16), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((5, 3), np.int16), 8000, stereo_mode="mid_side")
    with pytest.raises(ValueError):
        encode_flac(np.zeros((5, 1), np.int16), 1 << 20)
