"""BMP codec (text/codecs.py) pinned to the public format spec, and the
real multimodal decode path that rides on it."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from vite_spark.text.codecs import (
    decode_bmp,
    encode_bmp,
    is_bmp,
    resize_nearest,
)


def _reference_bmp_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-built 2x2 24-bit BMP from the spec (NOT via encode_bmp):
    bottom-up rows, BGR triples, 4-byte row padding."""
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    # stride = (3*2 + 3) & ~3 = 8; two rows = 16 pixel bytes
    pix = bytes(
        # bottom row first: (0,0,255)->BGR ff 00 00 ; white -> ff ff ff ; pad
        [0xFF, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00,
         # top row: (255,0,0)->00 00 ff ; (0,255,0)->00 ff 00 ; pad
         0x00, 0x00, 0xFF, 0x00, 0xFF, 0x00, 0x00, 0x00]
    )
    head = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return head + info + pix, rgb


def test_decode_matches_spec_literal():
    payload, expected = _reference_bmp_2x2()
    got = decode_bmp(payload)
    assert got.shape == (2, 2, 3)
    assert (got == expected).all()


def test_encode_decode_roundtrip_arbitrary_sizes():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 4), (17, 31), (8, 8)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(rgb))
        assert out.shape == (h, w, 3)
        assert (out == rgb).all()


def test_decode_top_down_variant():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(encode_bmp(rgb))
    # flip height sign (offset 22, i32) -> top-down row order
    struct.pack_into("<i", payload, 22, -2)
    flipped = decode_bmp(bytes(payload))
    assert (flipped == rgb[::-1]).all()


def test_decode_rejects_unsupported_loudly():
    payload = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", payload, 28, 8)   # bpp = 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(payload))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"BX" + bytes(60))
    assert not is_bmp(b"BM too short")


def test_resize_nearest_exact_blocks():
    # 2x2 upsampled 2x: each source pixel becomes a 2x2 block
    rgb = np.array(
        [[[10, 0, 0], [0, 20, 0]], [[0, 0, 30], [40, 40, 40]]], np.uint8
    )
    up = resize_nearest(rgb, 4, 4)
    assert up.shape == (4, 4, 3)
    for r in range(4):
        for c in range(4):
            assert (up[r, c] == rgb[r // 2, c // 2]).all()
    # identity resize
    assert (resize_nearest(rgb, 2, 2) == rgb).all()


def test_multimodal_real_decode_on_spark(spark):
    """Real path end-to-end: BMP payloads decode to true dims/means, and a
    'BM'-prefixed TEXT payload falls through to the stub instead of
    crashing (UTF-8 can never satisfy the bpp/compression bytes)."""
    import pandas as pd

    from vite_spark.text.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_media,
    )

    rgb = np.zeros((3, 5, 3), np.uint8)
    rgb[..., 0] = 200   # constant red channel
    bmp = encode_bmp(rgb)
    trap = ("BM" + "x" * 100).encode()   # BM magic, not a BMP
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "kind": ["image", "image"],
            "payload": [bmp, trap],
            "mime": ["image/bmp", "text/plain"],
            "meta_width": pd.array([None, None], dtype="Int64"),
            "meta_height": pd.array([None, None], dtype="Int64"),
            "meta_duration_s": pd.array([None, None], dtype="Float64"),
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)

    rows = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    real = rows[1]
    assert (real["width"], real["height"]) == (5, 3)
    assert real["n_bytes"] == len(bmp)
    assert real["features"][0] == round(200 / 255.0, 6)
    assert real["features"][1] == 0.0 and real["features"][2] == 0.0
    # trap row took the deterministic stub path (sha-derived dims)
    h = hashlib.sha256(trap).digest()
    assert rows[2]["width"] == int.from_bytes(h[0:2], "big") % 4096 + 1

    # fake=False: real BMP decodes, non-BMP raises loudly
    only_bmp = spark.createDataFrame(pdf[pdf.media_id == 1], schema=MEDIA_SCHEMA)
    assert extract_features(only_bmp).count() == 1
    with pytest.raises(Exception, match="BMP"):
        extract_features(media).collect()

    # real resize: decode -> nearest resample -> re-encode, sha of real bytes
    rrows = {r["media_id"]: r for r in resize_media(media, 4, 2, fake=True).collect()}
    expect = encode_bmp(resize_nearest(rgb, 4, 2))
    assert bytes(rrows[1]["payload"]) == expect
    assert rrows[1]["resized_sha"] == hashlib.sha256(expect).hexdigest()


def test_bmp_media_from_docs_contract(spark):
    """Driver-fixture contract: dims/pixel formulas match what the DuckDB
    oracle recomputes (queries.SQL_MULTIMODAL_BMP)."""
    import pandas as pd

    from vite_spark.text.multimodal import bmp_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 5, 40], "text": ["alpha", "beta", "gamma"]})
    )
    out = {r["media_id"]: r for r in bmp_media_from_docs(docs).collect()}
    for doc_id, text in [(0, "alpha"), (5, "beta"), (40, "gamma")]:
        rgb = decode_bmp(bytes(out[doc_id]["payload"]))
        assert rgb.shape == (doc_id % 17 + 2, doc_id % 31 + 2, 3)
        h = hashlib.sha256(text.encode()).digest()
        assert (rgb == np.frombuffer(h[:3], np.uint8)).all()


# --- WAV (RIFF/WAVE PCM16) -------------------------------------------------

def _reference_wav() -> tuple[bytes, np.ndarray, int]:
    """Hand-built 3-sample stereo PCM16 WAV from the RIFF spec (NOT via
    encode_wav)."""
    from vite_spark.text.codecs import is_wav  # noqa: F401  (import check)

    samples = np.array([[100, -100], [32767, -32768], [0, 5]], dtype=np.int16)
    data = samples.tobytes()                      # interleaved LE
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body, samples, 8000


def test_wav_decode_matches_spec_literal():
    from vite_spark.text.codecs import decode_wav

    payload, samples, sr = _reference_wav()
    s, rate = decode_wav(payload)
    assert rate == sr
    assert np.array_equal(s, samples)


def test_wav_roundtrip_mono_and_stereo():
    from vite_spark.text.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3):
        s = rng.integers(-32768, 32768, size=(37, ch)).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 44100))
        assert rate == 44100
        assert np.array_equal(out, s)
    mono = rng.integers(-32768, 32768, size=11).astype(np.int16)
    out, _ = decode_wav(encode_wav(mono, 8000))
    assert np.array_equal(out[:, 0], mono)


def test_wav_chunk_walk_skips_extra_chunks():
    """Decoder must walk past LIST/INFO-style chunks (incl. odd-size +
    pad byte) to find fmt/data wherever they are."""
    from vite_spark.text.codecs import decode_wav

    payload, samples, sr = _reference_wav()
    fmt_and_data = payload[12:]          # chunks only (RIFF/size/WAVE cut)
    junk = b"LIST" + struct.pack("<I", 5) + b"JUNK!" + b"\x00"  # odd + pad
    body = b"WAVE" + junk + fmt_and_data
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(rebuilt)
    assert rate == sr
    assert np.array_equal(s, samples)


def test_wav_rejects_non_pcm16():
    from vite_spark.text.codecs import decode_wav, encode_wav, is_wav

    good = encode_wav(np.zeros(4, np.int16), 8000)
    # flip audio_format to 3 (IEEE float) inside the fmt chunk
    bad = bytearray(good)
    bad[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="PCM 16-bit"):
        decode_wav(bytes(bad))
    assert not is_wav(b"RIFFxxxx")                # too short / not WAVE
    assert not is_wav(b"not audio at all" * 4)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"X" * 64)


def test_extract_audio_features_real_path_no_spark():
    """The real audio feature math, driven directly (no Spark): constant
    samples give mean = v/2^15, rms = |v|/2^15, duration = n/sr."""
    from vite_spark.text.codecs import encode_wav

    v, n, ch, sr = -12345, 50, 2, 8000
    payload = encode_wav(np.full((n, ch), v, np.int16), sr)
    # reproduce the extract_audio_features inner math
    from vite_spark.text.codecs import decode_wav

    s, rate = decode_wav(payload)
    x = s.astype(np.float64) / 32768.0
    assert rate == sr
    assert float(x.mean()) == v / 32768.0
    assert float(np.sqrt((x * x).mean())) == abs(v) / 32768.0
    assert s.shape == (n, ch)
    assert len(payload) == 44 + 2 * ch * n


# --- PPM (netpbm P6) --------------------------------------------------------

def test_ppm_decode_matches_spec_literal():
    """Hand-built P6 from the netpbm spec (NOT via encode_ppm): header
    comments, multi-whitespace token separators, raw top-down raster."""
    from vite_spark.text.codecs import decode_ppm

    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [9, 8, 7]]], dtype=np.uint8
    )
    payload = (b"P6 # magic then comment\n"
               b"  2\t# width\n"
               b"2\n# a full-line comment\n255\n" + rgb.tobytes())
    got = decode_ppm(payload)
    assert got.shape == (2, 2, 3)
    assert (got == rgb).all()


def test_ppm_roundtrip_arbitrary_sizes():
    from vite_spark.text.codecs import decode_ppm, encode_ppm, is_ppm

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 4), (17, 31), (13, 23)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_ppm(rgb)
        assert is_ppm(payload)
        # canonical header: exact byte-size contract the oracle recomputes
        assert len(payload) == 9 + len(str(w)) + len(str(h)) + 3 * w * h
        out = decode_ppm(payload)
        assert out.shape == (h, w, 3)
        assert (out == rgb).all()


def test_ppm_rejects_bad_payloads_loudly():
    from vite_spark.text.codecs import decode_ppm, encode_ppm, is_ppm

    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(12))      # greymap magic
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))    # 2-byte samples
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(np.zeros((4, 4, 3), np.uint8))[:-1])
    with pytest.raises(ValueError, match="non-numeric"):
        decode_ppm(b"P6\nab cd\n255\n" + bytes(12))
    assert not is_ppm(b"P6")                           # too short
    assert not is_ppm(b"P6x 2 2 255 ...")              # no ws after magic
    # text payload starting with 'P6 ': header parse fails loudly inside
    # decode, which _try_decode converts to the stub fallthrough
    with pytest.raises(ValueError):
        decode_ppm(b"P6 is a nice format, truly " * 4)


def test_ppm_real_path_on_spark(spark):
    """extract_features + resize_media take the REAL path for P6 payloads
    and re-encode resizes in the input format (PPM in -> PPM out)."""
    import pandas as pd

    from vite_spark.text.codecs import decode_ppm, encode_ppm
    from vite_spark.text.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_media,
    )

    rgb = np.zeros((3, 5, 3), np.uint8)
    rgb[..., 1] = 120   # constant green channel
    ppm = encode_ppm(rgb)
    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["image"],
            "payload": [ppm],
            "mime": ["image/x-portable-pixmap"],
            "meta_width": pd.array([None], dtype="Int64"),
            "meta_height": pd.array([None], dtype="Int64"),
            "meta_duration_s": pd.array([None], dtype="Float64"),
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    row = extract_features(media).collect()[0]      # fake=False: real path
    assert (row["width"], row["height"]) == (5, 3)
    assert row["n_bytes"] == len(ppm)
    assert row["features"][1] == round(120 / 255.0, 6)
    assert row["features"][0] == 0.0 and row["features"][2] == 0.0

    rrow = resize_media(media, 4, 2).collect()[0]
    out = bytes(rrow["payload"])
    assert out[:2] == b"P6"                         # format preserved
    assert decode_ppm(out).shape == (2, 4, 3)
    assert rrow["resized_sha"] == hashlib.sha256(out).hexdigest()


def test_ppm_media_from_docs_contract(spark):
    """Driver-fixture contract: dims/pixel formulas match what the DuckDB
    oracle recomputes (queries.SQL_MULTIMODAL_PPM)."""
    import pandas as pd

    from vite_spark.text.codecs import decode_ppm
    from vite_spark.text.multimodal import ppm_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 40], "text": ["alpha", "beta", "gamma"]})
    )
    out = {r["media_id"]: r for r in ppm_media_from_docs(docs).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (40, "gamma")]:
        rgb = decode_ppm(bytes(out[doc_id]["payload"]))
        assert rgb.shape == (doc_id % 13 + 1, doc_id % 23 + 1, 3)
        h = hashlib.sha256(text.encode()).digest()
        assert (rgb == np.frombuffer(h[3:6], np.uint8)).all()


# --- AVI (RIFF 'AVI ', raw-DIB frames) -----------------------------------


def _reference_avi_1f_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-built single-frame 2x2 raw-DIB AVI from the RIFF/VfW spec
    (NOT via encode_avi): avih + strl headers, one '00db' chunk with
    bottom-up BGR padded rows, keyframe idx1."""
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    pix = bytes(
        [0xFF, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00,   # bottom row BGR+pad
         0x00, 0x00, 0xFF, 0x00, 0xFF, 0x00, 0x00, 0x00]   # top row BGR+pad
    )
    avih = b"avih" + struct.pack(
        "<IIIIIIIIIII4I", 56, 200_000, len(pix) * 5, 0, 0x10, 1, 0, 1,
        len(pix), 2, 2, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack(
        "<I4s4sIHHIIIIIIiI4h", 56, b"vids", b"DIB ", 0, 0, 0, 0,
        1, 5, 0, 1, len(pix), -1, 0, 0, 0, 2, 2,
    )
    strf = b"strf" + struct.pack(
        "<IIiiHHIIiiII", 40, 40, 2, 2, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi = b"movi" + b"00db" + struct.pack("<I", len(pix)) + pix
    idx1 = b"idx1" + struct.pack("<I", 16) + b"00db" + struct.pack("<III", 0x10, 4, len(pix))
    body = hdrl + b"LIST" + struct.pack("<I", len(movi)) + movi + idx1
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body, rgb


def test_avi_decode_matches_spec_literal():
    from vite_spark.text.codecs import decode_avi, is_avi

    payload, expected = _reference_avi_1f_2x2()
    assert is_avi(payload)
    frames, fps = decode_avi(payload)
    assert frames.shape == (1, 2, 2, 3)
    assert (frames[0] == expected).all()
    assert fps == 5.0


def test_avi_roundtrip_arbitrary_sizes():
    from vite_spark.text.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(11)
    for n, h, w, fps in [(1, 1, 1, 25), (3, 5, 7, 5), (6, 11, 19, 30), (2, 4, 4, 1)]:
        f = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out, got_fps = decode_avi(encode_avi(f, fps))
        assert out.shape == f.shape
        assert (out == f).all()
        assert got_fps == float(fps)


def test_avi_encoded_size_formula():
    """The DuckDB oracle recomputes the exact byte size: 232-byte fixed
    RIFF scaffold + n*(8 + stride*h) movi chunks + 16n idx1 bytes
    (stride is 4-byte aligned, so frame chunks are never odd-sized)."""
    from vite_spark.text.codecs import encode_avi

    for n, h, w in [(1, 1, 1), (3, 5, 7), (6, 11, 19)]:
        f = np.zeros((n, h, w, 3), np.uint8)
        stride = (3 * w + 3) & ~3
        assert len(encode_avi(f, 5)) == 232 + n * (24 + stride * h)


def test_avi_chunk_walk_skips_unknown_chunks():
    from vite_spark.text.codecs import decode_avi, encode_avi

    f = np.full((2, 3, 3, 3), 9, np.uint8)
    payload = encode_avi(f, 10)
    # splice an unknown odd-sized chunk right after the hdrl LIST
    hdrl_end = payload.index(b"LIST", 12, 300)
    (hsz,) = struct.unpack_from("<I", payload, hdrl_end + 4)
    cut = hdrl_end + 8 + hsz
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde\x00"   # padded to even
    spliced = bytearray(payload[:cut] + junk + payload[cut:])
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    out, fps = decode_avi(bytes(spliced))
    assert (out == f).all() and fps == 10.0


def test_avi_rejects_unsupported_loudly():
    from vite_spark.text.codecs import decode_avi, encode_avi, is_avi

    assert not is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    assert not is_avi(None)
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"nonsense")
    payload = bytearray(encode_avi(np.zeros((1, 2, 2, 3), np.uint8), 5))
    # flip strf biBitCount (offset: find 'strf', +8 hdr, +14 into struct)
    off = payload.index(b"strf") + 8 + 14
    struct.pack_into("<H", payload, off, 8)
    with pytest.raises(ValueError, match="24-bit"):
        decode_avi(bytes(payload))
    # truncated frame chunk: cut past idx1 (24 bytes) into the 48-byte
    # frame body so the '00db' chunk is shorter than its declared size
    payload2 = encode_avi(np.zeros((1, 4, 4, 3), np.uint8), 5)
    with pytest.raises(ValueError, match="truncated AVI frame"):
        decode_avi(payload2[:-40])


def test_avi_media_and_sampler_contract(spark):
    """Driver-fixture contract end-to-end without the oracle: dims /
    frame-count / pixel formulas and the even-sampling rule match what
    the DuckDB oracle recomputes (queries.SQL_MULTIMODAL_AVI)."""
    import pandas as pd

    from vite_spark.text.multimodal import avi_media_from_docs, sample_avi_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 5, 17, 40], "text": ["a", "b", "c", "d"]})
    )
    media = avi_media_from_docs(docs, fps=5)
    rows = sample_avi_frames(media, max_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    for doc_id, text in [(0, "a"), (5, "b"), (17, "c"), (40, "d")]:
        nf = doc_id % 6 + 1
        ns = min(nf, 4)
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert len(got) == ns
        h = hashlib.sha256(text.encode()).digest()
        for j, r in enumerate(got):
            k = j * nf // ns
            assert r["frame_idx"] == k
            assert r["ts_s"] == k / 5
            assert (r["width"], r["height"]) == (doc_id % 19 + 2, doc_id % 11 + 2)
            assert r["n_frames"] == nf
            assert r["mean_r"] == round(h[6 + 3 * k] / 255.0, 6)
            assert r["mean_g"] == round(h[7 + 3 * k] / 255.0, 6)
            assert r["mean_b"] == round(h[8 + 3 * k] / 255.0, 6)


# --- PNG (8-bit truecolor, stdlib-zlib deflate) ---------------------------


def _reference_png_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-built 2x2 truecolor PNG from the W3C spec (NOT via
    encode_png): signature, IHDR, one IDAT whose zlib stream holds two
    filter-type-0 scanlines, IEND — CRCs computed per spec."""
    import zlib

    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    scan = bytes([0, 255, 0, 0, 0, 255, 0,      # row 0: filter None + RGB RGB
                  0, 0, 0, 255, 255, 255, 255])  # row 1
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(scan))
               + chunk(b"IEND", b""))
    return payload, rgb


def test_png_decode_matches_spec_literal():
    from vite_spark.text.codecs import decode_png, is_png

    payload, expected = _reference_png_2x2()
    assert is_png(payload)
    got = decode_png(payload)
    assert got.shape == (2, 2, 3)
    assert (got == expected).all()


def test_png_roundtrip_exercises_every_filter():
    """encode_png cycles filters row%5, so any >=5-row image covers all
    five reconstruction paths (None/Sub/Up/Average/Paeth); exact pixel
    equality after the zlib roundtrip pins each of them."""
    from vite_spark.text.codecs import decode_png, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 4), (17, 31), (8, 8), (6, 1), (1, 9)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_png(encode_png(rgb))
        assert out.shape == (h, w, 3)
        assert (out == rgb).all()
    # gradient content puts nontrivial deltas through Sub/Average/Paeth
    g = (np.arange(9 * 13 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8)
    rgb = g.reshape(9, 13, 3)
    assert (decode_png(encode_png(rgb)) == rgb).all()


def test_png_each_filter_type_decodes():
    """Single-filter streams built by hand (not via encode_png): every
    scanline of one image carries the same filter type, so a bug in any
    one reconstruction path fails its own case."""
    import zlib

    from vite_spark.text.codecs import decode_png

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    rows = rgb.reshape(4, 15).astype(np.int32)
    zero = np.zeros(15, dtype=np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    for ft in range(5):
        out = bytearray()
        for r in range(4):
            cur = rows[r]
            prev = rows[r - 1] if r else zero
            left = np.concatenate([zero[:3], cur[:-3]])
            upleft = np.concatenate([zero[:3], prev[:-3]])
            filt = [cur, cur - left, cur - prev, cur - (left + prev) // 2,
                    cur - paeth(left, prev, upleft)][ft]
            out.append(ft)
            out += (filt % 256).astype(np.uint8).tobytes()
        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(bytes(out)))
                   + chunk(b"IEND", b""))
        assert (decode_png(payload) == rgb).all(), f"filter {ft}"


def test_png_rejects_bad_payloads_loudly():
    import zlib

    from vite_spark.text.codecs import decode_png, encode_png, is_png

    good = encode_png(np.full((3, 4, 3), 9, np.uint8))
    assert not is_png(b"\x89PNG\r\n\x1a\nxx")          # shorter than IHDR
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all, just text bytes.....")
    # corrupt IDAT byte -> CRC failure
    bad = bytearray(good)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth rejected
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    p16 = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(7)))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit-depth"):
        decode_png(p16)
    # deflate stream of the wrong decompressed length
    pshort = (b"\x89PNG\r\n\x1a\n"
              + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
              + chunk(b"IDAT", zlib.compress(bytes(5)))
              + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="expected"):
        decode_png(pshort)
    # missing IEND
    noend = good[: good.rindex(b"IEND") - 4]
    with pytest.raises(ValueError, match="missing"):
        decode_png(noend)


def test_png_real_path_on_spark(spark):
    """extract_features + resize_media take the REAL path for PNG
    payloads and re-encode resizes in the input format (PNG in -> PNG
    out): the whole inflate -> unfilter -> resample -> refilter ->
    deflate pipeline, no fake branch."""
    import pandas as pd

    from vite_spark.text.codecs import decode_png, encode_png
    from vite_spark.text.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_media,
    )

    rgb = np.zeros((6, 5, 3), np.uint8)
    rgb[..., 2] = 200   # constant blue channel
    png = encode_png(rgb)
    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["image"],
            "payload": [png],
            "mime": ["image/png"],
            "meta_width": pd.array([None], dtype="Int64"),
            "meta_height": pd.array([None], dtype="Int64"),
            "meta_duration_s": pd.array([None], dtype="Float64"),
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    row = extract_features(media).collect()[0]      # fake=False: real path
    assert (row["width"], row["height"]) == (5, 6)
    assert row["n_bytes"] == len(png)
    assert row["features"][2] == round(200 / 255.0, 6)
    assert row["features"][0] == 0.0 and row["features"][1] == 0.0

    rrow = resize_media(media, 4, 2).collect()[0]
    out = bytes(rrow["payload"])
    assert out[:8] == b"\x89PNG\r\n\x1a\n"           # format preserved
    assert decode_png(out).shape == (2, 4, 3)
    assert rrow["resized_sha"] == hashlib.sha256(out).hexdigest()


def test_png_media_from_docs_contract(spark):
    """Driver-fixture contract: dims/pixel formulas match what the DuckDB
    oracle recomputes (queries.SQL_MULTIMODAL_PNG)."""
    import pandas as pd

    from vite_spark.text.codecs import decode_png
    from vite_spark.text.multimodal import png_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    out = {r["media_id"]: r for r in png_media_from_docs(docs).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        rgb = decode_png(bytes(out[doc_id]["payload"]))
        assert rgb.shape == (doc_id % 15 + 1, doc_id % 27 + 1, 3)
        h = hashlib.sha256(text.encode()).digest()
        assert (rgb == np.frombuffer(h[12:15], np.uint8)).all()


# --- GIF (GIF87a/89a, variable-width LZW) ---------------------------------


def _reference_gif_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-built 2x2 GIF89a from the spec (NOT via encode_gif): 4-color
    global table, LZW min code size 2 — the bitstream below is packed by
    hand: CLEAR(4) px0(0) px1(1) px2(2) at 3-bit width, then — after the
    decoder's table reaches 2^3 entries — px3(3) END(5) at 4-bit width,
    LSB-first."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]], np.uint8
    )
    rgb = palette[np.array([[0, 1], [2, 3]])]
    # codes/widths: 4@3 0@3 1@3 2@3 3@4 5@4; bits LSB-first per code:
    # 001 000 100 010 1100 1010 -> bytes 0x44, 0x34, 0x05
    lzw = bytes([0x44, 0x34, 0x05])
    payload = (b"GIF89a"
               + struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)   # GCT, 4 entries
               + palette.tobytes()
               + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
               + bytes([2])                                    # min code size
               + bytes([len(lzw)]) + lzw + b"\x00\x3b")
    return payload, rgb


def test_gif_decode_matches_spec_literal():
    from vite_spark.text.codecs import decode_gif, is_gif

    payload, expected = _reference_gif_2x2()
    assert is_gif(payload)
    got = decode_gif(payload)
    assert got.shape == (2, 2, 3)
    assert (got == expected).all()


def test_gif_roundtrip_palette_growth_and_interlace():
    """Roundtrips across palette sizes, both row orders, and content
    repetitive enough to drive the LZW table through width growth — the
    encoder-widens-one-add-late / decoder-widens-at-2^width pairing is
    wrong by exactly one code if mis-implemented, which scrambles every
    pixel after the first bump."""
    from vite_spark.text.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(13)
    for h, w, ncol in [(1, 1, 1), (2, 3, 4), (5, 4, 16), (17, 31, 250),
                       (8, 8, 2), (6, 1, 3), (1, 9, 5)]:
        pal = np.unique(rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
        rgb = pal[rng.integers(0, len(pal), (h, w))]
        for interlace in (False, True):
            out = decode_gif(encode_gif(rgb, interlace=interlace))
            assert out.shape == rgb.shape
            assert (out == rgb).all(), (h, w, ncol, interlace)
    # 60k pixels of 256 colors: table hits the 4096 cap -> encoder CLEARs
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    rgb = pal[rng.integers(0, len(pal), (200, 300))]
    assert (decode_gif(encode_gif(rgb)) == rgb).all()


def test_gif_rejects_bad_payloads_loudly():
    from vite_spark.text.codecs import decode_gif, encode_gif, is_gif

    good = encode_gif(np.full((3, 4, 3), 7, np.uint8))
    assert not is_gif(b"GIF89a")                      # header alone too short
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"plain text that is certainly not a gif")
    with pytest.raises(ValueError, match="256 distinct"):
        i = np.arange(17 * 17, dtype=np.int64)
        many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1)
        encode_gif(many.astype(np.uint8).reshape(17, 17, 3))  # 289 colors
    # truncated LZW stream: cut deep into a long data sub-block
    rng = np.random.default_rng(2)
    pal = np.unique(rng.integers(0, 256, (64, 3), dtype=np.uint8), axis=0)
    big = encode_gif(pal[rng.integers(0, len(pal), (40, 40))])
    with pytest.raises(ValueError, match="truncated|ended"):
        decode_gif(big[: len(big) // 2])
    # no image descriptor: header + trailer only
    hdr_only = good[:13 + 3 * 2] + b"\x3b"
    with pytest.raises(ValueError, match="no image"):
        decode_gif(hdr_only)


def test_gif_decodes_external_reference_bytes():
    """The canonical public 1x1 GIF (as emitted by standard real-world
    encoders, complete with a graphic-control extension block) decodes —
    independent evidence the LZW width rules match what actual GIF
    writers produce, not just this repo's own encoder."""
    import base64

    from vite_spark.text.codecs import decode_gif

    payload = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    out = decode_gif(payload)
    assert out.shape == (1, 1, 3)
    assert (out == np.zeros((1, 1, 3), np.uint8)).all()


def test_gif_real_path_on_spark(spark):
    """extract_features + resize_media take the REAL path for GIF
    payloads and re-encode resizes in the input format (GIF in -> GIF
    out): LZW decode -> palette indirection -> resample -> palette
    rebuild -> LZW encode, no fake branch."""
    import pandas as pd

    from vite_spark.text.codecs import decode_gif, encode_gif
    from vite_spark.text.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_media,
    )

    rgb = np.zeros((6, 5, 3), np.uint8)
    rgb[..., 0] = 180   # constant red channel
    gif = encode_gif(rgb)
    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["image"],
            "payload": [gif],
            "mime": ["image/gif"],
            "meta_width": pd.array([None], dtype="Int64"),
            "meta_height": pd.array([None], dtype="Int64"),
            "meta_duration_s": pd.array([None], dtype="Float64"),
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    row = extract_features(media).collect()[0]      # fake=False: real path
    assert (row["width"], row["height"]) == (5, 6)
    assert row["n_bytes"] == len(gif)
    assert row["features"][0] == round(180 / 255.0, 6)
    assert row["features"][1] == 0.0 and row["features"][2] == 0.0

    rrow = resize_media(media, 4, 2).collect()[0]
    out = bytes(rrow["payload"])
    assert out[:6] == b"GIF89a"                     # format preserved
    assert decode_gif(out).shape == (2, 4, 3)
    assert rrow["resized_sha"] == hashlib.sha256(out).hexdigest()


def test_gif_media_from_docs_contract(spark):
    """Driver-fixture contract: dims/pixel formulas match what the DuckDB
    oracle recomputes (queries.SQL_MULTIMODAL_GIF)."""
    import pandas as pd

    from vite_spark.text.codecs import decode_gif
    from vite_spark.text.multimodal import gif_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    out = {r["media_id"]: r for r in gif_media_from_docs(docs).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        rgb = decode_gif(bytes(out[doc_id]["payload"]))
        assert rgb.shape == (doc_id % 9 + 1, doc_id % 21 + 1, 3)
        h = hashlib.sha256(text.encode()).digest()
        assert (rgb == np.frombuffer(h[15:18], np.uint8)).all()


# --- JPEG (baseline JFIF, T.81 sequential DCT) -----------------------------

_IMGDATA = ("/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
            "python3.11/test/imghdrdata")


def test_jpeg_constant_roundtrips_exactly():
    """Under all-ones quantization a constant block's DCT is a lone
    integer DC coefficient, so gray AND RGB constants survive the whole
    Huffman → dequant → IDCT pipeline bit-exactly — the property the
    driver-oracle fixture (jpeg_media_from_docs) relies on."""
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg, is_jpeg

    for shape, val in [((5, 7), 143), ((16, 16), 0), ((9, 3), 255), ((1, 1), 77)]:
        g = np.full(shape, val, np.uint8)
        payload = encode_jpeg(g)
        assert is_jpeg(payload)
        out = decode_jpeg(payload)
        assert out.shape == shape + (3,)
        assert (out == val).all()
    rgb = np.zeros((10, 13, 3), np.uint8)
    rgb[...] = (200, 100, 50)
    assert (decode_jpeg(encode_jpeg(rgb)) == rgb).all()


def test_jpeg_random_content_bounded_error():
    """q=1 keeps every quantized coefficient: the only loss is DCT float
    rounding (±1 gray) plus the YCbCr integer roundtrip (±3 color) —
    tight bounds that fail loudly on any Huffman/zigzag/IDCT bug, whose
    signature is full-scale garbage, not off-by-a-few."""
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2
    assert (out[:, :, 0] == out[:, :, 1]).all()       # gray replicates
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4
    # a real (non-trivial) quant table still yields a recognizable image
    quant = np.clip(np.arange(64).reshape(8, 8) + 4, 1, 255)
    out = decode_jpeg(encode_jpeg(g, quant=quant))
    assert np.abs(out[:, :, 0].astype(float) - g.astype(float)).mean() < 40


def test_jpeg_rejects_unsupported_loudly():
    import struct as st

    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg, is_jpeg

    assert not is_jpeg(b"\xff\xd8ab")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"definitely not a jpeg payload here")
    good = encode_jpeg(np.full((9, 9), 50, np.uint8))
    # flip SOF0 -> SOF2: the baseline single scan (Ss=0, Se=63) is an
    # ILLEGAL progressive scan header and must be rejected, not decoded
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(bad))
    # arithmetic coding (SOF9) is a different codec, still rejected
    bad[i + 1] = 0xC9
    with pytest.raises(ValueError, match="coding process"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:-12])
    with pytest.raises(ValueError, match="quant table"):
        encode_jpeg(np.zeros((4, 4), np.uint8), quant=np.zeros((8, 8), int))


def test_jpeg_progressive_bit_identical_to_baseline():
    """The progressive encoder emits the SAME quantized coefficients as
    the baseline encoder (successive approximation is lossless once all
    refinement scans land), so decode(progressive) must equal
    decode(baseline) BIT-FOR-BIT — any bug in spectral selection,
    EOB-run accounting, DC/AC refinement, or correction-bit ordering
    breaks the equality. The baseline side is itself validated against a
    real-world encoder file (test below), which anchors this parity to
    independent bytes."""
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg, is_jpeg

    rng = np.random.default_rng(7)
    for shape in [(5, 7), (16, 16), (1, 1), (24, 17), (31, 33)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        prog = encode_jpeg(g, progressive=True)
        assert is_jpeg(prog) and b"\xff\xc2" in prog
        assert (decode_jpeg(prog) == decode_jpeg(encode_jpeg(g))).all()
    for shape in [(16, 16, 3), (10, 13, 3), (7, 29, 3)]:
        rgb = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(rgb, progressive=True))
                == decode_jpeg(encode_jpeg(rgb))).all()
    # non-trivial quant table: refinement scans see real multi-bit values
    quant = np.clip(np.arange(64).reshape(8, 8) + 4, 1, 255)
    g = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(g, quant=quant, progressive=True))
            == decode_jpeg(encode_jpeg(g, quant=quant))).all()


def test_jpeg_progressive_eob_runs_and_correction_bits():
    """Sparse images: most blocks are empty in every AC band, so EOB
    runs span many blocks (EOBn codes with extension bits) and the
    refinement scans must buffer correction bits across the run exactly
    as the decoder interleaves them — the hardest part of Annex G."""
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    coarse = np.clip((np.arange(64).reshape(8, 8) % 13) + 2, 1, 255)
    for n_hot in [0, 1, 3, 17, 80, 500]:
        g = np.full((64, 96), 128, np.uint8)
        ys = rng.integers(0, 64, n_hot)
        xs = rng.integers(0, 96, n_hot)
        g[ys, xs] = rng.integers(0, 256, n_hot)
        for quant in (None, coarse):
            assert (decode_jpeg(encode_jpeg(g, quant=quant, progressive=True))
                    == decode_jpeg(encode_jpeg(g, quant=quant))).all()


def test_jpeg_progressive_constant_roundtrips_exactly():
    """Constant blocks are DC-only integers under all-ones quantization;
    the DC-first (Al=1) + DC-refinement scan pair must reassemble them
    exactly, as the baseline path does."""
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg

    for val in (0, 77, 143, 255):
        g = np.full((9, 11), val, np.uint8)
        out = decode_jpeg(encode_jpeg(g, progressive=True))
        assert out.shape == (9, 11, 3) and (out == val).all()


def test_jpeg_progressive_rejects_malformed():
    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.full((9, 9), 50, np.uint8), progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-40])              # truncated mid-scan


_LIBJPEG_CHILD = r'''
import ctypes, numpy as np
lj = ctypes.CDLL("libjpeg.so.62")
lj.jpeg_std_error.restype = ctypes.c_void_p


_keepalive = []


def new_cinfo(decomp):
    # opaque ABI buffers: struct sizes 520/632 are what this library
    # prints for the 62 ABI on LP64; err pointer sits at offset 0 and
    # must stay alive for the cinfo's whole lifetime
    err = ctypes.create_string_buffer(1024)
    _keepalive.append(err)
    e = lj.jpeg_std_error(err)
    ci = ctypes.create_string_buffer(4096)
    _keepalive.append(ci)
    ctypes.memmove(ci, ctypes.c_void_p(e).value.to_bytes(8, "little"), 8)
    if decomp:
        lj.jpeg_CreateDecompress(ci, 62, 632)
    else:
        lj.jpeg_CreateCompress(ci, 62, 520)
    return ci


def enc(img, progressive, path):
    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else 3
    ci = new_cinfo(False)
    outbuf = ctypes.c_void_p()
    outsize = ctypes.c_ulong()
    lj.jpeg_mem_dest(ci, ctypes.byref(outbuf), ctypes.byref(outsize))
    # 62-ABI LP64 offsets: image_width 48, image_height 52,
    # input_components 56, in_color_space 60
    base = ctypes.addressof(ci)
    ctypes.memmove(base + 48, int(w).to_bytes(4, "little"), 4)
    ctypes.memmove(base + 52, int(h).to_bytes(4, "little"), 4)
    ctypes.memmove(base + 56, int(nc).to_bytes(4, "little"), 4)
    ctypes.memmove(base + 60, int(1 if nc == 1 else 2).to_bytes(4, "little"), 4)
    lj.jpeg_set_defaults(ci)
    lj.jpeg_set_quality(ci, 90, 1)
    if progressive:
        lj.jpeg_simple_progression(ci)
    lj.jpeg_start_compress(ci, 1)
    row = np.ascontiguousarray(img.reshape(h, w * nc))
    for r in range(h):
        rp = (ctypes.c_void_p * 1)(row.ctypes.data + r * w * nc)
        assert lj.jpeg_write_scanlines(ci, rp, 1) == 1
    lj.jpeg_finish_compress(ci)
    data = ctypes.string_at(outbuf, outsize.value)
    lj.jpeg_destroy_compress(ci)
    open(path, "wb").write(data)


def dec(path, h, w, nc):
    data = open(path, "rb").read()
    ci = new_cinfo(True)
    buf = ctypes.create_string_buffer(data, len(data))
    lj.jpeg_mem_src(ci, buf, len(data))
    assert lj.jpeg_read_header(ci, 1) == 1
    lj.jpeg_start_decompress(ci)
    out = np.zeros((h, w * nc), np.uint8)
    for r in range(h):
        rp = (ctypes.c_void_p * 1)(out.ctypes.data + r * w * nc)
        assert lj.jpeg_read_scanlines(ci, rp, 1) == 1
    lj.jpeg_finish_decompress(ci)
    lj.jpeg_destroy_decompress(ci)
    return out.reshape(h, w, nc)


D = "/tmp/vite_libjpeg_x"
gray = np.load(D + "/gray.npy")
rgb = np.load(D + "/rgb.npy")
enc(gray, False, D + "/lib_gray_base.jpg")
enc(gray, True, D + "/lib_gray_prog.jpg")
enc(rgb, False, D + "/lib_rgb_base.jpg")
enc(rgb, True, D + "/lib_rgb_prog.jpg")
np.save(D + "/lib_dec_gray_prog.npy",
        dec(D + "/lib_gray_prog.jpg", *gray.shape, 1))
h, w = gray.shape
np.save(D + "/lib_dec_mine_gray_base.npy", dec(D + "/mine_gray_base.jpg", h, w, 1))
np.save(D + "/lib_dec_mine_gray_prog.npy", dec(D + "/mine_gray_prog.jpg", h, w, 1))
h, w = rgb.shape[:2]
np.save(D + "/lib_dec_mine_rgb_base.npy", dec(D + "/mine_rgb_base.jpg", h, w, 3))
np.save(D + "/lib_dec_mine_rgb_prog.npy", dec(D + "/mine_rgb_prog.jpg", h, w, 3))
print("CHILD_OK")
'''


def _has_libjpeg():
    import ctypes
    try:
        ctypes.CDLL("libjpeg.so.62")
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _has_libjpeg(), reason="system libjpeg not present")
def test_jpeg_progressive_cross_validates_against_libjpeg():
    """The decisive progressive check, against the REFERENCE codec: the
    system libjpeg (driven via ctypes in a subprocess — its error path
    calls exit()) encodes the same images baseline AND progressive with
    jpeg_simple_progression (the canonical multi-scan script with
    successive approximation, optimized Huffman, and 4:2:0 chroma
    subsampling for color). Same source + same quant tables → identical
    coefficients, so THIS decoder must produce bit-identical pixels for
    the two real streams — covering subsampled progressive scans this
    repo's 4:4:4 encoder cannot emit. The reverse direction has libjpeg
    decode THIS repo's baseline and progressive encodings: the reference
    decoder must also see identical pixels. Gray output is additionally
    within IDCT-precision (±2) of libjpeg's own decode."""
    import shutil
    import subprocess
    import sys

    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg

    d = "/tmp/vite_libjpeg_x"
    shutil.rmtree(d, ignore_errors=True)
    __import__("os").makedirs(d)
    rng = np.random.default_rng(42)
    gray = rng.integers(0, 256, (41, 57), dtype=np.uint8)
    rgb = rng.integers(0, 256, (32, 45, 3), dtype=np.uint8)
    np.save(f"{d}/gray.npy", gray)
    np.save(f"{d}/rgb.npy", rgb)
    open(f"{d}/mine_gray_base.jpg", "wb").write(encode_jpeg(gray))
    open(f"{d}/mine_gray_prog.jpg", "wb").write(
        encode_jpeg(gray, progressive=True))
    open(f"{d}/mine_rgb_base.jpg", "wb").write(encode_jpeg(rgb))
    open(f"{d}/mine_rgb_prog.jpg", "wb").write(
        encode_jpeg(rgb, progressive=True))
    r = subprocess.run([sys.executable, "-c", _LIBJPEG_CHILD],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "CHILD_OK" in r.stdout, r.stderr[:500]

    # my decoder, real libjpeg streams: baseline == progressive exactly
    for name in ("gray", "rgb"):
        b = decode_jpeg(open(f"{d}/lib_{name}_base.jpg", "rb").read())
        p = decode_jpeg(open(f"{d}/lib_{name}_prog.jpg", "rb").read())
        assert b.shape == p.shape and (b == p).all(), name
    # tolerance vs the reference decoder itself (gray: no upsampling)
    mine = decode_jpeg(open(f"{d}/lib_gray_prog.jpg", "rb").read())[:, :, 0]
    ref = np.load(f"{d}/lib_dec_gray_prog.npy")[:, :, 0]
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 2
    # reference decoder, my streams: baseline == progressive exactly
    for name in ("gray", "rgb"):
        a = np.load(f"{d}/lib_dec_mine_{name}_base.npy")
        b = np.load(f"{d}/lib_dec_mine_{name}_prog.npy")
        assert (a == b).all(), name
    # and my q=1 gray stream roundtrips through libjpeg within DCT noise
    a = np.load(f"{d}/lib_dec_mine_gray_base.npy")[:, :, 0]
    assert np.abs(a.astype(int) - gray.astype(int)).max() <= 2


@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_jpeg_decodes_real_world_file_against_ppm_truth():
    """python.jpg (written by a real JPEG encoder: Annex-K Huffman
    tables, 4:2:0 chroma subsampling) decodes to within JPEG loss of the
    LOSSLESS python.ppm ground truth read by this repo's independent P6
    parser — marker walk, real Huffman tables, subsampled-MCU layout and
    upsampling all validated against bytes this repo did not produce."""
    from vite_spark.text.codecs import decode_ppm
    from vite_spark.text.jpeg import decode_jpeg

    jpg = decode_jpeg(open(f"{_IMGDATA}/python.jpg", "rb").read())
    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert jpg.shape == ppm.shape == (16, 16, 3)
    err = np.abs(jpg.astype(int) - ppm.astype(int))
    assert err.mean() < 15                  # JPEG loss, not decoder garbage
    # per-channel global means stay within chroma-DC quantization reach
    # (step ~17 at this file's quality), far from the ~85 a channel swap
    # or IDCT bug produces
    assert np.abs(jpg.mean(axis=(0, 1)) - ppm.mean(axis=(0, 1))).max() < 10


@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_png_palette_decodes_real_world_file_exactly():
    """python.png (palette color type 3, written by a real PNG encoder)
    decodes PIXEL-EXACTLY equal to the python.ppm ground truth — inflate,
    unfilter, and PLTE indirection validated against independent bytes."""
    from vite_spark.text.codecs import decode_png, decode_ppm

    png = decode_png(open(f"{_IMGDATA}/python.png", "rb").read())
    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert (png == ppm).all()


@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_gif_decodes_real_world_file():
    """python.gif (real-world encoder, 64-color palette, LZW width growth
    through 7→8 bits) decodes; its residual vs the PPM truth is the
    file's own palette quantization, bounded and small on average."""
    from vite_spark.text.codecs import decode_gif, decode_ppm

    gif = decode_gif(open(f"{_IMGDATA}/python.gif", "rb").read())
    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert gif.shape == (16, 16, 3)
    assert np.abs(gif.astype(int) - ppm.astype(int)).mean() < 10


def test_png_color_types_gray_palette_rgba():
    """Hand-built color-type-0/3/6 PNGs (NOT via encode_png, which only
    writes type 2) decode through the shared unfilter at each byte-per-
    pixel width."""
    import zlib

    from vite_spark.text.codecs import decode_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    # grayscale (type 0), one Sub-filtered row: raw deltas of 10 each
    scan = bytes([1, 50, 10, 10, 10])
    p = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    out = decode_png(p)
    assert (out[0, :, 0] == [50, 60, 70, 80]).all()
    assert (out[:, :, 0] == out[:, :, 1]).all()
    # palette (type 3): 2 indices through a 3-entry PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = bytes([0, 2, 0])
    p = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
         + chunk(b"PLTE", plte)
         + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    out = decode_png(p)
    assert (out[0, 0] == [0, 0, 255]).all() and (out[0, 1] == [255, 0, 0]).all()
    # palette index beyond PLTE rejected
    scan_bad = bytes([0, 7, 0])
    p_bad = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
             + chunk(b"PLTE", plte)
             + chunk(b"IDAT", zlib.compress(scan_bad)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(p_bad)
    # RGBA (type 6): alpha dropped, Up filter at bpp=4
    row0 = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])
    row1 = bytes([2, 1, 1, 1, 0, 1, 1, 1, 0])
    p = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(row0 + row1)) + chunk(b"IEND", b""))
    out = decode_png(p)
    assert (out[1, 0] == [11, 21, 31]).all() and (out[1, 1] == [41, 51, 61]).all()


def test_jpeg_real_path_on_spark(spark):
    """extract_features + resize_media take the REAL path for JPEG
    payloads and re-encode resizes in the input format."""
    import pandas as pd

    from vite_spark.text.jpeg import decode_jpeg, encode_jpeg
    from vite_spark.text.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_media,
    )

    g = np.full((6, 5), 210, np.uint8)
    jpg = encode_jpeg(g)
    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["image"],
            "payload": [jpg],
            "mime": ["image/jpeg"],
            "meta_width": pd.array([None], dtype="Int64"),
            "meta_height": pd.array([None], dtype="Int64"),
            "meta_duration_s": pd.array([None], dtype="Float64"),
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    row = extract_features(media).collect()[0]      # fake=False: real path
    assert (row["width"], row["height"]) == (5, 6)
    assert row["n_bytes"] == len(jpg)
    assert row["features"][0] == round(210 / 255.0, 6)

    rrow = resize_media(media, 4, 2).collect()[0]
    out = bytes(rrow["payload"])
    assert out[:2] == b"\xff\xd8"                   # format preserved
    assert decode_jpeg(out).shape == (2, 4, 3)
    assert rrow["resized_sha"] == hashlib.sha256(out).hexdigest()


def test_jpeg_media_from_docs_contract(spark):
    """Driver-fixture contract: dims/gray formulas match what the DuckDB
    oracle recomputes (queries.SQL_MULTIMODAL_JPEG)."""
    import pandas as pd

    from vite_spark.text.jpeg import decode_jpeg
    from vite_spark.text.multimodal import jpeg_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    out = {r["media_id"]: r for r in jpeg_media_from_docs(docs).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        rgb = decode_jpeg(bytes(out[doc_id]["payload"]))
        assert rgb.shape == (doc_id % 7 + 1, doc_id % 25 + 1, 3)
        h = hashlib.sha256(text.encode()).digest()
        assert (rgb == h[18]).all()


# --- Motion JPEG AVI (compressed video) -------------------------------------


def test_avi_mjpeg_roundtrip_and_rejections():
    """codec='mjpeg' packs one baseline JPEG per '00dc' chunk: constant-
    gray frames roundtrip exactly, arbitrary frames within JPEG q=1
    bounds, dims cross-checked between strf header and every frame."""
    from vite_spark.text.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(9)
    g = np.repeat(
        rng.integers(0, 256, (4, 1, 1, 1), dtype=np.uint8), 6, axis=1
    ).repeat(9, axis=2).repeat(3, axis=3)          # constant-gray frames
    out, fps = decode_avi(encode_avi(g, 5, codec="mjpeg"))
    assert fps == 5 and (out == g).all()
    f = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    out, _ = decode_avi(encode_avi(f, 5, codec="mjpeg"))
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 4
    with pytest.raises(ValueError, match="unknown AVI codec"):
        encode_avi(f, 5, codec="h264")
    # DIB output is byte-identical to the pre-MJPEG encoder (same header
    # fields: bufsize == frame size when all frames are raw)
    d = encode_avi(f, 5)
    assert decode_avi(d)[0].shape == f.shape


def test_mjpeg_media_and_sampler_contract(spark):
    """Driver-fixture contract end-to-end: dims / frame-count / gray
    formulas and the sampling rule match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_MJPEG)."""
    import pandas as pd

    from vite_spark.text.multimodal import mjpeg_media_from_docs, sample_avi_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 5, 17, 43], "text": ["a", "b", "c", "d"]})
    )
    media = mjpeg_media_from_docs(docs, fps=4)
    rows = sample_avi_frames(media, max_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    for doc_id, text in [(0, "a"), (5, "b"), (17, "c"), (43, "d")]:
        nf = doc_id % 5 + 1
        ns = min(nf, 4)
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert len(got) == ns
        h = hashlib.sha256(text.encode()).digest()
        for j, r in enumerate(got):
            k = j * nf // ns
            assert r["frame_idx"] == k
            assert r["ts_s"] == k / 4
            assert (r["width"], r["height"]) == (doc_id % 14 + 2, doc_id % 10 + 2)
            assert r["n_frames"] == nf
            expect = round(h[19 + k] / 255.0, 6)
            assert r["mean_r"] == expect == r["mean_g"] == r["mean_b"]


# --- TIFF (baseline 8-bit; none / PackBits / LZW; TIFF6 spec) ---------------

_LIBTIFF = None


def _libtiff():
    """ctypes handle to the system libtiff (reference implementation), or
    None when absent — the strongest independent authority available for
    the compressed paths."""
    global _LIBTIFF
    if _LIBTIFF is None:
        import ctypes
        try:
            lt = ctypes.CDLL("libtiff.so.6")
        except OSError:
            _LIBTIFF = False
            return None
        lt.TIFFOpen.restype = ctypes.c_void_p
        lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lt.TIFFReadScanline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16]
        lt.TIFFWriteScanline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16]
        lt.TIFFClose.argtypes = [ctypes.c_void_p]
        _LIBTIFF = lt
    return _LIBTIFF or None


def test_tiff_roundtrip_all_modes():
    from vite_spark.text.codecs import decode_tiff, encode_tiff, is_tiff

    rng = np.random.default_rng(2)
    runs = np.zeros((40, 50, 3), np.uint8)
    runs[15:25] = 200
    for comp in ("none", "packbits", "lzw"):
        for x in (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                  runs,
                  rng.integers(0, 256, (1, 1, 3), dtype=np.uint8)):
            p = encode_tiff(x, comp, rows_per_strip=7)
            assert is_tiff(p)
            assert (decode_tiff(p) == x).all()
        g = rng.integers(0, 256, (12, 17), dtype=np.uint8)
        out = decode_tiff(encode_tiff(g, comp))
        assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()
    # predictor 2 (LZW only) + a stream long enough to cross 9->10->11->12
    # bit code widths and force a table clear at 4094
    big = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(big, "lzw")) == big).all()
    assert (decode_tiff(encode_tiff(big, "lzw", predictor=2)) == big).all()


def test_tiff_lzw_matches_spec_worked_example():
    """TIFF6's own LZW example: input bytes 7,7,7,8,8,7,7,6,6 must code
    as [Clear,7,258,8,8,258,6,6,EOI] at 9 bits MSB-first — pins initial
    width, phrase growth, and bit packing against published numbers."""
    from vite_spark.text.codecs import _tiff_lzw_decode, _tiff_lzw_encode

    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    bits = []
    for c in codes:
        bits += [(c >> i) & 1 for i in range(8, -1, -1)]
    bits += [0] * ((-len(bits)) % 8)
    spec = np.packbits(np.array(bits, np.uint8)).tobytes()
    assert _tiff_lzw_encode(bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])) == spec
    assert list(_tiff_lzw_decode(spec)) == [7, 7, 7, 8, 8, 7, 7, 6, 6]


def test_tiff_gray_palette_and_big_endian_decode():
    """Hand-built files (NOT via this repo's encoder): a big-endian (MM)
    gray photometric-1 image, a photometric-0 inverted gray, and a
    palette image through the 16-bit colormap high byte."""
    from vite_spark.text.codecs import decode_tiff

    def build(bo, photo, data, extra_tags=(), w=3, h=2):
        entries = [(256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, 1, [8]),
                   (259, 3, 1, [1]), (262, 3, 1, [photo]),
                   (277, 3, 1, [1]), (278, 3, 1, [h]),
                   (279, 4, 1, [len(data)])] + list(extra_tags)
        ifd_size = 2 + 12 * (len(entries) + 1) + 4
        data_off = 8 + ifd_size
        entries.append((273, 4, 1, [data_off]))
        entries.sort()
        ext = b""
        ext_off = data_off + len(data)
        body = b""
        fmt = {3: "H", 4: "I"}
        for tag, typ, cnt, vals in entries:
            packed = struct.pack(bo + str(cnt) + fmt[typ], *vals)
            if len(packed) <= 4:
                raw = packed + b"\x00" * (4 - len(packed))
            else:
                raw = struct.pack(bo + "I", ext_off + len(ext))
                ext_local = packed
                ext += ext_local
            body += struct.pack(bo + "HHI", tag, typ, cnt) + raw
        head = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
        return (head + struct.pack(bo + "H", len(entries)) + body
                + b"\x00\x00\x00\x00" + data + ext)

    gray = bytes([0, 128, 255, 10, 20, 30])
    out = decode_tiff(build(">", 1, gray))                 # big-endian MM
    assert out.shape == (2, 3, 3)
    assert out[:, :, 0].ravel().tolist() == list(gray)
    assert (out[:, :, 0] == out[:, :, 2]).all()
    inv = decode_tiff(build("<", 0, gray))                 # white-is-zero
    assert inv[:, :, 0].ravel().tolist() == [255 - v for v in gray]
    cm = list(range(0, 256 * 256, 256)) * 3                # identity map
    pal = decode_tiff(build("<", 3, gray,
                            extra_tags=[(320, 3, 768, cm)]))
    assert pal[:, :, 1].ravel().tolist() == list(gray)


@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_tiff_decodes_real_world_file_exactly():
    """python.tiff (written by a real TIFF encoder: RGBA, extra alpha
    sample, uncompressed strips) decodes PIXEL-EXACTLY equal to the
    lossless python.ppm ground truth."""
    from vite_spark.text.codecs import decode_ppm, decode_tiff

    tif = decode_tiff(open(f"{_IMGDATA}/python.tiff", "rb").read())
    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert tif.shape == ppm.shape == (16, 16, 3)
    assert (tif == ppm).all()


@pytest.mark.skipif(_libtiff() is None, reason="system libtiff not present")
def test_tiff_cross_validates_against_libtiff_both_directions():
    """The decisive compressed-format check: files written by the SYSTEM
    libtiff (none/PackBits/LZW/LZW+predictor) decode pixel-exactly, and
    libtiff reads THIS encoder's output pixel-exactly — pinning the LZW
    early-change code-width schedule and per-row PackBits framing against
    the reference implementation rather than our own roundtrip."""
    import ctypes

    from vite_spark.text.codecs import decode_tiff, encode_tiff

    lt = _libtiff()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)

    def sf(tif, tag, val):
        lt.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                        ctypes.c_int(val))

    for comp, pred in [(1, 1), (32773, 1), (5, 1), (5, 2)]:
        path = b"/tmp/vite_tiff_ref.tif"
        tif = lt.TIFFOpen(path, b"w")
        assert tif
        sf(tif, 256, 96); sf(tif, 257, 64); sf(tif, 258, 8)
        sf(tif, 259, comp); sf(tif, 262, 2); sf(tif, 277, 3)
        sf(tif, 278, 16); sf(tif, 284, 1)
        if pred == 2:
            sf(tif, 317, 2)
        for r in range(64):
            row = img[r].copy()     # owned buffer: libtiff may defer reads
            assert lt.TIFFWriteScanline(
                tif, row.ctypes.data_as(ctypes.c_void_p), r, 0) == 1
        lt.TIFFClose(ctypes.c_void_p(tif))
        assert (decode_tiff(open(path, "rb").read()) == img).all(), (comp, pred)

    for comp, pred in [("none", 1), ("packbits", 1), ("lzw", 1), ("lzw", 2)]:
        path = b"/tmp/vite_tiff_mine.tif"
        open(path, "wb").write(
            encode_tiff(img, comp, predictor=pred, rows_per_strip=16))
        tif = lt.TIFFOpen(path, b"r")
        assert tif, (comp, pred)
        out = np.zeros_like(img)
        row = np.zeros(96 * 3, np.uint8)
        for r in range(64):
            assert lt.TIFFReadScanline(
                tif, row.ctypes.data_as(ctypes.c_void_p), r, 0) == 1
            out[r] = row.reshape(96, 3)
        lt.TIFFClose(ctypes.c_void_p(tif))
        assert (out == img).all(), (comp, pred)


def test_tiff_rejects_malformed():
    from vite_spark.text.codecs import decode_tiff, encode_tiff, is_tiff

    assert not is_tiff(b"II+\x00....")
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"definitely not a tiff")
    good = encode_tiff(np.full((4, 4, 3), 9, np.uint8), "lzw")
    with pytest.raises(ValueError):
        decode_tiff(good[:40])                       # truncated
    bad = bytearray(encode_tiff(np.full((4, 4, 3), 9, np.uint8)))
    # compression tag value -> unsupported 6 (old JPEG)
    i = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[i + 8] = 6
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError, match="LZW only"):
        encode_tiff(np.zeros((4, 4, 3), np.uint8), "packbits", predictor=2)


def test_tiff_media_from_docs_contract(spark):
    """Driver-fixture contract: formulas match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_TIFF) through the shared
    extract_features REAL decode path — PackBits-compressed payloads
    with run-exact sizes."""
    import pandas as pd

    from vite_spark.text.multimodal import extract_features, tiff_media_from_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 644], "text": ["alpha", "beta", "gamma"]})
    )
    media = tiff_media_from_docs(docs)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (644, "gamma")]:
        r = rows[doc_id]
        w, h = doc_id % 50 + 2, doc_id % 13 + 2
        g = hashlib.sha256(text.encode()).digest()[5]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_bytes"] == 128 + 2 * h * -(-3 * w // 128)
        expect = round(g / 255.0, 6)
        assert r["features"][0] == expect == r["features"][1] == r["features"][2]


# --- netpbm P1-P5 / Sun raster / SGI / XBM (decode-only, real-world) --------

def test_pnm_family_decodes_spec_literals():
    from vite_spark.text.codecs import decode_pnm, is_pnm

    assert is_pnm(b"P1\n1 1\n0\n") and not is_pnm(b"P6\n1 1\n255\n" + b"x" * 3)
    a = decode_pnm(b"P1\n# c\n5 2\n1 0 1 0 1\n0 1 0 1 0\n")
    assert a[:, :, 0].tolist() == [[0, 255, 0, 255, 0], [255, 0, 255, 0, 255]]
    assert decode_pnm(b"P2\n3 2\n15\n0 7 15\n15 7 0\n")[:, :, 1].tolist() \
        == [[0, 119, 255], [255, 119, 0]]
    assert decode_pnm(b"P3\n2 1\n255\n255 0 0  0 0 255\n").tolist() \
        == [[[255, 0, 0], [0, 0, 255]]]
    # raw graymap + raw bitmap (MSB-first, 1 = black, padded rows)
    assert decode_pnm(b"P5\n2 2\n255\n\x00\x80\xff\x01")[:, :, 0].tolist() \
        == [[0, 128], [255, 1]]
    assert decode_pnm(b"P4\n10 1\n\xff\xc0")[:, :, 0].tolist() == [[0] * 10]
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(b"P5\n4 4\n255\nxy")
    with pytest.raises(ValueError, match="out of range"):
        decode_pnm(b"P2\n1 1\n9\n12\n")


def test_ras_and_sgi_decode_spec_literals_and_rejects():
    from vite_spark.text.codecs import decode_ras, decode_sgi, is_ras, is_sgi

    # 24-bit type-1 (BGR) 1x1 red, row padded to 16 bits
    ras = struct.pack(">8I", 0x59A66A95, 1, 1, 24, 4, 1, 0, 0) \
        + bytes([0, 0, 255, 0])
    assert is_ras(ras)
    assert decode_ras(ras)[0, 0].tolist() == [255, 0, 0]
    # 8-bit colormapped
    ras8 = struct.pack(">8I", 0x59A66A95, 2, 1, 8, 2, 1, 1, 6) \
        + bytes([10, 20, 30, 40, 50, 60]) + bytes([1, 0])
    assert decode_ras(ras8)[0].tolist() == [[20, 40, 60], [10, 30, 50]]
    with pytest.raises(ValueError, match="magic"):
        decode_ras(b"\x00" * 40)
    # SGI verbatim 2x1x3, bottom-up rows
    sgi = (b"\x01\xda" + struct.pack(">BBHHHH", 0, 1, 3, 2, 1, 3)
           + b"\x00" * 500 + bytes([1, 2, 3, 4, 5, 6]))
    assert is_sgi(sgi)
    assert decode_sgi(sgi)[0].tolist() == [[1, 3, 5], [2, 4, 6]]
    with pytest.raises(ValueError, match="magic"):
        decode_sgi(b"\x00" * 600)


def test_xbm_decodes_and_matches_lsb_rule():
    from vite_spark.text.codecs import decode_xbm, is_xbm

    xbm = (b"#define t_width 10\n#define t_height 1\n"
           b"static char t_bits[] = {\n 0x03, 0x02 };\n")
    assert is_xbm(xbm)
    out = decode_xbm(xbm)
    # LSB-first: bits 0,1 of byte0 set -> first two pixels black;
    # bit 1 of byte1 -> pixel index 9 black
    assert out[0, :, 0].tolist() == [0, 0] + [255] * 7 + [0]
    assert not is_xbm(b"#define something else entirely")
    with pytest.raises(ValueError):
        decode_xbm(b"#define a_width 4\n#define a_height 4\n"
                   b"static char a_bits[] = { 0x00 };")


@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_pnm_ras_sgi_xbm_real_world_files():
    """Four more real-world encoder outputs, all validated against the
    same lossless PPM truth: Sun raster (32-bit RT_FORMAT_RGB) and SGI
    (RLE, 4-channel, bottom-up) decode PIXEL-EXACTLY; the PGM is the
    converter's BT.601 luma (mean residual < 2); the XBM decodes
    BIT-IDENTICAL to the PBM — two independent bilevel encodings of the
    same image, opposite bit orders, agreeing exactly."""
    from vite_spark.text.codecs import (
        decode_pnm,
        decode_ppm,
        decode_ras,
        decode_sgi,
        decode_xbm,
    )

    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert (decode_ras(open(f"{_IMGDATA}/python.ras", "rb").read())
            == ppm).all()
    assert (decode_sgi(open(f"{_IMGDATA}/python.sgi", "rb").read())
            == ppm).all()
    pgm = decode_pnm(open(f"{_IMGDATA}/python.pgm", "rb").read())
    luma = (0.299 * ppm[:, :, 0] + 0.587 * ppm[:, :, 1]
            + 0.114 * ppm[:, :, 2])
    assert np.abs(pgm[:, :, 0].astype(float) - luma).mean() < 2
    pbm = decode_pnm(open(f"{_IMGDATA}/python.pbm", "rb").read())
    xbm = decode_xbm(open(f"{_IMGDATA}/python.xbm", "rb").read())
    assert (xbm == pbm).all()


# --- system-library codecs (ctypes): WebP, HEIF/H.265, AVIF/AV1 -------------

def _have_webp():
    from vite_spark.text.syscodecs import have_webp
    return have_webp()


def _have_heif_both():
    from vite_spark.text.syscodecs import HEIF_AV1, HEIF_HEVC, have_heif_codec
    return have_heif_codec(HEIF_HEVC) and have_heif_codec(HEIF_AV1)


@pytest.mark.skipif(not _have_webp(), reason="system libwebp not present")
def test_webp_lossless_roundtrip_exact_and_rejects():
    """VP8L is lossless in RGB: encode→decode must be bit-exact on noise
    and constants; corrupt streams and non-WebP bytes reject loudly."""
    from vite_spark.text.syscodecs import decode_webp, encode_webp, is_webp

    rng = np.random.default_rng(4)
    for shape in [(1, 1, 3), (9, 23, 3), (40, 40, 3)]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        p = encode_webp(x)
        assert is_webp(p)
        assert (decode_webp(p) == x).all()
    c = np.full((5, 7, 3), (10, 200, 30), np.uint8)
    assert (decode_webp(encode_webp(c)) == c).all()
    assert not is_webp(b"RIFFxxxxWAVE....")
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp(b"not webp at all!!")
    good = encode_webp(c)
    with pytest.raises(ValueError, match="decode failed"):
        decode_webp(good[:20] + b"\x00" * 8)


@pytest.mark.skipif(not _have_webp(), reason="system libwebp not present")
@pytest.mark.skipif(not __import__("os").path.isdir(_IMGDATA),
                    reason="stdlib imghdr test images not present")
def test_webp_decodes_real_world_file():
    """python.webp (lossy VP8, written by a real encoder) decodes at the
    right dims with residual vs the PPM truth bounded by VP8 loss."""
    from vite_spark.text.codecs import decode_ppm
    from vite_spark.text.syscodecs import decode_webp

    wp = decode_webp(open(f"{_IMGDATA}/python.webp", "rb").read())
    ppm = decode_ppm(open(f"{_IMGDATA}/python.ppm", "rb").read())
    assert wp.shape == ppm.shape == (16, 16, 3)
    assert np.abs(wp.astype(int) - ppm.astype(int)).mean() < 15


@pytest.mark.skipif(not _have_heif_both(),
                    reason="libheif HEVC/AV1 codecs not present")
def test_heif_hevc_and_avif_av1_near_lossless_roundtrip():
    """REAL H.265 and AV1 intra coding through libheif: lossless mode at
    4:4:4 chroma must come back within YCbCr rounding (±2) of the source
    on NOISE (the hardest content), at exact dims, with the right ftyp
    brand; lossy mode must come back substantially smaller yet decodable
    at exact dims. A plane-stride or colorspace bug is far outside ±2."""
    from vite_spark.text.syscodecs import (
        HEIF_AV1,
        HEIF_HEVC,
        decode_heif,
        encode_heif,
        is_heif,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for fmt, brand in [(HEIF_HEVC, b"heic"), (HEIF_AV1, b"avif")]:
        p = encode_heif(img, fmt)
        assert is_heif(p) and p[8:12] == brand
        out = decode_heif(p)
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
        lossy = encode_heif(img, fmt, lossless=False, quality=80)
        assert len(lossy) < len(p)
        out2 = decode_heif(lossy)
        assert out2.shape == img.shape
    with pytest.raises(ValueError, match="ftyp"):
        decode_heif(b"definitely not heif bytes")


@pytest.mark.skipif(not (_have_webp() and _have_heif_both()),
                    reason="system codec libraries not present")
def test_syscodec_media_fixtures_contract(spark):
    """Driver-fixture contracts: webp_media_from_docs dims/means match
    the SQL oracle's formulas through the shared extract_features
    dispatch (which must route RIFF/WEBP and ftyp payloads to the system
    codecs), and heif_parity reports TRUE for both codecs on its noise
    images."""
    import pandas as pd

    from vite_spark.text.multimodal import (
        extract_features,
        heif_parity,
        webp_media_from_docs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    rows = {r["media_id"]: r
            for r in extract_features(webp_media_from_docs(docs)).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        r = rows[doc_id]
        h = hashlib.sha256(text.encode()).digest()
        assert (r["width"], r["height"]) == (doc_id % 19 + 2, doc_id % 11 + 2)
        for c in range(3):
            assert r["features"][c] == round(h[8 + c] / 255.0, 6)
    for r in heif_parity(docs).collect():
        assert r["hevc_ok"] and r["av1_ok"]


# --- IMA/DVI ADPCM WAV (format tag 17, compressed audio) --------------------

def test_adpcm_decode_matches_hand_computed_spec_literal():
    """Hand-built one-block mono IMA ADPCM WAV (NOT via the encoder),
    with the nibble expansion worked by hand against the public step
    table: pred=100, idx=0, nibbles [0,3,A,7,0,1,F,4] must decode to
    [100,100,104,101,112,114,118,95,126] — pins nibble order (low
    first), the step>>3 baseline diff, sign bit, index walk and clamps
    independently of this repo's encoder."""
    from vite_spark.text.codecs import decode_wav

    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 7112, 8, 4) + struct.pack("<HH", 2, 9)
    data = struct.pack("<hBB", 100, 0, 0) + bytes([0x30, 0x7A, 0x10, 0x4F])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, 9)
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(payload)
    assert rate == 8000
    assert s[:, 0].tolist() == [100, 100, 104, 101, 112, 114, 118, 95, 126]


def test_adpcm_constant_roundtrips_exactly():
    """Nibble 0 leaves the predictor unchanged at step index 0, so
    constant signals survive the full compressed roundtrip exactly —
    the property the driver oracle relies on — including multi-block
    payloads and the fact-chunk partial-block trim."""
    from vite_spark.text.codecs import decode_wav, encode_wav_adpcm

    for val in (0, 1234, -20000, 32767, -32768):
        for ch in (1, 2):
            for n in (1, 10, 505, 506, 1300):
                s = np.full((n, ch), val, np.int16)
                out, rate = decode_wav(encode_wav_adpcm(s, 11025))
                assert rate == 11025 and out.shape == (n, ch)
                assert (out == val).all()


def test_adpcm_lossy_roundtrip_bounded():
    """Real signals come back within ADPCM loss, not decoder garbage:
    >20 dB SNR on sine content, and a random walk stays within the step
    table's adaptation reach."""
    from vite_spark.text.codecs import decode_wav, encode_wav_adpcm

    t = np.arange(3000)
    s = (10000 * np.sin(t / 10.0)).astype(np.int16)
    out, _ = decode_wav(encode_wav_adpcm(s, 16000))
    x, y = s.astype(float), out[:, 0].astype(float)
    snr = 10 * np.log10((x * x).mean() / ((y - x) ** 2).mean())
    assert snr > 20
    rng = np.random.default_rng(5)
    w = np.cumsum(rng.integers(-300, 301, 900)).clip(-32768, 32767).astype(np.int16)
    out, _ = decode_wav(encode_wav_adpcm(w, 8000))
    assert np.abs(out[:, 0].astype(int) - w.astype(int)).max() < 2000


def test_adpcm_stereo_interleave_matches_independent_mono():
    """Stereo blocks interleave 4-byte words per channel; since encoder
    state is per-channel, each decoded stereo channel must equal the
    decode of that channel encoded alone as mono — pins the word
    interleave without trusting it on both sides."""
    from vite_spark.text.codecs import decode_wav, encode_wav_adpcm

    rng = np.random.default_rng(11)
    left = np.cumsum(rng.integers(-200, 201, 700)).clip(-32768, 32767)
    right = (6000 * np.cos(np.arange(700) / 17.0))
    s = np.stack([left, right], axis=1).astype(np.int16)
    stereo, _ = decode_wav(encode_wav_adpcm(s, 8000))
    for c in range(2):
        mono, _ = decode_wav(encode_wav_adpcm(s[:, c], 8000))
        assert np.array_equal(stereo[:, c], mono[:, 0])


def test_adpcm_rejects_malformed():
    from vite_spark.text.codecs import decode_wav, encode_wav_adpcm

    good = encode_wav_adpcm(np.full(20, 5, np.int16), 8000)
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(good[:50])                     # truncated chunks
    bad = bytearray(good)
    i = bad.find(b"data") + 8 + 2                 # header step-index byte
    bad[i] = 120
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    bad = bytearray(good)
    j = bad.find(b"fmt ") + 8 + 18                # wSamplesPerBlock
    bad[j:j + 2] = struct.pack("<H", 33)
    with pytest.raises(ValueError, match="inconsistent"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="block_samples"):
        encode_wav_adpcm(np.zeros(4, np.int16), 8000, block_samples=10)
    with pytest.raises(ValueError, match="ch<=2"):
        encode_wav_adpcm(np.zeros((4, 3), np.int16), 8000)


def test_adpcm_media_from_docs_contract(spark):
    """Driver-fixture contract: formulas match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_ADPCM), through the shared
    extract_audio_features REAL decode path — compressed payloads,
    encoder-exact sizes, fact-trimmed counts."""
    import pandas as pd

    from vite_spark.text.multimodal import (
        adpcm_media_from_docs,
        extract_audio_features,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 644], "text": ["alpha", "beta", "gamma"]})
    )
    media = adpcm_media_from_docs(docs)
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (644, "gamma")]:
        r = rows[doc_id]
        ch, n = doc_id % 2 + 1, doc_id % 900 + 10
        h = hashlib.sha256(text.encode()).digest()
        v = int.from_bytes(h[20:22], "little", signed=True)
        assert (r["channels"], r["n_samples"], r["sample_rate"]) == (ch, n, 11025)
        assert r["n_bytes"] == 60 + -(-n // 505) * 256 * ch
        assert r["mean_amp"] == v / 32768.0
        assert r["rms_amp"] == abs(v) / 32768.0


# --- AU (Sun audio, big-endian PCM16) ---------------------------------------


def test_au_decode_matches_spec_literal():
    """Hand-built 3-sample stereo AU from the Sun spec (NOT via
    encode_au): 28-byte offset (4 annotation bytes skipped), big-endian
    samples."""
    from vite_spark.text.codecs import decode_au, is_au

    samples = np.array([[100, -100], [32767, -32768], [0, 5]], dtype=np.int16)
    payload = (struct.pack(">4sIIIII", b".snd", 28, 12, 3, 8000, 2)
               + b"anno" + samples.astype(">i2").tobytes())
    assert is_au(payload)
    s, rate = decode_au(payload)
    assert rate == 8000
    assert np.array_equal(s, samples)
    # unknown-size sentinel: take the rest of the payload
    payload2 = (struct.pack(">4sIIIII", b".snd", 24, 0xFFFFFFFF, 3, 8000, 2)
                + samples.astype(">i2").tobytes())
    s2, _ = decode_au(payload2)
    assert np.array_equal(s2, samples)


def test_au_roundtrip_and_rejections():
    from vite_spark.text.codecs import decode_au, encode_au, is_au

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3):
        s = rng.integers(-32768, 32768, size=(37, ch)).astype(np.int16)
        out, rate = decode_au(encode_au(s, 11025))
        assert rate == 11025
        assert np.array_equal(out, s)
    assert not is_au(b".snd too short")
    with pytest.raises(ValueError, match="magic"):
        decode_au(b"RIFF" + bytes(40))
    # mu-law (encoding 1) rejected
    mu = struct.pack(">4sIIIII", b".snd", 24, 4, 1, 8000, 1) + bytes(4)
    with pytest.raises(ValueError, match="16-bit linear"):
        decode_au(mu)
    good = encode_au(np.zeros((10, 2), np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_au(good[:-8])


def test_au_media_from_docs_contract(spark):
    """Driver-fixture contract: formulas match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_AU), and the shared
    extract_audio_features path decodes it for real (big-endian sign
    handling included)."""
    import pandas as pd

    from vite_spark.text.multimodal import au_media_from_docs, extract_audio_features

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    media = au_media_from_docs(docs)
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        r = rows[doc_id]
        ch, n = doc_id % 3 + 1, doc_id % 300 + 10
        h = hashlib.sha256(text.encode()).digest()
        v = int.from_bytes(h[24:26], "big", signed=True)
        assert (r["channels"], r["n_samples"], r["sample_rate"]) == (ch, n, 11025)
        assert r["n_bytes"] == 24 + 2 * ch * n
        assert r["mean_amp"] == v / 32768.0
        assert r["rms_amp"] == abs(v) / 32768.0


def _have_hevc():
    from vite_spark.text.syscodecs import have_hevc
    return have_hevc()


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_hevc_motion_roundtrip_exact_and_inter_frames():
    """The honest motion-video path: multi-frame lossless 4:4:4 H.265
    roundtrips BIT-EXACTLY through two independent system codecs (x265
    encode, de265 decode), on RANDOM frames — so motion estimation,
    residual coding, and reference-picture handling are all exercised —
    and the stream genuinely contains INTER (TRAIL) NALs, not a series
    of stills. Non-CTU-aligned dims pin the conformance-window crop."""
    from vite_spark.text.syscodecs import (
        decode_hevc,
        encode_hevc,
        hevc_nal_types,
        is_hevc_annexb,
    )

    rng = np.random.default_rng(11)
    for n, h, w in [(5, 24, 32), (3, 16, 16), (6, 18, 26), (8, 21, 37)]:
        frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
        payload = encode_hevc(frames, fps=6)
        assert is_hevc_annexb(payload)
        types = hevc_nal_types(payload)
        # VPS/SPS/PPS present; IDR_W_RADL (20) or IDR_N_LP (19) leads
        assert {32, 33, 34} <= set(types)
        assert any(t in (19, 20) for t in types)
        if n > 1:   # TRAIL_N (0) / TRAIL_R (1): genuine inter frames
            assert any(t in (0, 1) for t in types), types
        dec = decode_hevc(payload)
        assert dec.shape == frames.shape
        assert np.array_equal(dec, frames)


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_hevc_rejects_and_smooth_motion_compresses():
    """Error paths stay loud, and the encoder behaves like a video codec:
    a translating scene (inter-predictable) must compress far below raw
    size even in lossless mode — evidence the P frames actually use
    motion compensation rather than re-coding stills."""
    from vite_spark.text.syscodecs import decode_hevc, encode_hevc, is_hevc_annexb

    with pytest.raises(ValueError, match="Annex-B"):
        decode_hevc(b"\x00\x00\x00\x01\xff not hevc")
    with pytest.raises(ValueError, match="16x16"):
        encode_hevc(np.zeros((2, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        encode_hevc(np.zeros((2, 16, 16), np.uint8))
    assert not is_hevc_annexb(b"")
    assert not is_hevc_annexb(b"\x89PNG\r\n\x1a\n")
    # translating gradient: 12 frames, 48x48
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (64, 64, 3), np.uint8)
    frames = np.stack([base[k:k + 48, k:k + 48] for k in range(12)])
    payload = encode_hevc(frames, fps=12)
    raw = frames.size
    assert len(payload) < raw // 2, (len(payload), raw)
    assert np.array_equal(decode_hevc(payload), frames)


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_hevc_media_from_docs_contract(spark):
    """Driver-fixture contract: formulas match what the DuckDB oracle
    recomputes (queries.SQL_MULTIMODAL_HEVC), through the REAL
    encode-on-executor → decode-on-executor sampling path."""
    import pandas as pd

    from vite_spark.text.multimodal import hevc_media_from_docs, sample_hevc_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 44], "text": ["alpha", "beta", "gamma"]})
    )
    media = hevc_media_from_docs(docs, fps=6)
    out = sample_hevc_frames(media, fps=6, max_frames=4).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (44, "gamma")]:
        w, hh = doc_id % 17 + 16, doc_id % 13 + 16
        n = doc_id % 6 + 1
        ns = min(n, 4)
        h = hashlib.sha256(text.encode()).digest()
        for j in range(ns):
            k = j * n // ns
            r = rows[(doc_id, k)]
            assert (r["width"], r["height"], r["n_frames"]) == (w, hh, n)
            assert r["ts_s"] == k / 6
            assert r["mean_r"] == round(h[6 + 3 * k] / 255.0, 6)
            assert r["mean_g"] == round(h[7 + 3 * k] / 255.0, 6)
            assert r["mean_b"] == round(h[8 + 3 * k] / 255.0, 6)
    assert len(out) == sum(min(d % 6 + 1, 4) for d in (0, 7, 44))


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mp4_mux_demux_roundtrip_bit_exact():
    """Container path end-to-end: Annex-B → MP4 → demux → decode returns
    the exact input frames, with fps/dims/duration read back from the
    container (not echoed from a parameter), and the demuxed stream
    carrying exactly the NALs that went in."""
    from vite_spark.text.mp4 import (
        demux_mp4,
        is_mp4,
        mux_mp4,
        split_annexb,
    )
    from vite_spark.text.syscodecs import decode_hevc, encode_hevc

    rng = np.random.default_rng(21)
    for n, h, w, fps in [(6, 18, 26, 3), (1, 16, 16, 30), (8, 21, 37, 5)]:
        frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
        es = encode_hevc(frames, fps=fps)
        mp4 = mux_mp4(es, w, h, fps)
        assert is_mp4(mp4)
        d = demux_mp4(mp4)
        assert (d["width"], d["height"], d["n_samples"]) == (w, h, n)
        assert d["fps"] == float(fps)
        assert d["duration_s"] == n / fps
        assert np.array_equal(decode_hevc(d["annexb"]), frames)
        # NAL multiset identical: the container reframed, never rewrote
        assert sorted(split_annexb(d["annexb"])) == sorted(split_annexb(es))


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mp4_muxed_structure_spec_literal():
    """Structural invariants checked with raw struct reads, independent
    of the box walker: ftyp brand, stco's chunk offset lands on the first
    sample inside mdat, stsz sizes sum to the mdat payload, and the moov
    is last (progressive layout)."""
    import struct

    from vite_spark.text.mp4 import mux_mp4
    from vite_spark.text.syscodecs import encode_hevc

    frames = np.full((3, 16, 16, 3), 128, np.uint8)
    mp4 = mux_mp4(encode_hevc(frames, fps=4), 16, 16, 4)
    assert mp4[4:8] == b"ftyp" and mp4[8:12] == b"isom"
    ftyp_size = struct.unpack_from(">I", mp4, 0)[0]
    mdat_size = struct.unpack_from(">I", mp4, ftyp_size)[0]
    assert mp4[ftyp_size + 4:ftyp_size + 8] == b"mdat"
    moov_off = ftyp_size + mdat_size
    assert mp4[moov_off + 4:moov_off + 8] == b"moov"
    assert moov_off + struct.unpack_from(">I", mp4, moov_off)[0] == len(mp4)
    i = mp4.index(b"stco")
    n_chunks, off0 = struct.unpack_from(">II", mp4, i + 8)
    assert n_chunks == 1 and off0 == ftyp_size + 8   # first byte of mdat body
    i = mp4.index(b"stsz")
    fixed, cnt = struct.unpack_from(">II", mp4, i + 8)
    sizes = struct.unpack_from(f">{cnt}I", mp4, i + 16)
    assert fixed == 0 and cnt == 3
    assert sum(sizes) == mdat_size - 8


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_isobmff_walker_on_third_party_heic_bytes():
    """The strongest container validation available here: libheif-AUTHORED
    HEIC files (ISOBMFF this repo did not write) parse through the same
    box walker — meta/iinf/ipma/iloc/hvcC — and the extracted coded HEVC
    item decodes through libde265 at exactly the ispe-advertised coded
    dims; converting the decoded 4:4:4 YCbCr with plain BT.601 full-range
    reproduces libheif's OWN full-stack RGB decode PIXEL-EXACTLY, and the
    visible region matches the pre-encode original within the same ±2
    YCbCr bound the HEIF tests pin. One wrong iloc field width or ipma
    index and this fails loudly."""
    from vite_spark.text.mp4 import extract_heic_hevc
    from vite_spark.text.syscodecs import (
        decode_heif,
        decode_hevc,
        encode_heif,
        have_heif_codec,
    )

    if not have_heif_codec():
        pytest.skip("libheif HEVC encode/decode not available")
    rng = np.random.default_rng(33)
    for hh, ww in [(40, 56), (33, 47), (16, 16)]:
        img = rng.integers(0, 256, (hh, ww, 3), np.uint8)
        heic = encode_heif(img, lossless=True)
        x = extract_heic_hevc(heic)
        dec = decode_hevc(x["annexb"])
        assert dec.shape[0] == 1
        assert (dec.shape[2], dec.shape[1]) == (x["width"], x["height"])
        assert x["width"] >= ww and x["height"] >= hh   # CTU padding
        y = dec[0, :hh, :ww, 0].astype(np.float64)
        cb = dec[0, :hh, :ww, 1].astype(np.float64)
        cr = dec[0, :hh, :ww, 2].astype(np.float64)
        rgb = np.clip(np.stack([
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ], -1).round(), 0, 255).astype(np.int64)
        assert np.array_equal(rgb, decode_heif(heic).astype(np.int64))
        assert np.abs(rgb - img.astype(np.int64)).max() <= 2


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mp4_rejects_malformed():
    from vite_spark.text.mp4 import demux_mp4, is_mp4, mux_mp4, walk_boxes
    from vite_spark.text.syscodecs import encode_hevc

    assert not is_mp4(b"")
    assert not is_mp4(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(ValueError, match="not an MP4"):
        demux_mp4(b"\x00\x00\x00\x10ftypheic\x00\x00\x00\x00")   # HEIF brand
    frames = np.full((2, 16, 16, 3), 7, np.uint8)
    good = mux_mp4(encode_hevc(frames, fps=4), 16, 16, 4)
    with pytest.raises(ValueError):
        demux_mp4(good[:-30])                 # truncated moov
    bad = bytearray(good)
    bad[0:4] = (0xFFFFFFFF).to_bytes(4, "big")  # box size beyond file
    with pytest.raises(ValueError, match="bad size"):
        list(walk_boxes(bytes(bad)))
    with pytest.raises(ValueError, match="fps"):
        mux_mp4(encode_hevc(frames, fps=4), 16, 16, 0)


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_mp4_media_from_docs_contract(spark):
    """Driver-fixture contract incl. the PER-DOC fps: formulas match what
    the DuckDB oracle recomputes (queries.SQL_MULTIMODAL_MP4), through
    the real mux-on-executor → demux+decode-on-executor path; ts_s only
    comes out right if the demuxer reads mdhd/stts."""
    import pandas as pd

    from vite_spark.text.multimodal import mp4_media_from_docs, sample_mp4_frames

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 7, 45], "text": ["alpha", "beta", "gamma"]})
    )
    media = mp4_media_from_docs(docs)
    out = sample_mp4_frames(media, max_frames=4).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    for doc_id, text in [(0, "alpha"), (7, "beta"), (45, "gamma")]:
        w, hh = doc_id % 15 + 16, doc_id % 11 + 16
        n, fps = doc_id % 5 + 1, doc_id % 4 + 2
        ns = min(n, 4)
        h = hashlib.sha256(text.encode()).digest()
        for j in range(ns):
            k = j * n // ns
            r = rows[(doc_id, k)]
            assert (r["width"], r["height"], r["n_frames"]) == (w, hh, n)
            assert r["ts_s"] == k / fps
            assert r["mean_r"] == round(h[6 + 3 * k] / 255.0, 6)
            assert r["mean_g"] == round(h[7 + 3 * k] / 255.0, 6)
            assert r["mean_b"] == round(h[8 + 3 * k] / 255.0, 6)
    assert len(out) == sum(min(d % 5 + 1, 4) for d in (0, 7, 45))


@pytest.mark.skipif(not _have_hevc(), reason="system libx265/libde265 not present")
def test_sample_video_frames_dispatch(spark):
    """One DataFrame mixing all three native video formats routes each
    row to the right decoder and yields identical per-frame values for
    identical content."""
    import pandas as pd

    from vite_spark.text.codecs import encode_avi
    from vite_spark.text.mp4 import mux_mp4
    from vite_spark.text.multimodal import sample_video_frames
    from vite_spark.text.syscodecs import encode_hevc

    frames = np.full((3, 16, 16, 3), 0, np.uint8)
    frames[0], frames[1], frames[2] = (10, 20, 30), (40, 50, 60), (70, 80, 90)
    es = encode_hevc(frames, fps=5)
    payloads = {
        1: encode_avi(frames, 5),
        2: mux_mp4(es, 16, 16, 5),
        3: es,
    }
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": list(payloads), "kind": ["video"] * 3,
        "payload": list(payloads.values()),
        "mime": ["video/x-msvideo", "video/mp4", "video/h265"],
        "meta_width": pd.array([16] * 3, dtype="Int64"),
        "meta_height": pd.array([16] * 3, dtype="Int64"),
        "meta_duration_s": pd.array([0.6] * 3, dtype="Float64"),
    }))
    out = sample_video_frames(media, max_frames=4, default_fps=5).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert len(out) == 9
    for mid in payloads:
        for k, (r_, g_, b_) in enumerate([(10, 20, 30), (40, 50, 60),
                                          (70, 80, 90)]):
            r = rows[(mid, k)]
            assert (r["width"], r["height"], r["n_frames"]) == (16, 16, 3)
            assert r["ts_s"] == k / 5
            assert r["mean_r"] == round(r_ / 255.0, 6)
            assert r["mean_g"] == round(g_ / 255.0, 6)
            assert r["mean_b"] == round(b_ / 255.0, 6)
    # unknown container still raises loudly
    bad = spark.createDataFrame(pd.DataFrame({
        "media_id": [9], "kind": ["video"], "payload": [b"\x1aE\xdf\xa3 mkv?"],
        "mime": ["video/x-matroska"],
        "meta_width": pd.array([1], dtype="Int64"),
        "meta_height": pd.array([1], dtype="Int64"),
        "meta_duration_s": pd.array([1.0], dtype="Float64"),
    }))
    with pytest.raises(Exception, match="undecodable video payload"):
        sample_video_frames(bad).collect()
