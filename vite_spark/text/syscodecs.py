"""System-library-backed codecs via ctypes — WebP (VP8/VP8L) and
HEIF/AVIF (H.265 / AV1 intra stills).

The vendored codecs in text/codecs.py and text/jpeg.py are pure NumPy
because their formats are implementable from public specs in reasonable
space. VP8, H.265, and AV1 are not — but this container DOES ship the
open-source reference stacks (libwebp; libheif with libde265/libx265 for
HEVC and dav1d/aom/rav1e/SVT for AV1), so the honest move is to bind
them rather than stub: these functions drive the system libraries
through ctypes and raise a loud RuntimeError when the library (or its
codec plugin) is absent. Everything stays Arrow/NumPy on the Spark side;
the only non-NumPy step is the codec call itself — exactly the shape a
production pipeline has (decoder lib on executors, bytes in, arrays
out).

- WebP: struct-free API — WebPGetInfo / WebPDecodeRGB / WebPFree,
  WebPEncodeLosslessRGB (VP8L is truly lossless in RGB, so constant
  fixtures roundtrip EXACTLY — SQL-oracle-able).
- HEIF/AVIF: opaque-pointer API plus one by-value struct (heif_error).
  Encode paths set lossless + chroma 444, but H.265/AV1 "lossless" still
  routes RGB through YCbCr in this build, so roundtrips are validated
  within a small tolerance, not bit-exactly — the driver query exposes
  the property as booleans computed from the real pixel arrays.

H.26x STILLS are therefore REAL here (HEIF carries H.265 intra frames;
AVIF carries AV1 intra frames). Motion video beyond MJPEG/raw-DIB AVI
and MP3 audio remain honestly stubbed: no container demuxer/MP3 lib.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

# --- WebP -------------------------------------------------------------------

_WEBP = None


def _webp():
    global _WEBP
    if _WEBP is None:
        try:
            lib = ctypes.CDLL("libwebp.so.7")
        except OSError:
            _WEBP = False
            return None
        lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.WebPDecodeRGB.restype = ctypes.c_void_p
        lib.WebPDecodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _WEBP = lib
    return _WEBP or None


def have_webp() -> bool:
    return _webp() is not None


def is_webp(payload: bytes | None) -> bool:
    return (payload is not None and len(payload) >= 16
            and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP")


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes → (H, W, 3) uint8 RGB via the system libwebp."""
    lib = _webp()
    if lib is None:
        raise RuntimeError("system libwebp not present")
    if not is_webp(payload):
        raise ValueError("not a WebP payload (missing RIFF/WEBP magic)")
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = lib.WebPDecodeRGB(payload, len(payload),
                            ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("WebP decode failed (corrupt or unsupported stream)")
    try:
        out = np.frombuffer(
            ctypes.string_at(ptr, h.value * w.value * 3), np.uint8
        ).reshape(h.value, w.value, 3).copy()
    finally:
        lib.WebPFree(ptr)
    return out


def encode_webp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → LOSSLESS WebP (VP8L) via the system libwebp."""
    lib = _webp()
    if lib is None:
        raise RuntimeError("system libwebp not present")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or 0 in rgb.shape[:2]:
        raise ValueError(f"expected non-empty (H, W, 3) RGB, got {rgb.shape}")
    h, w = rgb.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGB(
        rgb.ctypes.data_as(ctypes.c_void_p), w, h, w * 3, ctypes.byref(out))
    if n == 0 or not out:
        raise ValueError("WebP encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


# --- HEIF / AVIF (libheif: H.265 via de265/x265, AV1 via dav1d/aom) ---------

HEIF_HEVC = 1      # heif_compression_HEVC
HEIF_AV1 = 4       # heif_compression_AV1

_HEIF = None


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def _heif():
    global _HEIF
    if _HEIF is None:
        try:
            lib = ctypes.CDLL("libheif.so.1")
        except OSError:
            _HEIF = False
            return None
        P, V, I = ctypes.POINTER, ctypes.c_void_p, ctypes.c_int
        sig = {
            "heif_context_alloc": (V, []),
            "heif_context_read_from_memory_without_copy":
                (_HeifError, [V, ctypes.c_char_p, ctypes.c_size_t, V]),
            "heif_context_get_primary_image_handle": (_HeifError, [V, P(V)]),
            "heif_decode_image": (_HeifError, [V, P(V), I, I, V]),
            "heif_image_get_plane_readonly": (V, [V, I, P(I)]),
            "heif_image_get_plane": (V, [V, I, P(I)]),
            "heif_context_get_encoder_for_format": (_HeifError, [V, I, P(V)]),
            "heif_image_create": (_HeifError, [I, I, I, I, P(V)]),
            "heif_image_add_plane": (_HeifError, [V, I, I, I, I]),
            "heif_encoder_set_parameter_string":
                (_HeifError, [V, ctypes.c_char_p, ctypes.c_char_p]),
            "heif_context_encode_image": (_HeifError, [V, V, V, V, P(V)]),
            "heif_context_write_to_file": (_HeifError, [V, ctypes.c_char_p]),
            "heif_encoder_set_lossless": (I, [V, I]),
            "heif_encoder_set_lossy_quality": (I, [V, I]),
            "heif_image_handle_get_width": (I, [V]),
            "heif_image_handle_get_height": (I, [V]),
            "heif_have_decoder_for_format": (I, [I]),
            "heif_have_encoder_for_format": (I, [I]),
            "heif_image_release": (None, [V]),
            "heif_image_handle_release": (None, [V]),
            "heif_encoder_release": (None, [V]),
            "heif_context_free": (None, [V]),
        }
        for name, (res, args) in sig.items():
            f = getattr(lib, name)
            f.restype = res
            f.argtypes = args
        _HEIF = lib
    return _HEIF or None


def have_heif(fmt: int = HEIF_HEVC) -> bool:
    """Decoder available for the format (encode_heif checks the encoder
    side itself)."""
    lib = _heif()
    return bool(lib and lib.heif_have_decoder_for_format(fmt))


def have_heif_codec(fmt: int = HEIF_HEVC) -> bool:
    """Both directions available — what the roundtrip fixtures need."""
    lib = _heif()
    return bool(lib
                and lib.heif_have_decoder_for_format(fmt)
                and lib.heif_have_encoder_for_format(fmt))


def is_heif(payload: bytes | None) -> bool:
    """ISOBMFF ftyp with a HEIF/AVIF brand."""
    return (payload is not None and len(payload) >= 16
            and payload[4:8] == b"ftyp"
            and payload[8:12] in (b"heic", b"heix", b"mif1", b"msf1",
                                  b"avif", b"avis"))


def _check(err: _HeifError, what: str):
    if err.code != 0:
        raise ValueError(
            f"libheif {what} failed: {err.code}/{err.subcode} "
            f"{(err.message or b'').decode(errors='replace')}"
        )


# heif enum constants used below (public libheif API)
_CS_RGB = 1                 # heif_colorspace_RGB
_CHROMA_ILV_RGB = 10        # heif_chroma_interleaved_RGB
_CH_ILV = 10                # heif_channel_interleaved


def decode_heif(payload: bytes) -> np.ndarray:
    """HEIF/AVIF bytes → (H, W, 3) uint8 RGB via the system libheif —
    a REAL H.265 / AV1 intra-frame decode."""
    lib = _heif()
    if lib is None:
        raise RuntimeError("system libheif not present")
    if not is_heif(payload):
        raise ValueError("not a HEIF/AVIF payload (missing ftyp brand)")
    ctx = lib.heif_context_alloc()
    try:
        buf = ctypes.create_string_buffer(payload, len(payload))
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(payload), None), "read")
        handle = ctypes.c_void_p()
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary handle")
        try:
            w = lib.heif_image_handle_get_width(handle)
            h = lib.heif_image_handle_get_height(handle)
            img = ctypes.c_void_p()
            _check(lib.heif_decode_image(handle, ctypes.byref(img),
                                         _CS_RGB, _CHROMA_ILV_RGB, None),
                   "decode")
            try:
                stride = ctypes.c_int()
                plane = lib.heif_image_get_plane_readonly(
                    img, _CH_ILV, ctypes.byref(stride))
                if not plane:
                    raise ValueError("libheif returned no interleaved plane")
                out = np.zeros((h, w, 3), np.uint8)
                for r in range(h):
                    ctypes.memmove(out.ctypes.data + r * w * 3,
                                   plane + r * stride.value, w * 3)
                return out
            finally:
                lib.heif_image_release(img)
        finally:
            lib.heif_image_handle_release(handle)
    finally:
        lib.heif_context_free(ctx)


def encode_heif(rgb: np.ndarray, fmt: int = HEIF_HEVC,
                lossless: bool = True, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB → HEIF (H.265) or AVIF (AV1) still via the
    system libheif. 'lossless' requests the codec's lossless mode with
    4:4:4 chroma; this build still routes RGB through YCbCr, so expect
    near-lossless (±2), not bit-exact — tests pin that bound."""
    lib = _heif()
    if lib is None:
        raise RuntimeError("system libheif not present")
    if not (lib.heif_have_encoder_for_format(fmt)):
        raise RuntimeError(f"libheif has no encoder for format {fmt}")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or 0 in rgb.shape[:2]:
        raise ValueError(f"expected non-empty (H, W, 3) RGB, got {rgb.shape}")
    h, w = rgb.shape[:2]
    ctx = lib.heif_context_alloc()
    try:
        enc = ctypes.c_void_p()
        _check(lib.heif_context_get_encoder_for_format(
            ctx, fmt, ctypes.byref(enc)), "get encoder")
        try:
            if lossless:
                lib.heif_encoder_set_lossless(enc, 1)
                lib.heif_encoder_set_parameter_string(enc, b"chroma", b"444")
            else:
                lib.heif_encoder_set_lossy_quality(enc, quality)
            img = ctypes.c_void_p()
            _check(lib.heif_image_create(w, h, _CS_RGB, _CHROMA_ILV_RGB,
                                         ctypes.byref(img)), "image create")
            try:
                _check(lib.heif_image_add_plane(img, _CH_ILV, w, h, 8),
                       "add plane")
                stride = ctypes.c_int()
                plane = lib.heif_image_get_plane(img, _CH_ILV,
                                                 ctypes.byref(stride))
                for r in range(h):
                    ctypes.memmove(plane + r * stride.value,
                                   rgb.ctypes.data + r * w * 3, w * 3)
                out_handle = ctypes.c_void_p()
                _check(lib.heif_context_encode_image(
                    ctx, img, enc, None, ctypes.byref(out_handle)), "encode")
                if out_handle:
                    lib.heif_image_handle_release(out_handle)
                # libheif's streaming writer returns heif_error BY VALUE
                # from a callback, which ctypes callbacks cannot express —
                # write through a temp file instead
                fd, path = tempfile.mkstemp(suffix=".heif")
                os.close(fd)
                try:
                    _check(lib.heif_context_write_to_file(ctx, path.encode()),
                           "write")
                    with open(path, "rb") as f:
                        return f.read()
                finally:
                    os.unlink(path)
            finally:
                lib.heif_image_release(img)
        finally:
            lib.heif_encoder_release(enc)
    finally:
        lib.heif_context_free(ctx)


# --- H.265 MOTION video (libx265 encode, libde265 decode) --------------------
#
# HEIF above carries only INTRA stills. This section is the honest
# motion-video path: multi-frame H.265 elementary streams (Annex-B) with
# real INTER (P) frames, encoded by the system libx265 and decoded by the
# independent system libde265 — two unrelated codebases, so a lossless
# roundtrip is a genuine cross-validation, not a self-check.
#
# Losslessness: x265 --lossless with 4:4:4 chroma is transform-bypass
# bit-exact, and we pass the R, G, B planes straight through the three
# 4:4:4 channel slots (no YCbCr matrix at all), so decode returns the
# input pixels EXACTLY — which is what makes the driver fixtures
# SQL-oracle-able.
#
# libx265's only struct-passing API surface we need is x265_picture, whose
# layout we PROBE at load time instead of trusting a vendored header:
# x265_picture_init() writes bitDepth (=8) and colorSpace (=param csp), so
# initialising one picture under i420 and one under i444 and diffing the
# bytes pins the colorSpace offset (the ONLY differing word), and the
# documented field order (planes[3], stride[3], bitDepth, sliceType, poc,
# colorSpace) is then verified by asserting bitDepth==8 / sliceType==0 /
# poc==0 at the relative offsets. Any mismatch → RuntimeError, never a
# silent garbage encode.

_X265 = None
_DE265 = None


class _X265Nal(ctypes.Structure):
    # public x265.h: { uint32_t type; uint32_t sizeBytes; uint8_t* payload; }
    _fields_ = [("type", ctypes.c_uint32), ("sizeBytes", ctypes.c_uint32),
                ("payload", ctypes.c_void_p)]


def _x265():
    global _X265
    if _X265 is None:
        P, V, I = ctypes.POINTER, ctypes.c_void_p, ctypes.c_int
        try:
            lib = ctypes.CDLL("libx265.so.199")
        except OSError:
            _X265 = False
            return None
        sig = {
            "x265_param_alloc": (V, []),
            "x265_param_free": (None, [V]),
            "x265_param_default": (None, [V]),
            "x265_param_default_preset":
                (I, [V, ctypes.c_char_p, ctypes.c_char_p]),
            "x265_param_parse": (I, [V, ctypes.c_char_p, ctypes.c_char_p]),
            "x265_picture_alloc": (V, []),
            "x265_picture_free": (None, [V]),
            "x265_picture_init": (None, [V, V]),
            "x265_encoder_open_199": (V, [V]),
            "x265_encoder_headers": (I, [V, P(V), P(ctypes.c_uint32)]),
            "x265_encoder_encode": (I, [V, P(V), P(ctypes.c_uint32), V, V]),
            "x265_encoder_close": (None, [V]),
        }
        for name, (res, args) in sig.items():
            f = getattr(lib, name)
            f.restype = res
            f.argtypes = args
        # ---- picture-layout probe (see module comment above) ----
        p1 = lib.x265_param_alloc()
        p3 = lib.x265_param_alloc()
        pic = lib.x265_picture_alloc()
        try:
            lib.x265_param_default(p1)
            lib.x265_param_default(p3)
            if (lib.x265_param_parse(p1, b"input-csp", b"i420") != 0
                    or lib.x265_param_parse(p3, b"input-csp", b"i444") != 0):
                _X265 = False
                return None
            span = 512

            def dump(param):
                ctypes.memset(pic, 0xAB, span)
                lib.x265_picture_init(param, pic)
                return ctypes.string_at(pic, span)

            d1, d3 = dump(p1), dump(p3)
            diffs = [o for o in range(0, span, 4) if d1[o:o + 4] != d3[o:o + 4]]
            ok = False
            if len(diffs) == 1:
                off = diffs[0]
                words = np.frombuffer(d1[off - 12:off + 4], "<i4")
                # bitDepth, sliceType(X265_TYPE_AUTO=0), poc, colorSpace
                ok = (list(words) == [8, 0, 0, 1]
                      and np.frombuffer(d3[off:off + 4], "<i4")[0] == 3
                      and off >= 48 + 12)
            if not ok:
                _X265 = False
                return None
            lib._pic_off_colorspace = off
            lib._pic_off_bitdepth = off - 12
            lib._pic_off_stride = off - 12 - 12     # int stride[3]
            lib._pic_off_planes = off - 12 - 12 - 24  # void* planes[3]
        finally:
            lib.x265_picture_free(pic)
            lib.x265_param_free(p1)
            lib.x265_param_free(p3)
        _X265 = lib
    return _X265 or None


def _de265():
    global _DE265
    if _DE265 is None:
        P, V, I = ctypes.POINTER, ctypes.c_void_p, ctypes.c_int
        try:
            lib = ctypes.CDLL("libde265.so.0")
        except OSError:
            _DE265 = False
            return None
        sig = {
            "de265_new_decoder": (V, []),
            "de265_free_decoder": (I, [V]),
            "de265_push_data":
                (I, [V, ctypes.c_char_p, I, ctypes.c_longlong, V]),
            "de265_flush_data": (I, [V]),
            "de265_decode": (I, [V, P(I)]),
            "de265_get_next_picture": (V, [V]),
            "de265_get_image_width": (I, [V, I]),
            "de265_get_image_height": (I, [V, I]),
            "de265_get_chroma_format": (I, [V]),
            "de265_get_bits_per_pixel": (I, [V, I]),
            "de265_get_image_plane": (ctypes.c_void_p, [V, I, P(I)]),
        }
        for name, (res, args) in sig.items():
            f = getattr(lib, name)
            f.restype = res
            f.argtypes = args
        _DE265 = lib
    return _DE265 or None


def have_hevc() -> bool:
    """Both directions of the motion path: x265 encode + de265 decode."""
    return _x265() is not None and _de265() is not None


def hevc_nal_types(payload: bytes) -> list[int]:
    """NAL unit types of an Annex-B H.265 elementary stream, in stream
    order (type = (first header byte >> 1) & 0x3F per ITU-T H.265 §7.3.1.2).
    Pure byte-scan — no codec library needed."""
    types = []
    i, n = 0, len(payload)
    while i + 3 < n:
        if payload[i] == 0 and payload[i + 1] == 0:
            if payload[i + 2] == 1:
                types.append((payload[i + 3] >> 1) & 0x3F)
                i += 3
                continue
            if i + 4 < n and payload[i + 2] == 0 and payload[i + 3] == 1:
                types.append((payload[i + 4] >> 1) & 0x3F)
                i += 4
                continue
        i += 1
    return types


def is_hevc_annexb(payload: bytes | None) -> bool:
    """Annex-B H.265 elementary stream: leading start code whose first
    NAL is a parameter set or IRAP (VPS/SPS/PPS or IDR/CRA)."""
    if payload is None or len(payload) < 6:
        return False
    if payload[:4] == b"\x00\x00\x00\x01":
        t = (payload[4] >> 1) & 0x3F
    elif payload[:3] == b"\x00\x00\x01":
        t = (payload[3] >> 1) & 0x3F
    else:
        return False
    return t in (32, 33, 34, 19, 20, 21)


def encode_hevc(frames: np.ndarray, fps: int = 4) -> bytes:
    """(N, H, W, 3) uint8 RGB frames → Annex-B H.265 elementary stream
    via the system libx265: LOSSLESS, 4:4:4, R/G/B passed through the
    three channel slots unconverted (bit-exact roundtrip), bframes=0 so
    decode order == display order, keyint default → frame 0 is IDR and
    frames 1..N-1 are real INTER (TRAIL_R) frames. Single-threaded
    (pools=1, frame-threads=1): parallelism belongs to Spark tasks, not
    to a per-row encoder pool. Raw elementary streams carry no container
    timing; fps only sets the VPS timing hint, samplers take fps
    explicitly (same contract as a .h265 file fed to ffmpeg)."""
    x = _x265()
    if x is None:
        raise RuntimeError("system libx265 not present (or layout probe failed)")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.shape[0] < 1:
        raise ValueError(f"expected (N, H, W, 3) uint8 RGB, got {frames.shape}")
    n, h, w = frames.shape[:3]
    if h < 16 or w < 16:
        raise ValueError(f"x265 needs at least one 16x16 CTU, got {w}x{h}")
    import struct as _struct

    p = x.x265_param_alloc()
    enc = None
    pic = None
    try:
        if x.x265_param_default_preset(p, b"ultrafast", None) != 0:
            raise RuntimeError("x265 preset init failed")
        for k, v in ((b"input-res", f"{w}x{h}".encode()),
                     (b"fps", str(int(fps)).encode()),
                     (b"input-csp", b"i444"), (b"lossless", b"1"),
                     (b"bframes", b"0"), (b"ctu", b"16"),
                     (b"pools", b"1"), (b"frame-threads", b"1"),
                     (b"repeat-headers", b"0"), (b"annexb", b"1"),
                     (b"log-level", b"none")):
            if x.x265_param_parse(p, k, v) != 0:
                raise RuntimeError(f"x265 param {k.decode()}={v.decode()} rejected")
        enc = x.x265_encoder_open_199(p)
        if not enc:
            raise RuntimeError(f"x265 encoder open failed for {w}x{h}")
        pic = x.x265_picture_alloc()
        x.x265_picture_init(p, pic)
        out = bytearray()
        pn = ctypes.c_void_p()
        nn = ctypes.c_uint32()

        def emit():
            nals = ctypes.cast(pn, ctypes.POINTER(_X265Nal * nn.value)).contents
            for nal in nals:
                out.extend(ctypes.string_at(nal.payload, nal.sizeBytes))

        if x.x265_encoder_headers(enc, ctypes.byref(pn), ctypes.byref(nn)) < 0:
            raise RuntimeError("x265 header generation failed")
        emit()
        for i in range(n):
            chans = [np.ascontiguousarray(frames[i, :, :, c]) for c in range(3)]
            for c in range(3):
                ctypes.memmove(pic + x._pic_off_planes + 8 * c,
                               _struct.pack("<Q", chans[c].ctypes.data), 8)
                ctypes.memmove(pic + x._pic_off_stride + 4 * c,
                               _struct.pack("<i", w), 4)
            ctypes.memmove(pic, _struct.pack("<q", i), 8)   # pts
            r = x.x265_encoder_encode(enc, ctypes.byref(pn), ctypes.byref(nn),
                                      pic, None)
            if r < 0:
                raise RuntimeError(f"x265 encode failed at frame {i}")
            if r > 0:
                emit()
        while True:
            r = x.x265_encoder_encode(enc, ctypes.byref(pn), ctypes.byref(nn),
                                      None, None)
            if r < 0:
                raise RuntimeError("x265 flush failed")
            if r == 0:
                break
            emit()
        return bytes(out)
    finally:
        if pic:
            x.x265_picture_free(pic)
        if enc:
            x.x265_encoder_close(enc)
        x.x265_param_free(p)


def decode_hevc(payload: bytes) -> np.ndarray:
    """Annex-B H.265 elementary stream → (N, H, W, 3) uint8 via the
    system libde265, display order. Requires the encode_hevc contract
    (8-bit 4:4:4, channels = R/G/B); rejects other chroma formats loudly
    rather than silently up-sampling."""
    d = _de265()
    if d is None:
        raise RuntimeError("system libde265 not present")
    if not is_hevc_annexb(payload):
        raise ValueError("not an Annex-B H.265 elementary stream")
    ctx = d.de265_new_decoder()
    if not ctx:
        raise RuntimeError("de265 decoder alloc failed")
    try:
        if d.de265_push_data(ctx, payload, len(payload), 0, None) != 0:
            raise ValueError("de265 rejected the stream bytes")
        d.de265_flush_data(ctx)
        frames = []
        more = ctypes.c_int(1)
        stride = ctypes.c_int()
        while more.value:
            d.de265_decode(ctx, ctypes.byref(more))
            while True:
                img = d.de265_get_next_picture(ctx)
                if not img:
                    break
                if d.de265_get_chroma_format(img) != 3:   # de265_chroma_444
                    raise ValueError(
                        "only 4:4:4 streams decode here (encode_hevc "
                        "contract); got another chroma format")
                if d.de265_get_bits_per_pixel(img, 0) != 8:
                    raise ValueError("only 8-bit streams decode here")
                w = d.de265_get_image_width(img, 0)
                h = d.de265_get_image_height(img, 0)
                fr = np.empty((h, w, 3), np.uint8)
                for c in range(3):
                    pl = d.de265_get_image_plane(img, c, ctypes.byref(stride))
                    buf = ctypes.string_at(pl, stride.value * h)
                    fr[:, :, c] = np.frombuffer(buf, np.uint8).reshape(
                        h, stride.value)[:, :w]
                frames.append(fr)
        if not frames:
            raise ValueError("de265 produced no pictures (corrupt stream?)")
        return np.stack(frames)
    finally:
        d.de265_free_decoder(ctx)
