"""Lossy-WebP (VP8 key frame) codec vs the system libwebp (ctypes).

Evidence layers (the codec-claim pattern set by test_codec_webp.py —
the system libwebp.so.7 is the interop oracle for ANY codec claim):

1. YUV plane interop: ``decode_vp8_planes`` must be BIT-EXACT against
   ``WebPDecodeYUV`` on libwebp-encoded streams across content types,
   sizes (incl. non-multiple-of-16) and qualities.
2. RGBA interop: ``decode_vp8_rgba`` must be BYTE-EXACT against
   ``WebPDecodeRGBA`` (fancy chroma upsampler + fixed-point YUV->RGB).
3. Feature-path coverage via libwebp's advanced encoder API (WebPConfig
   + WebPPicture over ctypes): simple loop filter, sharpness,
   2/4/8 token partitions, skip MBs, segment counts, and the ALPH
   alpha chunk in raw + lossless compression with every filter mode.
4. The large spec tables in codec_vp8.py were lifted from libwebp's
   data section; tests re-locate them by content signature and assert
   byte equality (kf-bmode via the documented enum-order permutation).
5. External ground truth: imghdrdata's python.webp (VP8X+ALPH+VP8)
   must decode byte-identically to libwebp through decode_image.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct

import numpy as np
import pytest

from org_revue_de_presse_trends_spark.functions import codec_vp8, codecs
from org_revue_de_presse_trends_spark.functions.codec_webp import decode_webp

IMGHDR = "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata"
SO_CANDIDATES = ("libwebp.so.7", "/lib/x86_64-linux-gnu/libwebp.so.7")


# ---------------------------------------------------------------------------
# libwebp via ctypes: simple + advanced encoder, YUV/RGBA decoders
# ---------------------------------------------------------------------------

class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class _WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)),
        ("argb_stride", ctypes.c_int), ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.POINTER(ctypes.c_uint8)),
        ("pad5", ctypes.POINTER(ctypes.c_uint8)),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def _load_libwebp():
    for name in SO_CANDIDATES + (ctypes.util.find_library("webp"),):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        lib.WebPConfigInitInternal.restype = ctypes.c_int
        lib.WebPConfigInitInternal.argtypes = [
            ctypes.POINTER(_WebPConfig), ctypes.c_int, ctypes.c_float,
            ctypes.c_int]
        lib.WebPPictureInitInternal.restype = ctypes.c_int
        lib.WebPPictureInitInternal.argtypes = [
            ctypes.POINTER(_WebPPicture), ctypes.c_int]
        lib.WebPPictureImportRGB.restype = ctypes.c_int
        lib.WebPPictureImportRGB.argtypes = [
            ctypes.POINTER(_WebPPicture), ctypes.c_char_p, ctypes.c_int]
        lib.WebPPictureImportRGBA.restype = ctypes.c_int
        lib.WebPPictureImportRGBA.argtypes = [
            ctypes.POINTER(_WebPPicture), ctypes.c_char_p, ctypes.c_int]
        lib.WebPEncode.restype = ctypes.c_int
        lib.WebPEncode.argtypes = [ctypes.POINTER(_WebPConfig),
                                   ctypes.POINTER(_WebPPicture)]
        lib.WebPPictureFree.argtypes = [ctypes.POINTER(_WebPPicture)]
        lib.WebPMemoryWriterInit.argtypes = [
            ctypes.POINTER(_WebPMemoryWriter)]
        lib.WebPMemoryWriterClear.argtypes = [
            ctypes.POINTER(_WebPMemoryWriter)]
        lib.WebPMemoryWrite.restype = ctypes.c_int
        lib.WebPMemoryWrite.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None,
                                   reason="system libwebp not available")


def _enc_abi():
    # WebPConfigInitInternal only checks the major ABI version
    for ver in range(0x0200, 0x0210):
        cfg = _WebPConfig()
        if _LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0, 75.0, ver):
            return ver
    return None


_ABI = _enc_abi() if _LIB is not None else None


def _lw_encode_rgb(img: np.ndarray, quality: float) -> bytes:
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(img.tobytes(), w, h, w * 3, float(quality),
                           ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(ctypes.cast(
        out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    _LIB.WebPFree(out)
    return data


def _lw_encode_advanced(img: np.ndarray, **opts) -> bytes:
    """Advanced-API encode; img is (H,W,3) RGB or (H,W,4) RGBA."""
    assert _ABI is not None
    h, w, ch = img.shape
    cfg = _WebPConfig()
    assert _LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0, 75.0, _ABI)
    for k, v in opts.items():
        setattr(cfg, k, v)
    pic = _WebPPicture()
    assert _LIB.WebPPictureInitInternal(ctypes.byref(pic), _ABI)
    pic.width, pic.height = w, h
    if ch == 3:
        assert _LIB.WebPPictureImportRGB(ctypes.byref(pic), img.tobytes(),
                                         w * 3)
    else:
        assert _LIB.WebPPictureImportRGBA(ctypes.byref(pic), img.tobytes(),
                                          w * 4)
    wr = _WebPMemoryWriter()
    _LIB.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(_LIB.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = _LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    _LIB.WebPPictureFree(ctypes.byref(pic))
    if not ok:
        _LIB.WebPMemoryWriterClear(ctypes.byref(wr))
        raise AssertionError(f"WebPEncode failed ({err})")
    data = bytes(bytearray(ctypes.cast(
        wr.mem, ctypes.POINTER(ctypes.c_uint8 * wr.size)).contents))
    _LIB.WebPMemoryWriterClear(ctypes.byref(wr))
    return data


def _lw_decode_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(up), ctypes.byref(vp),
                            ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    uw, uh = (W + 1) // 2, (H + 1) // 2
    base = ctypes.cast(yp, ctypes.c_void_p).value
    off_u = ctypes.cast(up, ctypes.c_void_p).value - base
    off_v = ctypes.cast(vp, ctypes.c_void_p).value - base
    total = max(S * H, off_u + US * uh, off_v + US * uh)
    buf = bytes(bytearray(ctypes.cast(
        yp, ctypes.POINTER(ctypes.c_uint8 * total)).contents))
    _LIB.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    y = np.frombuffer(buf[:S * H], np.uint8).reshape(H, S)[:, :W].copy()
    u = np.frombuffer(buf[off_u:off_u + US * uh],
                      np.uint8).reshape(uh, US)[:, :uw].copy()
    v = np.frombuffer(buf[off_v:off_v + US * uh],
                      np.uint8).reshape(uh, US)[:, :uw].copy()
    return y, u, v


def _lw_decode_rgba(data: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    n = w.value * h.value * 4
    arr = np.frombuffer(bytearray(ctypes.cast(
        p, ctypes.POINTER(ctypes.c_uint8 * n)).contents),
        np.uint8).reshape(h.value, w.value, 4).copy()
    _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


def _vp8_chunk(data: bytes) -> bytes:
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    i = 12
    while i + 8 <= len(data):
        tag = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        if tag == b"VP8 ":
            return data[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------------------
# deterministic content vectors
# ---------------------------------------------------------------------------

def _vectors() -> dict[str, np.ndarray]:
    out = {}
    rng = np.random.default_rng(42)
    for (w, h) in [(48, 48), (97, 65), (160, 112), (33, 17), (16, 16)]:
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        out[f"grad_{w}x{h}"] = np.stack([
            xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1)], axis=-1).astype(np.uint8)
        out[f"waves_{w}x{h}"] = np.stack([
            (127 + 120 * np.sin(xx / 5.0)).astype(np.uint8),
            (127 + 120 * np.cos(yy / 7.0)).astype(np.uint8),
            (127 + 120 * np.sin((xx + 2 * yy) / 11.0)).astype(np.uint8),
        ], axis=-1)
        blocks = ((xx // 8 + yy // 8) % 2 * 255).astype(np.uint8)
        out[f"checker_{w}x{h}"] = np.stack(
            [blocks, 255 - blocks, blocks], axis=-1)
        noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(int)
        noise = (noise + np.roll(noise, 1, 0) + np.roll(noise, 1, 1)
                 + np.roll(noise, (1, 1), (0, 1))) // 4
        out[f"noise_{w}x{h}"] = noise.astype(np.uint8)
    return out


_VEC = _vectors()
_QUALITIES = (10.0, 50.0, 75.0, 95.0)


def _assert_planes_equal(data: bytes, chunk: bytes, label: str):
    ly, lu, lv = _lw_decode_yuv(data)
    my, mu, mv = codec_vp8.decode_vp8_planes(chunk)
    for nm, a, b in (("Y", ly, my), ("U", lu, mu), ("V", lv, mv)):
        assert np.array_equal(a, b), (
            f"{label}: {nm} plane differs "
            f"(max {np.abs(a.astype(int) - b.astype(int)).max()})")


# ---------------------------------------------------------------------------
# 1. YUV interop matrix (simple encoder API)
# ---------------------------------------------------------------------------

@needs_libwebp
@pytest.mark.parametrize("name", sorted(_VEC))
def test_yuv_planes_match_libwebp(name):
    img = _VEC[name]
    for q in _QUALITIES:
        data = _lw_encode_rgb(img, q)
        _assert_planes_equal(data, _vp8_chunk(data), f"{name} q{q}")


# ---------------------------------------------------------------------------
# 2. RGBA interop (fancy upsampler + fixed-point conversion)
# ---------------------------------------------------------------------------

@needs_libwebp
@pytest.mark.parametrize("name", sorted(_VEC))
def test_rgba_matches_libwebp(name):
    for q in (10.0, 75.0):
        data = _lw_encode_rgb(_VEC[name], q)
        assert np.array_equal(_lw_decode_rgba(data),
                              codec_vp8.decode_vp8_rgba(_vp8_chunk(data))), \
            f"{name} q{q}: RGBA differs"


# ---------------------------------------------------------------------------
# 3. feature paths via the advanced encoder API
# ---------------------------------------------------------------------------

_FLAT = np.full((128, 192, 3), 90, np.uint8)
_FLAT[40:48, 60:76] = 230

_ADV_CASES = {
    # label: (vector, encoder opts, header predicate)
    "simple_filter": ("waves_160x112",
                      dict(filter_type=0, filter_strength=80, quality=40.0),
                      lambda h, parts, skips: h["filter_simple"] == 1),
    "sharpness_3": ("waves_160x112",
                    dict(filter_sharpness=3, filter_strength=70,
                         quality=40.0),
                    lambda h, parts, skips: h["filter_sharpness"] == 3),
    "sharpness_7": ("noise_97x65",
                    dict(filter_sharpness=7, filter_strength=90,
                         quality=30.0),
                    lambda h, parts, skips: h["filter_sharpness"] == 7),
    # only encoder methods 0/1 emit multiple token partitions
    "partitions_2": ("grad_97x65", dict(partitions=1, method=0, quality=75.0),
                     lambda h, parts, skips: len(parts) == 2),
    "partitions_4": ("checker_160x112",
                     dict(partitions=2, method=0, quality=50.0),
                     lambda h, parts, skips: len(parts) == 4),
    "partitions_8": ("noise_160x112",
                     dict(partitions=3, method=1, quality=60.0),
                     lambda h, parts, skips: len(parts) == 8),
    "skip_mbs": ("__flat__", dict(method=0, quality=75.0),
                 lambda h, parts, skips: h["use_skip"] and skips.sum() > 0),
    "segments_1": ("grad_160x112", dict(segments=1, quality=50.0),
                   lambda h, parts, skips: True),
    "segments_2": ("noise_160x112",
                   dict(segments=2, method=6, quality=50.0),
                   lambda h, parts, skips: True),
    "combined": ("noise_160x112",
                 dict(filter_type=0, filter_sharpness=5, filter_strength=100,
                      partitions=3, method=0, quality=20.0),
                 lambda h, parts, skips: h["filter_simple"] == 1
                 and len(parts) == 8),
}


@needs_libwebp
@pytest.mark.parametrize("case", sorted(_ADV_CASES))
def test_advanced_feature_paths(case):
    if _ABI is None:
        pytest.skip("no usable encoder ABI")
    vec, opts, pred = _ADV_CASES[case]
    img = _FLAT if vec == "__flat__" else _VEC[vec]
    data = _lw_encode_advanced(img, **opts)
    chunk = _vp8_chunk(data)
    hdr, bd, parts = codec_vp8._parse_frame_header(chunk)
    mw = (hdr["width"] + 15) // 16
    mh = (hdr["height"] + 15) // 16
    segs, skips, *_ = codec_vp8._parse_modes(bd, hdr, mw, mh)
    if not pred(hdr, parts, skips):
        pytest.skip(f"libwebp no longer emits the {case} feature here")
    _assert_planes_equal(data, chunk, case)


# ---------------------------------------------------------------------------
# 4. ALPH chunk: raw + lossless compression, all filter modes
# ---------------------------------------------------------------------------

def _alpha_image(mask: bool) -> np.ndarray:
    rng = np.random.default_rng(3)
    h, w = 41, 57
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    if mask:
        img[..., 3] = (((xx + yy) % 7 < 3) * 255).astype(np.uint8)
    else:
        img[..., 3] = (xx * 255 // (w - 1)).astype(np.uint8)
    return img


@needs_libwebp
@pytest.mark.parametrize("mask", [False, True])
@pytest.mark.parametrize("opts", [
    dict(alpha_compression=0),
    dict(alpha_compression=1, alpha_filtering=0),
    dict(alpha_compression=1, alpha_filtering=1),
    dict(alpha_compression=1, alpha_filtering=2, method=6),
    dict(alpha_compression=1, alpha_quality=40),
], ids=["raw", "lossless_f0", "lossless_f1", "lossless_f2", "quality40"])
def test_alpha_chunk_matches_libwebp(mask, opts):
    if _ABI is None:
        pytest.skip("no usable encoder ABI")
    data = _lw_encode_advanced(_alpha_image(mask), **opts)
    assert np.array_equal(_lw_decode_rgba(data), decode_webp(data))


# ---------------------------------------------------------------------------
# 5. lifted tables match the system libwebp byte-for-byte
# ---------------------------------------------------------------------------

@needs_libwebp
def test_lifted_tables_match_system_libwebp():
    path = next((p for p in SO_CANDIDATES if os.path.exists(p)), None)
    if path is None:
        pytest.skip("libwebp shared object not found on disk")
    blob = open(path, "rb").read()

    # ac table: uint16[128], monotone, starts 4..11
    pat = struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11)
    i = blob.find(pat)
    found_ac = None
    while i != -1:
        vals = struct.unpack_from("<128H", blob, i)
        if all(vals[j] <= vals[j + 1] for j in range(127)):
            found_ac = vals
            break
        i = blob.find(pat, i + 1)
    assert found_ac == codec_vp8.AC_QLOOKUP

    # dc table: uint8[128], monotone, starts 4,5,6,7,8,9,10,10
    pat = bytes([4, 5, 6, 7, 8, 9, 10, 10])
    i = blob.find(pat)
    found_dc = None
    while i != -1:
        vals = tuple(blob[i:i + 128])
        if all(vals[j] <= vals[j + 1] for j in range(127)):
            found_dc = vals
            break
        i = blob.find(pat, i + 1)
    assert found_dc == codec_vp8.DC_QLOOKUP

    # kf-bmode probs: anchored by the spec's [0][0] row; the module
    # stores it with both axes permuted from libwebp enum order to
    # RFC 6386 enum order
    anchor = bytes(codec_vp8.KF_BMODE_PROBS[0][0])
    i = blob.find(anchor)
    assert i != -1
    raw = blob[i:i + 900]
    perm = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
    for a in range(10):
        for l in range(10):
            row = raw[(perm[a] * 10 + perm[l]) * 9:][:9]
            assert tuple(row) == codec_vp8.KF_BMODE_PROBS[a][l], (a, l)

    # default + update coefficient probabilities: located by flattening
    # the module tables and searching for them verbatim
    flat = bytes(p for t in codec_vp8.COEFF_PROBS for b in t
                 for c in b for p in c)
    assert len(flat) == 1056 and blob.find(flat) != -1
    flat_u = bytes(p for t in codec_vp8.COEFF_UPDATE_PROBS for b in t
                   for c in b for p in c)
    assert len(flat_u) == 1056 and blob.find(flat_u) != -1


# ---------------------------------------------------------------------------
# 6. external ground truth + dispatch + malformed input
# ---------------------------------------------------------------------------

@needs_libwebp
def test_external_python_webp_decodes_natively():
    path = f"{IMGHDR}/python.webp"
    if not os.path.exists(path):
        pytest.skip("imghdrdata vector not present")
    data = open(path, "rb").read()
    assert codecs.sniff_format(data) == "webp"
    ours = codecs.decode_image(data)           # VP8X + ALPH + VP8
    assert np.array_equal(ours, _lw_decode_rgba(data))
    # the alpha plane is real (the logo has transparent corners)
    assert ours[..., 3].min() < 128 < int(ours[..., 3].max())


@needs_libwebp
def test_decode_image_dispatches_lossy_webp():
    data = _lw_encode_rgb(_VEC["grad_48x48"], 75.0)
    out = codecs.decode_image(data)
    assert out.shape == (48, 48, 4)
    assert np.array_equal(out, _lw_decode_rgba(data))


def test_malformed_inputs_raise_value_error():
    with pytest.raises(ValueError):
        codec_vp8.decode_vp8_planes(b"\x00\x00")          # truncated
    # valid-looking tag but interframe bit set
    tag = struct.pack("<I", 1 | (0 << 5))[:3]
    with pytest.raises(ValueError):
        codec_vp8.decode_vp8_planes(tag + b"\x9d\x01\x2a" + b"\x00" * 8)
    # bad start code
    with pytest.raises(ValueError):
        codec_vp8.decode_vp8_planes(b"\x00\x00\x00" + b"\xff\x01\x2a"
                                    + b"\x00" * 8)
    # zero dimensions
    with pytest.raises(ValueError):
        codec_vp8.decode_vp8_planes(
            b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + struct.pack("<HH", 0, 0) + b"\x00" * 4)
    # first partition overruns the frame
    big = (1000 << 5).to_bytes(3, "little")
    with pytest.raises(ValueError):
        codec_vp8.decode_vp8_planes(
            big + b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16) + b"\x00" * 4)


@needs_libwebp
def test_truncated_real_stream_still_terminates():
    # the bool decoder reads virtual zero bytes past the end (spec
    # behavior), so a truncated stream decodes deterministically
    # instead of hanging or crashing
    data = _lw_encode_rgb(_VEC["waves_48x48"], 75.0)
    chunk = _vp8_chunk(data)
    try:
        out = codec_vp8.decode_vp8_planes(chunk[:len(chunk) // 2])
        assert out[0].shape == (48, 48)
    except ValueError:
        pass  # header-level truncation is also acceptable


def test_mutated_lossy_webp_raises_value_error_or_decodes():
    """Deterministic byte-mutation fuzz: a corrupted lossy-WebP either
    decodes (VP8 tolerates bool-stream damage by design — reads past
    the end yield zeros) or raises ValueError — never another
    exception class, never a hang.  Seeded, so green means green on
    any machine (the r7 hypothesis lesson)."""
    if _LIB is None:
        pytest.skip("system libwebp not available")
    rng = np.random.default_rng(1234)
    base = bytearray(_lw_encode_rgb(_VEC["waves_16x16"], 60.0))
    for _ in range(80):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            kind = rng.integers(0, 3)
            if kind == 0:      # flip a byte anywhere
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
            elif kind == 1:    # truncate
                data = data[:int(rng.integers(12, len(data)))]
            else:              # splice garbage into the stream body
                at = int(rng.integers(20, max(len(data), 21)))
                data = (data[:at]
                        + bytes(rng.integers(0, 256, 8, dtype=np.uint8))
                        + data[at:])
        try:
            out = codecs.decode_image(bytes(data))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass


def test_mutated_webm_raises_value_error_or_decodes():
    """Same invariant for the WebM demux + native VP8 sampling path."""
    if _LIB is None:
        pytest.skip("system libwebp not available")
    from org_revue_de_presse_trends_spark.functions.container_webm import (
        mux_webm_vp8,
    )

    rng = np.random.default_rng(99)
    frames = [_vp8_chunk(_lw_encode_rgb(
        np.roll(_VEC["grad_16x16"], k, axis=0), 60.0)) for k in range(3)]
    base = bytearray(mux_webm_vp8(frames, 16, 16, frame_duration_ms=100))
    for _ in range(80):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            if rng.integers(0, 2) == 0:
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
            else:
                data = data[:int(rng.integers(4, len(data)))]
        try:
            out = codecs.extract_video_frames(bytes(data), 100, 300)
            assert all(isinstance(ts, int) for ts, _ in out)
        except (ValueError, NotImplementedError):
            pass
