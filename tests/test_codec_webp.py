"""WebP-lossless (VP8L) codec vs the system libwebp (ctypes): decode
interop on libwebp-encoded streams (which exercise meta-Huffman,
LZ77, color cache, predictor/subtract-green/color-indexing transforms
and pixel bundling), encode interop (libwebp must decode our streams
pixel-exact), self round-trips, and the external python.png vector
carried across formats.

libwebp's encoder zeroes RGB under fully-transparent pixels by
default (alpha cleanup, exact=0), so decoder interop compares against
LIBWEBP'S OWN DECODE of the same stream — the bit-exact contract —
plus the original image wherever alpha is 255.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from org_revue_de_presse_trends_spark.functions import codecs
from org_revue_de_presse_trends_spark.functions.codec_webp import (
    decode_webp,
    encode_webp_lossless,
)

IMGHDR = "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata"


def _load_libwebp():
    for name in ("libwebp.so.7", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available"
)


def _lw_encode(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(img).tobytes(), w, h, w * 4,
        ctypes.byref(out),
    )
    assert n > 0
    data = bytes(
        bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n))
                  .contents)
    )
    _LIB.WebPFree(out)
    return data


def _lw_decode(data: bytes) -> np.ndarray | None:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 4
    arr = np.frombuffer(
        bytes(bytearray(ctypes.cast(p, ctypes.POINTER(ctypes.c_uint8 * n))
                        .contents)),
        dtype=np.uint8,
    ).reshape(h.value, w.value, 4)
    _LIB.WebPFree(p)
    return arr


def _vectors() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(7)
    v: dict[str, np.ndarray] = {}
    v["noise_alpha"] = rng.integers(0, 256, (23, 31, 4), dtype=np.uint8)
    grad = np.zeros((40, 56, 4), np.uint8)
    grad[..., 0] = np.arange(56)[None, :] * 4 % 256
    grad[..., 1] = np.arange(40)[:, None] * 6 % 256
    grad[..., 2] = 128
    grad[..., 3] = 255
    v["gradient"] = grad  # predictor transform territory
    pal = np.zeros((20, 37, 4), np.uint8)
    pal[..., 1] = (np.add.outer(np.arange(20), np.arange(37)) % 3) * 80
    pal[..., 3] = 255
    v["palette3"] = pal  # color-indexing + 2-bit pixel bundling
    bw = rng.integers(0, 2, (16, 50, 1), dtype=np.uint8) * 255
    v["palette2"] = np.dstack(
        [bw, bw, bw, np.full((16, 50, 1), 255, np.uint8)]
    )  # 1-bit bundling
    big = np.zeros((96, 128, 4), np.uint8)
    big[:48, :, 0] = rng.integers(0, 256, (48, 128))
    big[48:, :, 1] = (
        np.arange(128)[None, :] + np.arange(48)[:, None]
    ) % 256
    big[..., 2] = rng.integers(0, 16, (96, 128))
    big[..., 3] = 255
    v["mixed_big"] = big  # large: meta-Huffman + LZ77 + color cache
    return v


@needs_libwebp
@pytest.mark.parametrize("name", sorted(_vectors()))
def test_decoder_matches_libwebp_on_libwebp_streams(name):
    img = _vectors()[name]
    data = _lw_encode(img)
    mine = decode_webp(data)
    ref = _lw_decode(data)
    assert mine.shape == ref.shape
    assert (mine == ref).all(), f"{name}: diverges from libwebp decode"
    opaque = img[..., 3] == 255
    assert (mine[opaque] == img[opaque]).all()


@needs_libwebp
@pytest.mark.parametrize("name", sorted(_vectors()))
def test_libwebp_decodes_our_streams_exactly(name):
    img = _vectors()[name]
    back = _lw_decode(encode_webp_lossless(img))
    assert back is not None, f"{name}: libwebp rejected our stream"
    assert (back == img).all()


@pytest.mark.parametrize("name", sorted(_vectors()))
def test_self_roundtrip_exact(name):
    img = _vectors()[name]
    assert (decode_webp(encode_webp_lossless(img)) == img).all()


def test_rgb_input_gains_opaque_alpha():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(rgb))
    assert (out[..., :3] == rgb).all() and (out[..., 3] == 255).all()


@needs_libwebp
def test_external_png_vector_across_formats():
    """The imghdrdata python.png (PSF test vector) carried through
    webp in both directions must stay pixel-identical."""
    import os

    path = f"{IMGHDR}/python.png"
    if not os.path.exists(path):
        pytest.skip("imghdrdata vector not present")
    img = codecs.decode_png(open(path, "rb").read())
    if img.shape[2] == 3:
        img = np.dstack(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)]
        )
    data = _lw_encode(img)
    mine = decode_webp(data)
    assert (mine == _lw_decode(data)).all()
    opaque = img[..., 3] == 255
    assert (mine[opaque] == img[opaque]).all()
    assert (_lw_decode(encode_webp_lossless(img)) == img).all()


def test_decode_image_dispatches_vp8l_natively():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    data = encode_webp_lossless(img)
    assert codecs.sniff_format(data) == "webp"
    out = codecs.decode_image(data)
    assert (out[..., :3] == img).all()


def test_lossy_vp8_decodes_natively():
    # r8b flipped this boundary: lossy VP8 (+ ALPH alpha) now decodes
    # through codec_vp8; full interop matrix in tests/test_codec_vp8.py
    import os

    path = f"{IMGHDR}/python.webp"
    if not os.path.exists(path):
        pytest.skip("imghdrdata vector not present")
    payload = open(path, "rb").read()
    assert codecs.sniff_format(payload) == "webp"
    out = decode_webp(payload)
    assert out.shape == (16, 16, 4)


def _simple_const_code(bw, value: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if value > 1:
        bw.write(1, 1)
        bw.write(value, 8)
    else:
        bw.write(0, 1)
        bw.write(value, 1)


def _build_out_of_range_palette_stream() -> bytes:
    """Hand-built 1x1 VP8L stream: a 17-color all-zero palette whose
    single pixel carries index 200 — RFC 9649 decodes out-of-range
    indices as transparent black, never an error."""
    import struct

    from org_revue_de_presse_trends_spark.functions.codec_webp import (
        _LsbWriter,
    )

    bw = _LsbWriter()
    bw.write(0, 14)  # w-1
    bw.write(0, 14)  # h-1
    bw.write(0, 1)   # alpha hint
    bw.write(0, 3)   # version
    bw.write(1, 1)   # transform present
    bw.write(3, 2)   # color indexing
    bw.write(16, 8)  # 17 colors -> wbits 0 (no bundling)
    # palette sub-image (17x1): no cache; five const codes; 17 pixels
    # of zero bits each (all deltas zero -> all palette entries 0)
    bw.write(0, 1)
    for _ in range(5):  # green/red/blue/alpha/distance const codes
        _simple_const_code(bw, 0)
    bw.write(0, 1)  # transform loop terminator
    # main image (1x1): no cache, no meta; green const 200, rest 0
    bw.write(0, 1)
    bw.write(0, 1)
    _simple_const_code(bw, 200)
    for _ in range(4):  # red/blue/alpha/distance const codes
        _simple_const_code(bw, 0)
    body = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_out_of_range_palette_index_decodes_transparent_black():
    data = _build_out_of_range_palette_stream()
    mine = decode_webp(data)
    assert mine.shape == (1, 1, 4)
    assert mine.tolist() == [[[0, 0, 0, 0]]]
    if _LIB is not None:
        ref = _lw_decode(data)
        assert ref is not None and (mine == ref).all()


def test_malformed_inputs_raise_value_error():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVExxxx")
    with pytest.raises(ValueError):
        decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8L\x04\x00\x00\x00\x00\x00\x00\x00"
        )  # bad signature byte
    good = encode_webp_lossless(
        np.zeros((4, 4, 3), dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        decode_webp(good[:-3])  # truncated bitstream
