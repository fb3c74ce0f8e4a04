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


# ---------------------------------------------------------------------------
# animated WebP (ANIM/ANMF): composition over lossless frames is exact
# ---------------------------------------------------------------------------

def _ref_over(dst, src):
    """Independent integer alpha-over (same spec math, reimplemented)."""
    sa = src[..., 3].astype(np.int64)
    da = dst[..., 3].astype(np.int64)
    df = da * (255 - sa) // 255
    oa = sa + df
    oc = (src[..., :3].astype(np.int64) * sa[..., None]
          + dst[..., :3].astype(np.int64) * df[..., None])
    oc = oc // np.maximum(oa, 1)[..., None]
    out = np.empty_like(dst)
    out[..., :3] = oc.astype(np.uint8)
    out[..., 3] = oa.astype(np.uint8)
    return out


def test_anim_composition_matches_independent_reference():
    """Frames are LOSSLESS (our VP8L encoder, interop-pinned), so the
    composed canvases are exactly computable: re-implement the spec
    composition (transparent canvas, alpha-over or replace,
    dispose-to-background) independently in numpy and require
    equality, including a planted semi-transparent blend."""
    from org_revue_de_presse_trends_spark.functions.codec_webp import (
        decode_webp_anim,
        mux_webp_anim,
    )

    rng = np.random.default_rng(7)
    f0 = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
    f0[..., 3] = 255                                   # opaque base
    f1 = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    f1[..., 3] = 128                                   # translucent tile
    f2 = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    f2[..., 3] = 255
    anim = mux_webp_anim([
        (encode_webp_lossless(f0), 0, 0, 100, True, False),
        (encode_webp_lossless(f1), 4, 6, 50, True, False),   # blended
        (encode_webp_lossless(f2), 20, 2, 50, False, True),  # replace+dispose
        (encode_webp_lossless(f2), 0, 0, 50, True, False),
    ], canvas_w=32, canvas_h=24, loop_count=3)

    loop, frames = decode_webp_anim(anim)
    assert loop == 3
    assert [d for d, _ in frames] == [100, 50, 50, 50]

    # independent composition
    canvas = np.zeros((24, 32, 4), dtype=np.uint8)
    canvas = _ref_over(canvas, f0)
    assert np.array_equal(frames[0][1], canvas)
    canvas[6:16, 4:16] = _ref_over(canvas[6:16, 4:16], f1)
    assert np.array_equal(frames[1][1], canvas)
    c2 = canvas.copy()
    c2[2:10, 20:28] = f2                               # no blend
    assert np.array_equal(frames[2][1], c2)
    c3 = c2.copy()
    c3[2:10, 20:28] = 0                                # disposed
    c3[0:8, 0:8] = _ref_over(c3[0:8, 0:8], f2)
    assert np.array_equal(frames[3][1], c3)

    # decode_webp / decode_image return the first composed frame
    assert np.array_equal(decode_webp(anim), frames[0][1])
    assert np.array_equal(codecs.decode_image(anim), frames[0][1])


def test_anim_with_lossy_vp8_frame():
    """An ANMF may carry a lossy VP8 still; the tile decode is the
    interop-pinned codec_vp8 path."""
    import test_codec_vp8 as tv

    if tv._LIB is None:
        pytest.skip("system libwebp not available")
    from org_revue_de_presse_trends_spark.functions.codec_webp import (
        decode_webp_anim,
        mux_webp_anim,
    )

    img = tv._vectors()["grad_16x16"]
    still = tv._lw_encode_rgb(img, 75.0)
    expect = tv._lw_decode_rgba(still)
    anim = mux_webp_anim([(still, 0, 0, 40, True, False)],
                         canvas_w=16, canvas_h=16)
    _, frames = decode_webp_anim(anim)
    assert np.array_equal(frames[0][1], expect)


def test_anim_malformed_raise():
    from org_revue_de_presse_trends_spark.functions.codec_webp import (
        decode_webp_anim,
        mux_webp_anim,
    )

    with pytest.raises(ValueError):
        decode_webp_anim(b"RIFF\x00\x00\x00\x00WEBP")  # no ANIM
    img = np.zeros((8, 8, 4), dtype=np.uint8)
    anim = mux_webp_anim(
        [(encode_webp_lossless(img), 0, 0, 10, True, False)],
        canvas_w=8, canvas_h=8)
    # frame exceeding the canvas
    big = mux_webp_anim(
        [(encode_webp_lossless(np.zeros((16, 16, 4), np.uint8)),
          4, 4, 10, True, False)], canvas_w=8, canvas_h=8)
    with pytest.raises(ValueError, match="canvas"):
        decode_webp_anim(big)
    # truncated ANMF header
    i = anim.index(b"ANMF")
    broken = anim[:i] + b"ANMF" + (8).to_bytes(4, "little") + b"\x00" * 8
    with pytest.raises(ValueError):
        decode_webp_anim(broken)


def test_truncated_trailing_metadata_still_decodes():
    """Review-caught interop rule: libwebp decodes a file whose image
    chunk is intact but whose trailing metadata chunk is cut off —
    decode_webp must too (lazy chunk walk, no full-container scan)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    data = encode_webp_lossless(img)
    # append an EXIF chunk whose declared size overruns the file
    import struct as _struct

    bad_tail = b"EXIF" + _struct.pack("<I", 1000) + b"\x00" * 10
    truncated = data[:4] + _struct.pack(
        "<I", len(data) - 8 + len(bad_tail)) + data[8:] + bad_tail
    out = decode_webp(truncated)
    assert (out == img).all()


def test_anim_first_frame_path_skips_the_tail():
    """decode_webp on an animation decodes ONLY the first frame: a
    malformed second ANMF (or truncated tail) must not matter, and
    the work is O(frame 1), not O(all frames)."""
    from org_revue_de_presse_trends_spark.functions.codec_webp import (
        mux_webp_anim,
    )

    rng = np.random.default_rng(22)
    f0 = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    anim = mux_webp_anim(
        [(encode_webp_lossless(f0), 0, 0, 10, True, False)] * 3,
        canvas_w=8, canvas_h=8)
    # corrupt everything after the first ANMF body ends
    second = anim.index(b"ANMF", anim.index(b"ANMF") + 4)
    broken = bytearray(anim)
    broken[second + 4:second + 8] = (10 ** 6).to_bytes(4, "little")
    first = decode_webp(bytes(broken))
    _, frames = __import__(
        "org_revue_de_presse_trends_spark.functions.codec_webp",
        fromlist=["decode_webp_anim"],
    ).decode_webp_anim(anim)
    assert np.array_equal(first, frames[0][1])
