"""Minimal VP8 intra encoder vs the system libwebp + our own decoder.

Claim pattern (mirrors the VP8L minimal encoder): our streams must be
(a) accepted and decoded by the system libwebp, (b) decoded
bit-identically by ``codec_vp8`` (two independent decoders agreeing on
every stream is the strongest validity check available without a
reference conformance suite), and (c) faithful to the source within
the quantizer's dequantization step (pinned as PSNR floors).
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from org_revue_de_presse_trends_spark.functions import codec_vp8
from org_revue_de_presse_trends_spark.functions.codec_vp8_enc import (
    encode_vp8,
    encode_webp_lossy,
    rgb_to_yuv420,
)

from test_codec_vp8 import _LIB, _lw_decode_yuv, _lw_decode_rgba, _vectors

needs_libwebp = pytest.mark.skipif(_LIB is None,
                                   reason="system libwebp not available")

_VEC = _vectors()


def _chunk(data: bytes) -> bytes:
    assert data[12:16] == b"VP8 "
    return data[20:20 + struct.unpack("<I", data[16:20])[0]]


def _psnr(a, b) -> float:
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


@needs_libwebp
@pytest.mark.parametrize("name", sorted(_VEC))
def test_libwebp_and_our_decoder_agree_on_our_streams(name):
    img = _VEC[name]
    for qi in (0, 20, 60):
        data = encode_webp_lossy(img, qi=qi)
        ly, lu, lv = _lw_decode_yuv(data)
        my, mu, mv = codec_vp8.decode_vp8_planes(_chunk(data))
        for nm, a, b in (("Y", ly, my), ("U", lu, mu), ("V", lv, mv)):
            assert np.array_equal(a, b), f"{name} qi{qi} {nm}"


@needs_libwebp
@pytest.mark.parametrize("name", ["grad_48x48", "waves_97x65",
                                  "noise_160x112"])
def test_reconstruction_fidelity_floor(name):
    img = _VEC[name]
    ey, _, _ = rgb_to_yuv420(img)
    for qi, floor in ((0, 45.0), (20, 36.0), (60, 27.0)):
        my, _, _ = codec_vp8.decode_vp8_planes(
            _chunk(encode_webp_lossy(img, qi=qi)))
        got = _psnr(ey, my)
        assert got >= floor, f"{name} qi{qi}: PSNR {got:.1f} < {floor}"


@needs_libwebp
def test_flat_regions_become_skip_macroblocks():
    img = np.full((64, 96, 3), 120, np.uint8)
    img[20:28, 40:56] = 250
    data = encode_webp_lossy(img, qi=10)
    chunk = _chunk(data)
    hdr, bd, parts = codec_vp8._parse_frame_header(chunk)
    segs, skips, *_ = codec_vp8._parse_modes(bd, hdr, 6, 4)
    assert hdr["use_skip"] == 1
    assert skips.sum() >= 15          # most of the 24 MBs are flat
    ly, _, _ = _lw_decode_yuv(data)
    my, _, _ = codec_vp8.decode_vp8_planes(chunk)
    assert np.array_equal(ly, my)


@needs_libwebp
def test_rgba_path_on_our_streams():
    data = encode_webp_lossy(_VEC["grad_48x48"], qi=4)
    assert np.array_equal(_lw_decode_rgba(data),
                          codec_vp8.decode_vp8_rgba(_chunk(data)))


def test_encoder_validates_inputs():
    y = np.zeros((16, 16), np.uint8)
    u = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="qi"):
        encode_vp8(y, u, u, qi=128)
    with pytest.raises(ValueError, match="chroma"):
        encode_vp8(y, np.zeros((4, 4), np.uint8), u)


@needs_libwebp
def test_composes_with_webm_mux_demux():
    """Fully self-made video: our VP8 frames, our WebM mux, our demux,
    our decode — with libwebp agreeing on every frame payload."""
    from org_revue_de_presse_trends_spark.functions import codecs
    from org_revue_de_presse_trends_spark.functions import container_webm

    frames = []
    for i in range(5):
        img = np.roll(_VEC["grad_48x48"], i * 7, axis=1)
        frames.append(_chunk(encode_webp_lossy(img, qi=8)))
    webm = container_webm.mux_webm_vp8(frames, 48, 48,
                                       frame_duration_ms=100)
    samples = codecs.extract_video_frames(webm, every_ms=100,
                                          duration_ms=500)
    assert [ts for ts, _ in samples] == [0, 100, 200, 300, 400]
    for i, (ts, png) in enumerate(samples):
        ours = codecs.decode_image(png)
        riff_body = b"WEBP" + b"VP8 " \
            + struct.pack("<I", len(frames[i])) + frames[i] \
            + (b"\x00" if len(frames[i]) & 1 else b"")
        via_lib = _lw_decode_rgba(
            b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)
        assert np.array_equal(ours, via_lib), ts


def test_fdct_fwht_bit_pinned_across_hosts():
    """The forward DCT/WHT are order-pinned IEEE expression trees over
    a FROZEN literal basis (no BLAS, no libm at import) — the r11 fix
    for the video golden flipping with the sandbox host's FP
    microarchitecture (BLAS reassociation + np.cos SIMD dispatch, with
    133/288 fixture coefficients on exact round-half quantizer ties).
    These exact doubles must reproduce on EVERY host; a drift here
    means someone reintroduced a reassociating kernel."""
    from org_revue_de_presse_trends_spark.functions.codec_vp8_enc import (
        _DCT_C, _fdct4x4, _fwht4x4,
    )

    assert _DCT_C[0, 0] == 0.5 and _DCT_C[2, 1] == -0.5
    assert _DCT_C[1, 0] == 0.6532814824381883
    assert _DCT_C[3, 0] == 0.27059805007309845
    b = np.array([[7., -12., 31., 0.],
                  [-3., 5., -8., 19.],
                  [22., -7., 4., -11.],
                  [1., 13., -2., 6.]])
    f = _fdct4x4(b)
    want_f = [
        [32.5, 1.4571099697958907, 8.5, 20.50309319434318],
        [6.579242109871001, -26.194173824159222,
         -3.8732616091400187, 37.20889244992066],
        [11.5, -13.997474844136647, -24.5, 17.163062022487765],
        [-1.1016230116061507, 34.208892449920654,
         -5.431191812775726, 62.194173824159215],
    ]
    assert f.tolist() == want_f
    want_w = [
        [78.3583704593403, -33.406397609654775,
         108.18847012983537, -54.18520478299119],
        [-1.6774681687088062, -14.590148169961374,
         8.713083087802822, 64.91626349382167],
        [74.47208415449677, 14.7047018120385,
         -32.82763672987995, -29.710879479609623],
        [-25.232580116850116, 43.19987751848307,
         2.018049961336331, 57.059414440501],
    ]
    assert _fwht4x4(f).tolist() == want_w
