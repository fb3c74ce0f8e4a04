"""ISO-BMFF (MP4) demuxer/muxer + native VP8-in-MP4 ('vp08') decode.

Same evidence pattern as test_container_webm: the container layer's
oracle is the byte-exact mux→demux round-trip (no mp4 tooling exists
in this environment) — including the multi-chunk stsc/stco walk, the
stss sync table and an odd trailing chunk — while every frame payload
is a libwebp-encoded VP8 stream whose decode is interop-pinned.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from org_revue_de_presse_trends_spark.functions import codecs
from org_revue_de_presse_trends_spark.functions import container_mp4 as cm
from org_revue_de_presse_trends_spark.functions.codec_vp8 import (
    decode_vp8_rgba,
)

from test_codec_vp8 import _LIB, _lw_encode_rgb, _lw_decode_rgba, _vp8_chunk

needs_libwebp = pytest.mark.skipif(_LIB is None,
                                   reason="system libwebp not available")

W, H = 64, 48


@pytest.fixture(scope="module")
def vp8_frames():
    if _LIB is None:
        pytest.skip("system libwebp not available")
    out = []
    for i in range(7):
        xx, yy = np.meshgrid(np.arange(W), np.arange(H))
        img = np.stack([(xx * 3 + i * 8) % 256, (yy * 5 + i * 3) % 256,
                        (xx + yy + i * 11) % 256],
                       axis=-1).astype(np.uint8)
        data = _lw_encode_rgb(img, 75.0)
        out.append((_vp8_chunk(data), _lw_decode_rgba(data)))
    return out


@needs_libwebp
def test_mux_parse_round_trip(vp8_frames):
    payloads = [p for p, _ in vp8_frames]
    mp4 = cm.mux_mp4_vp8(payloads, W, H, frame_duration=100)
    assert codecs.sniff_format(mp4) == "mp4"
    doc = cm.parse_mp4(mp4)
    assert doc["brand"] == "isom"
    t = doc["tracks"][0]
    assert (t["handler"], t["codec"], t["width"], t["height"],
            t["timescale"], t["n_samples"]) == (
        "vide", "vp08", W, H, 1000, 7)
    track, samples = cm.extract_samples(mp4)
    assert [s[0] for s in samples] == [100 * i for i in range(7)]
    assert all(s[1] for s in samples)
    assert [s[2] for s in samples] == payloads     # byte-exact


@needs_libwebp
def test_samples_decode_bit_exact(vp8_frames):
    payloads = [p for p, _ in vp8_frames]
    mp4 = cm.mux_mp4_vp8(payloads, W, H)
    _, samples = cm.extract_samples(mp4)
    for i, (ts, sync, data) in enumerate(samples):
        assert np.array_equal(decode_vp8_rgba(data), vp8_frames[i][1]), i


@needs_libwebp
def test_odd_count_multi_chunk_and_sync_table(vp8_frames):
    """5 frames = two 2-sample chunks + a 1-sample tail chunk: the
    stsc run-length walk and the stss sparse sync table both real."""
    payloads = [p for p, _ in vp8_frames[:5]]
    keys = [True, False, False, True, False]
    mp4 = cm.mux_mp4_vp8(payloads, W, H, frame_duration=100,
                         keyframes=keys)
    _, samples = cm.extract_samples(mp4)
    assert [s[2] for s in samples] == payloads
    assert [s[1] for s in samples] == keys
    out = codecs.extract_video_frames(mp4, every_ms=100, duration_ms=500)
    assert [t for t, _ in out] == [0, 100, 200, 300, 400]
    # ts 400 seeks back to the keyframe at 300 (frame 3)
    assert np.array_equal(codecs.decode_image(out[4][1]),
                          vp8_frames[3][1])


@needs_libwebp
def test_native_sampling_matches_libwebp(vp8_frames):
    payloads = [p for p, _ in vp8_frames]
    mp4 = cm.mux_mp4_vp8(payloads, W, H, frame_duration=100)
    out = codecs.extract_video_frames(mp4, every_ms=200, duration_ms=700)
    assert [t for t, _ in out] == [0, 200, 400, 600]
    for ts, png in out:
        assert np.array_equal(codecs.decode_image(png),
                              vp8_frames[ts // 100][1]), ts


@needs_libwebp
def test_non_vp8_codec_stays_at_the_boundary(vp8_frames):
    mp4 = cm.mux_mp4_vp8([p for p, _ in vp8_frames[:2]], W, H)
    avc = mp4.replace(b"vp08", b"avc1")
    if codecs.FFMPEG_BIN is None:
        with pytest.raises(NotImplementedError, match="vp08"):
            codecs.extract_video_frames(avc, 100, 200)
    with pytest.raises(NotImplementedError, match="fragmented"):
        cm.parse_mp4(mp4 + struct.pack(">I", 8) + b"moof")


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="ftyp"):
        cm.parse_mp4(b"\x00" * 20)
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    with pytest.raises(ValueError, match="moov"):
        cm.parse_mp4(ftyp)
    # box overrunning the file
    bad = ftyp + struct.pack(">I", 100) + b"moov" + b"\x00" * 8
    with pytest.raises(ValueError, match="overruns"):
        cm.parse_mp4(bad)


@needs_libwebp
def test_sample_overrun_is_an_error(vp8_frames):
    payloads = [p for p, _ in vp8_frames[:2]]
    mp4 = bytearray(cm.mux_mp4_vp8(payloads, W, H))
    # inflate the first stsz entry far past the file end
    i = mp4.index(b"stsz")
    struct.pack_into(">I", mp4, i + 4 + 4 + 8, 10 ** 7)
    with pytest.raises(ValueError, match="overruns"):
        cm.extract_samples(bytes(mp4))


@needs_libwebp
def test_mutated_mp4_raises_value_error_or_decodes(vp8_frames):
    """Seeded mutation fuzz: same robustness contract as webp/webm."""
    rng = np.random.default_rng(77)
    base = bytearray(cm.mux_mp4_vp8(
        [p for p, _ in vp8_frames[:3]], W, H, frame_duration=100))
    for _ in range(80):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            if rng.integers(0, 2) == 0:
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
            else:
                data = data[:int(rng.integers(8, len(data)))]
        try:
            out = codecs.extract_video_frames(bytes(data), 100, 300)
            assert all(isinstance(ts, int) for ts, _ in out)
        except (ValueError, NotImplementedError):
            pass


@needs_libwebp
def test_sample_video_frames_operator_on_mp4(spark, vp8_frames):
    from pyspark.sql import Row

    from org_revue_de_presse_trends_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    payloads = [p for p, _ in vp8_frames[:4]]
    mp4 = cm.mux_mp4_vp8(payloads, W, H, frame_duration=100)
    df = spark.createDataFrame([
        Row(media_id=9, kind="video", payload=mp4,
            meta=Row(mime="video/mp4", width=W, height=H,
                     duration_ms=400)),
    ], MEDIA_SCHEMA)
    out = sample_video_frames(df, every_ms=200, decoder="auto").collect()
    assert sorted((r.media_id, r.frame_ts_ms) for r in out) == [
        (9, 0), (9, 200)]
