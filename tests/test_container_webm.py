"""WebM (EBML) demuxer/muxer + native VP8 video-frame decoding.

Evidence layers:
- container round-trip: mux VP8 payloads -> parse back tracks,
  timestamps, keyframe flags and BYTE-EXACT frame payloads (incl.
  cluster rollover and a hand-built BlockGroup/ReferenceBlock cluster);
- frame correctness: every demuxed payload decodes bit-exact against
  the system libwebp (each frame is a libwebp-encoded VP8 stream);
- `codecs.extract_video_frames` samples WebM/VP8 natively with
  seek-to-latest-keyframe semantics, no ffmpeg involved;
- the `sample_video_frames` Spark operator runs end-to-end on real
  WebM bytes with decoder="auto".

No external WebM reader exists in this environment (no ffmpeg), so the
container layer's oracle is the spec-pinned round-trip; the payload
layer keeps libwebp as its oracle (test_codec_vp8.py's pattern).
"""
from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from org_revue_de_presse_trends_spark.functions import codecs
from org_revue_de_presse_trends_spark.functions import container_webm as cw
from org_revue_de_presse_trends_spark.functions.codec_vp8 import (
    decode_vp8_rgba,
)

from test_codec_vp8 import _LIB, _lw_encode_rgb, _lw_decode_rgba, _vp8_chunk

needs_libwebp = pytest.mark.skipif(_LIB is None,
                                   reason="system libwebp not available")

W, H = 64, 48


def _frame_image(i: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    return np.stack([(xx * 3 + i * 8) % 256, (yy * 5 + i * 3) % 256,
                     (xx + yy + i * 11) % 256], axis=-1).astype(np.uint8)


@pytest.fixture(scope="module")
def vp8_frames():
    if _LIB is None:
        pytest.skip("system libwebp not available")
    out = []
    for i in range(30):
        data = _lw_encode_rgb(_frame_image(i), 75.0)
        out.append((_vp8_chunk(data), _lw_decode_rgba(data)))
    return out


@needs_libwebp
def test_mux_parse_round_trip(vp8_frames):
    payloads = [p for p, _ in vp8_frames]
    webm = cw.mux_webm_vp8(payloads, W, H, frame_duration_ms=40,
                           cluster_ms=400)
    assert codecs.sniff_format(webm) == "webm"
    doc = cw.parse_webm(webm)
    assert doc["doctype"] == "webm"
    assert doc["timestamp_scale"] == 1_000_000
    assert doc["tracks"] == [{"number": 1, "type": 1, "codec_id": "V_VP8",
                              "width": W, "height": H}]
    frames = doc["frames"]
    assert [f[1] for f in frames] == [40 * i for i in range(30)]
    assert all(f[2] for f in frames)              # all keyframes
    assert [f[3] for f in frames] == payloads      # byte-exact payloads


@needs_libwebp
def test_demuxed_frames_decode_bit_exact(vp8_frames):
    payloads = [p for p, _ in vp8_frames]
    webm = cw.mux_webm_vp8(payloads, W, H)
    _, frames = cw.demux_video_frames(webm)
    for i, (ts, kf, data) in enumerate(frames):
        assert np.array_equal(decode_vp8_rgba(data), vp8_frames[i][1]), i


@needs_libwebp
def test_native_sampling_seeks_to_latest_keyframe(vp8_frames):
    payloads = [p for p, _ in vp8_frames[:10]]
    # only frames 0, 4, 8 flagged as keyframes
    keys = [i % 4 == 0 for i in range(10)]
    webm = cw.mux_webm_vp8(payloads, W, H, frame_duration_ms=100,
                           keyframes=keys)
    samples = codecs.extract_video_frames(webm, every_ms=250,
                                          duration_ms=1000)
    assert [ts for ts, _ in samples] == [0, 250, 500, 750]
    # 250ms -> keyframe at 0; 500ms -> keyframe at 400 (frame 4); etc.
    expect = {0: 0, 250: 0, 500: 4, 750: 4}
    for ts, png in samples:
        assert np.array_equal(codecs.decode_image(png),
                              vp8_frames[expect[ts]][1]), ts


@needs_libwebp
def test_blockgroup_and_reference_block(vp8_frames):
    # hand-build a cluster using BlockGroup: a Block without
    # ReferenceBlock is a keyframe, with one it is not
    payloads = [p for p, _ in vp8_frames[:2]]
    base = cw.mux_webm_vp8(payloads[:1], W, H)
    doc = cw.parse_webm(base)
    assert doc["frames"][0][2] is True

    def group(data, ts_rel, with_ref):
        block = cw._enc_size(1) + struct.pack(">h", ts_rel) \
            + bytes([0]) + data
        body = cw._elem(cw._BLOCK, block)
        if with_ref:
            body += cw._elem_uint(cw._REFERENCE_BLOCK, 0)
        return cw._elem(cw._BLOCK_GROUP, body)

    cluster = cw._elem(cw._CLUSTER, b"".join([
        cw._elem_uint(cw._CLUSTER_TIMESTAMP, 0),
        group(payloads[0], 0, with_ref=False),
        group(payloads[1], 40, with_ref=True),
    ]))
    # splice: rebuild the segment with our cluster only
    ebml_end = base.index(cw._enc_id(cw._SEGMENT))
    doc2 = cw.parse_webm(base)
    info_tracks = cw._elem(cw._INFO, cw._elem_uint(
        cw._TIMESTAMP_SCALE, 1_000_000))
    tracks = cw._elem(cw._TRACKS, cw._elem(cw._TRACK_ENTRY, b"".join([
        cw._elem_uint(cw._TRACK_NUMBER, 1),
        cw._elem_uint(cw._TRACK_TYPE, 1),
        cw._elem(cw._CODEC_ID, b"V_VP8"),
        cw._elem(cw._VIDEO, cw._elem_uint(cw._PIXEL_WIDTH, W)
                 + cw._elem_uint(cw._PIXEL_HEIGHT, H)),
    ])))
    webm = base[:ebml_end] + cw._elem(
        cw._SEGMENT, info_tracks + tracks + cluster)
    track, frames = cw.demux_video_frames(webm)
    assert [(ts, kf) for ts, kf, _ in frames] == [(0, True), (40, False)]
    assert frames[0][2] == payloads[0] and frames[1][2] == payloads[1]
    assert doc2["doctype"] == "webm"


@needs_libwebp
def test_unknown_size_segment_streamed_file(vp8_frames):
    # streamed WebM files write the Segment with unknown size
    # (all-ones varint); the parser must extend it to EOF
    payloads = [p for p, _ in vp8_frames[:3]]
    webm = cw.mux_webm_vp8(payloads, W, H)
    seg_id = cw._enc_id(cw._SEGMENT)
    i = webm.index(seg_id)
    size, body_start = cw._read_size(webm, i + len(seg_id))
    unknown = bytes([0x01]) + b"\xff" * 7
    streamed = webm[:i + len(seg_id)] + unknown + webm[body_start:]
    _, frames = cw.demux_video_frames(streamed)
    assert [f[2] for f in frames] == payloads


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        cw.parse_webm(b"\x00\x01\x02")                 # wrong magic
    with pytest.raises(ValueError):
        cw.parse_webm(b"\x1a\x45\xdf\xa3")             # truncated header
    # valid EBML header but matroska-incompatible doctype
    bad = cw._elem(cw._EBML_HEADER, cw._elem(cw._DOCTYPE, b"notwebm"))
    with pytest.raises(ValueError, match="doctype"):
        cw.parse_webm(bad)
    # laced SimpleBlock on the VIDEO track: tolerated by parse_webm
    # (counted per track), refused by demux_video_frames as a
    # capability gap (NotImplementedError -> ffmpeg fallback upstream)
    block = cw._enc_size(1) + struct.pack(">h", 0) + bytes([0x86]) + b"xx"
    webm = (cw._elem(cw._EBML_HEADER, cw._elem(cw._DOCTYPE, b"webm"))
            + cw._elem(cw._SEGMENT, b"".join([
                cw._elem(cw._TRACKS, cw._elem(cw._TRACK_ENTRY, b"".join([
                    cw._elem_uint(cw._TRACK_NUMBER, 1),
                    cw._elem_uint(cw._TRACK_TYPE, 1),
                    cw._elem(cw._CODEC_ID, b"V_VP8"),
                ]))),
                cw._elem(cw._CLUSTER,
                         cw._elem_uint(cw._CLUSTER_TIMESTAMP, 0)
                         + cw._elem(cw._SIMPLE_BLOCK, block)),
            ])))
    assert cw.parse_webm(webm)["laced_blocks"] == {1: 1}
    with pytest.raises(NotImplementedError, match="laced video"):
        cw.demux_video_frames(webm)
    # no video track
    audio_only = (cw._elem(cw._EBML_HEADER, cw._elem(cw._DOCTYPE, b"webm"))
                  + cw._elem(cw._SEGMENT, cw._elem(
                      cw._TRACKS, cw._elem(cw._TRACK_ENTRY, b"".join([
                          cw._elem_uint(cw._TRACK_NUMBER, 1),
                          cw._elem_uint(cw._TRACK_TYPE, 2),
                          cw._elem(cw._CODEC_ID, b"A_OPUS"),
                      ])))))
    with pytest.raises(ValueError, match="video"):
        cw.demux_video_frames(audio_only)
    # child element overrunning its parent
    overrun = (cw._elem(cw._EBML_HEADER, cw._elem(cw._DOCTYPE, b"webm"))
               + cw._enc_id(cw._SEGMENT) + cw._enc_size(4)
               + cw._enc_id(cw._INFO) + cw._enc_size(100))
    with pytest.raises(ValueError, match="overruns|truncated"):
        cw.parse_webm(overrun + b"\x00" * 2)


@needs_libwebp
def test_non_vp8_codec_stays_at_the_boundary(vp8_frames):
    payloads = [p for p, _ in vp8_frames[:1]]
    webm = cw.mux_webm_vp8(payloads, W, H)
    vp9 = webm.replace(b"V_VP8", b"V_VP9")
    if codecs.FFMPEG_BIN is None:
        with pytest.raises(NotImplementedError, match="V_VP8"):
            codecs.extract_video_frames(vp9, 100, 200)


@needs_libwebp
def test_sample_video_frames_operator_end_to_end(spark, vp8_frames):
    """The Spark operator path: real WebM bytes through mapInPandas
    with decoder='auto' — native demux + VP8 decode on executors."""
    from pyspark.sql import Row

    from org_revue_de_presse_trends_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    payloads = [p for p, _ in vp8_frames[:6]]
    webm_a = cw.mux_webm_vp8(payloads, W, H, frame_duration_ms=100)
    webm_b = cw.mux_webm_vp8(payloads[::-1], W, H, frame_duration_ms=100)
    df = spark.createDataFrame([
        Row(media_id=1, kind="video", payload=webm_a,
            meta=Row(mime="video/webm", width=W, height=H,
                     duration_ms=600)),
        Row(media_id=2, kind="video", payload=webm_b,
            meta=Row(mime="video/webm", width=W, height=H,
                     duration_ms=300)),
    ], MEDIA_SCHEMA)
    out = sample_video_frames(df, every_ms=200, decoder="auto").collect()
    got = sorted((r.media_id, r.frame_ts_ms) for r in out)
    assert got == [(1, 0), (1, 200), (1, 400), (2, 0), (2, 200)]
    # per-frame hashes are of real PNG re-encodes of decoded pixels —
    # the same timestamp in the two videos shows different content
    h = {(r.media_id, r.frame_ts_ms): r.frame_hash for r in out}
    assert h[(1, 0)] != h[(2, 0)]


@needs_libwebp
def test_laced_audio_track_does_not_block_video_demux(vp8_frames):
    """Review-caught: lacing is legal Matroska and typical for audio —
    a laced block on a track the caller never decodes must not abort
    the video demux (previously a hard ValueError)."""
    payloads = [p for p, _ in vp8_frames[:2]]
    base = cw.mux_webm_vp8(payloads, W, H, frame_duration_ms=100)
    # rebuild: two tracks (video 1, audio 2), video blocks + one laced
    # audio SimpleBlock (EBML lacing, flags bit 0x06)
    tracks = cw._elem(cw._TRACKS, b"".join([
        cw._elem(cw._TRACK_ENTRY, b"".join([
            cw._elem_uint(cw._TRACK_NUMBER, 1),
            cw._elem_uint(cw._TRACK_TYPE, 1),
            cw._elem(cw._CODEC_ID, b"V_VP8"),
            cw._elem(cw._VIDEO, cw._elem_uint(cw._PIXEL_WIDTH, W)
                     + cw._elem_uint(cw._PIXEL_HEIGHT, H)),
        ])),
        cw._elem(cw._TRACK_ENTRY, b"".join([
            cw._elem_uint(cw._TRACK_NUMBER, 2),
            cw._elem_uint(cw._TRACK_TYPE, 2),
            cw._elem(cw._CODEC_ID, b"A_OPUS"),
        ])),
    ]))
    vid_blocks = b"".join(
        cw._elem(cw._SIMPLE_BLOCK,
                 cw._enc_size(1) + struct.pack(">h", 100 * i)
                 + bytes([0x80]) + p)
        for i, p in enumerate(payloads))
    laced_audio = cw._elem(cw._SIMPLE_BLOCK,
                           cw._enc_size(2) + struct.pack(">h", 0)
                           + bytes([0x06]) + b"\x02\x10\x10" + b"x" * 48)
    cluster = cw._elem(cw._CLUSTER,
                       cw._elem_uint(cw._CLUSTER_TIMESTAMP, 0)
                       + laced_audio + vid_blocks)
    ebml_end = base.index(cw._enc_id(cw._SEGMENT))
    webm = base[:ebml_end] + cw._elem(cw._SEGMENT, tracks + cluster)
    track, frames = cw.demux_video_frames(webm)
    assert [f[2] for f in frames] == payloads
    assert cw.parse_webm(webm)["laced_blocks"] == {2: 1}


@needs_libwebp
def test_unknown_size_cluster_does_not_swallow_later_clusters(vp8_frames):
    """Review-caught: streamed recordings (e.g. MediaRecorder) write
    clusters with the all-ones unknown size; the next Cluster ID ends
    the element, so later frames must survive."""
    payloads = [p for p, _ in vp8_frames[:2]]
    base = cw.mux_webm_vp8(payloads[:1], W, H)

    def cluster(ts, payload, unknown_size):
        body = (cw._elem_uint(cw._CLUSTER_TIMESTAMP, ts)
                + cw._elem(cw._SIMPLE_BLOCK,
                           cw._enc_size(1) + struct.pack(">h", 0)
                           + bytes([0x80]) + payload))
        if unknown_size:
            return (cw._enc_id(cw._CLUSTER)
                    + bytes([0x01]) + b"\xff" * 7 + body)
        return cw._elem(cw._CLUSTER, body)

    tracks = cw._elem(cw._TRACKS, cw._elem(cw._TRACK_ENTRY, b"".join([
        cw._elem_uint(cw._TRACK_NUMBER, 1),
        cw._elem_uint(cw._TRACK_TYPE, 1),
        cw._elem(cw._CODEC_ID, b"V_VP8"),
    ])))
    ebml_end = base.index(cw._enc_id(cw._SEGMENT))
    webm = base[:ebml_end] + cw._elem(
        cw._SEGMENT,
        tracks + cluster(0, payloads[0], True)
        + cluster(1000, payloads[1], False))
    _, frames = cw.demux_video_frames(webm)
    assert [(ts, d) for ts, _, d in frames] == [
        (0, payloads[0]), (1000, payloads[1])]


@needs_libwebp
def test_track_number_127_single_byte_vint(vp8_frames):
    """Review-caught: the all-ones reservation applies to element
    SIZES only — a block track number of 127 is the single byte 0xFF
    and must parse as the value 127."""
    payloads = [p for p, _ in vp8_frames[:1]]
    base = cw.mux_webm_vp8(payloads, W, H)
    tracks = cw._elem(cw._TRACKS, cw._elem(cw._TRACK_ENTRY, b"".join([
        cw._elem_uint(cw._TRACK_NUMBER, 127),
        cw._elem_uint(cw._TRACK_TYPE, 1),
        cw._elem(cw._CODEC_ID, b"V_VP8"),
    ])))
    cluster = cw._elem(cw._CLUSTER,
                       cw._elem_uint(cw._CLUSTER_TIMESTAMP, 0)
                       + cw._elem(cw._SIMPLE_BLOCK,
                                  b"\xff" + struct.pack(">h", 0)
                                  + bytes([0x80]) + payloads[0]))
    ebml_end = base.index(cw._enc_id(cw._SEGMENT))
    webm = base[:ebml_end] + cw._elem(cw._SEGMENT, tracks + cluster)
    track, frames = cw.demux_video_frames(webm)
    assert track["number"] == 127
    assert frames[0][2] == payloads[0]
