"""Multimodal column operators (task brief): image/audio/video as
opaque ``binary`` columns with typed metadata structs, processed with
Arrow-batched ``mapInPandas``.

The DECODE step is pluggable via ``decoder=``:

- ``"auto"`` — REAL codecs: PNG and WAV decode natively via the
  stdlib-only ``functions.codecs`` (zlib/wave + numpy), other image
  formats through PIL and video through ffmpeg when those are
  installed; otherwise NotImplementedError marks the exact boundary.
- ``"fake"`` — deterministic byte-level pseudo-features, so the
  Spark-side plumbing (schema, batch shape, partitioning) stays
  testable with arbitrary payload bytes and goldens hold.
- ``"stub"`` — always raises: the explicit no-codec boundary.

Scale design: mapInPandas streams Arrow record batches through Python
once (no per-row overhead), feature extraction is embarrassingly
parallel, and ``repartition`` before the map sizes the Python worker
batches; binaries never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes LONG, byte_mean DOUBLE, "
    "byte_entropy DOUBLE, content_hash STRING, feature ARRAY<FLOAT>"
)


def _byte_stats(arr) -> tuple[float, float, list[float]]:
    """(mean, entropy, 8-bucket histogram) over a uint8 array.

    The kernel is numpy end-to-end (frombuffer + bincount): a per-byte
    Python loop here defeats the point of Arrow batching — measured 8×
    faster on 4 KiB payloads, and the gap widens with payload size."""
    import numpy as np

    n = arr.size
    if n == 0:
        return 0.0, 0.0, [0.0] * 8
    counts = np.bincount(arr.reshape(-1), minlength=256)
    mean = float(arr.sum(dtype=np.int64)) / n
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    feature = (counts.reshape(8, 32).sum(axis=1) / n).tolist()
    return mean, entropy, feature


def _decode_payload(payload: bytes, kind: str, decoder: str):
    """The codec boundary: returns (mean, entropy, feature[8]).

    'fake' computes the stats over the RAW payload bytes; 'auto' REALLY
    decodes (stdlib PNG/WAV, PIL/ffmpeg when installed) and computes
    the same stats over decoded pixels / quantized audio samples, so
    the two paths share one schema and one downstream contract."""
    import numpy as np

    if decoder == "stub":
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; use decoder='fake' for the deterministic "
            "byte-level path"
        )
    if decoder in ("auto", "real"):
        from ..functions import codecs

        if not payload:
            return 0.0, 0.0, [0.0] * 8
        if kind == "image":
            return _byte_stats(codecs.decode_image(payload).reshape(-1))
        if kind == "audio":
            if codecs.sniff_format(payload) != "wav":
                raise NotImplementedError(
                    "only WAV audio decodes natively; other formats need "
                    "an audio library not present in this environment"
                )
            samples, _rate = codecs.decode_wav(payload)
            # quantize [-1, 1] → uint8 bins so image/audio share stats
            q = np.clip((samples.reshape(-1) + 1.0) * 127.5, 0, 255)
            return _byte_stats(q.astype(np.uint8))
        if kind == "video":
            # WebM/VP8 decodes natively (container_webm + codec_vp8);
            # other containers/codecs need ffmpeg and raise without it.
            # Stats over the first frame's pixels (duration unknown at
            # this boundary; one probe frame at t=0 is the feature).
            frames = codecs.extract_video_frames(
                payload, every_ms=1000, duration_ms=1
            )
            if not frames:
                return 0.0, 0.0, [0.0] * 8
            return _byte_stats(
                codecs.decode_image(frames[0][1]).reshape(-1)
            )
        raise NotImplementedError(
            f"no decoder for kind={kind!r} in this environment"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")
    if not payload:
        return 0.0, 0.0, [0.0] * 8
    return _byte_stats(np.frombuffer(payload, dtype=np.uint8))


def extract_media_features(
    media: DataFrame, decoder: str = "fake", batch_partitions: int | None = None
) -> DataFrame:
    """(media_id, kind, n_bytes, byte_mean, byte_entropy, content_hash,
    feature) via mapInPandas over Arrow batches."""
    if batch_partitions:
        media = media.repartition(batch_partitions)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        # column-wise zip, not iterrows(): iterrows materializes a
        # pandas Series per row (measured dominant at 10⁴ rows)
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "byte_mean": [],
                "byte_entropy": [], "content_hash": [], "feature": [],
            }
            for media_id, kind, raw in zip(
                pdf["media_id"].values, pdf["kind"].values,
                pdf["payload"].values,
            ):
                payload = bytes(raw) if raw is not None else b""
                mean, entropy, feature = _decode_payload(
                    payload, kind, decoder
                )
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["byte_mean"].append(mean)
                out["byte_entropy"].append(entropy)
                out["content_hash"].append(hashlib.md5(payload).hexdigest())
                out["feature"].append(feature)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 16,
    height: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Image-resize plumbing: media-in → media-out (same MEDIA_SCHEMA),
    so it composes with ``extract_media_features`` / dedup downstream.

    Image rows get their payload replaced by the resized encoding and
    meta width/height updated; non-image rows pass through unchanged.
    The fake path resamples payload bytes at even strides to exactly
    width×height bytes — deterministic, so goldens hold.  The 'auto'
    path REALLY decodes (stdlib PNG; PIL formats when installed),
    nearest-neighbor resizes, and re-encodes as PNG."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        # resample indices depend only on (n, target): cache per length
        target = width * height
        idx_cache: dict[int, "np.ndarray"] = {}

        def resample(payload: bytes) -> bytes:
            n = len(payload)
            idx = idx_cache.get(n)
            if idx is None:
                idx = (np.arange(target, dtype=np.int64) * n) // target
                idx_cache[n] = idx
            return np.frombuffer(payload, dtype=np.uint8)[idx].tobytes()

        for pdf in batches:
            rows = []
            for media_id, kind, raw, raw_meta in zip(
                pdf["media_id"].values, pdf["kind"].values,
                pdf["payload"].values, pdf["meta"].values,
            ):
                payload = bytes(raw) if raw is not None else None
                meta = dict(raw_meta) if raw_meta is not None else None
                # only image rows WITH a payload are resized; everything
                # else (non-images, null payloads, null meta) passes
                # through byte-for-byte — a null payload must stay null,
                # not become b'' with a claimed resize in meta
                if kind == "image" and payload:
                    if decoder == "stub":
                        raise NotImplementedError(
                            "image resize requires codec libraries not "
                            "present in this environment"
                        )
                    mime = None
                    if decoder in ("auto", "real"):
                        from ..functions import codecs

                        img = codecs.decode_image(payload)
                        payload = codecs.encode_png(
                            codecs.resize_nearest(img, width, height)
                        )
                        mime = "image/png"
                    elif decoder == "fake":
                        payload = resample(payload)
                    else:
                        raise ValueError(f"unknown decoder {decoder!r}")
                    meta = meta or {
                        "mime": None, "width": None, "height": None,
                        "duration_ms": None,
                    }
                    if mime is not None:
                        meta["mime"] = mime
                    meta["width"], meta["height"] = width, height
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_video_metadata(media: DataFrame) -> DataFrame:
    """Container-level video metadata WITHOUT decoding any frame —
    the curation primitive for filtering a corpus by codec /
    resolution / duration / keyframe density before paying for
    decode.  Native for WebM (EBML) and unfragmented MP4; rows whose
    payload can't be parsed surface as ``parse_error`` strings rather
    than failing the job (curation wants the inventory INCLUDING the
    broken files).

    Output: (media_id, container, codec, width, height, duration_ms,
    n_frames, n_keyframes, parse_error) — scalar columns only (the
    rows-only driver contract shape)."""
    out_schema = (
        "media_id LONG, container STRING, codec STRING, width INT, "
        "height INT, duration_ms LONG, n_frames INT, n_keyframes INT, "
        "parse_error STRING"
    )

    def run(batches):
        import pandas as pd

        from ..functions import codecs
        from ..functions.container_mp4 import extract_samples
        from ..functions.container_webm import demux_video_frames, parse_webm

        for pdf in batches:
            rows = []
            for media_id, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw) if raw is not None else b""
                fmt = codecs.sniff_format(payload)
                rec = {"media_id": int(media_id), "container": fmt,
                       "codec": None, "width": None, "height": None,
                       "duration_ms": None, "n_frames": None,
                       "n_keyframes": None, "parse_error": None}
                try:
                    if fmt == "webm":
                        track, frames = demux_video_frames(payload)
                        doc = parse_webm(payload)
                        rec.update(
                            codec=track["codec_id"],
                            width=track["width"], height=track["height"],
                            n_frames=len(frames),
                            n_keyframes=sum(1 for _, kf, _ in frames
                                            if kf),
                            duration_ms=(max(ts for ts, _, _ in frames)
                                         if frames else 0),
                        )
                    elif fmt == "mp4":
                        track, samples = extract_samples(payload)
                        rec.update(
                            codec=track["codec"],
                            width=track["width"], height=track["height"],
                            duration_ms=track["duration_ms"],
                            n_frames=len(samples),
                            n_keyframes=sum(1 for _, sync, _ in samples
                                            if sync),
                        )
                    else:
                        rec["parse_error"] = f"unsupported container {fmt}"
                except (ValueError, NotImplementedError) as ex:
                    rec["parse_error"] = f"{type(ex).__name__}: {ex}"
                rows.append(rec)
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, out_schema)
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (frame decode itself sits behind the codec boundary).  The fake
    decoder emits a byte-slice hash per frame so downstream dedup/
    similarity can be exercised end-to-end."""
    out_schema = (
        "media_id LONG, frame_ts_ms LONG, frame_hash STRING"
    )

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, tss, hashes = [], [], []
            for media_id, kind, raw, meta in zip(
                pdf["media_id"].values, pdf["kind"].values,
                pdf["payload"].values, pdf["meta"].values,
            ):
                if kind != "video":
                    continue
                duration = (
                    meta["duration_ms"]
                    if meta is not None and meta["duration_ms"]
                    else 0
                )
                payload = bytes(raw) if raw is not None else b""
                if decoder == "stub":
                    raise NotImplementedError("video decode requires ffmpeg")
                if decoder in ("auto", "real"):
                    from ..functions import codecs

                    for ts, png in codecs.extract_video_frames(
                        payload, every_ms, duration
                    ):
                        ids.append(media_id)
                        tss.append(ts)
                        hashes.append(hashlib.md5(png).hexdigest())
                    continue
                if decoder != "fake":
                    raise ValueError(f"unknown decoder {decoder!r}")
                n_frames = max(duration // every_ms, 0)
                for i in range(n_frames):
                    lo = (i * len(payload)) // max(n_frames, 1)
                    hi = ((i + 1) * len(payload)) // max(n_frames, 1)
                    ids.append(media_id)
                    tss.append(i * every_ms)
                    hashes.append(hashlib.md5(payload[lo:hi]).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "frame_hash": hashes}
            )

    return media.mapInPandas(run, schema=out_schema)


_DCT_BASIS_CACHE: dict = {}


#: Frozen DCT-II basis for n=32 — the exact float64 bits of
#: ``cos(pi*(2x+1)k/64)`` as produced once by numpy (zlib+base64 of the
#: little-endian buffer), committed so every host decodes the SAME
#: table: ``np.cos`` dispatches to SIMD libm variants whose last-ulp
#: behavior differs per CPU microarchitecture — the exact host-FP
#: failure class root-caused in codec_vp8_enc (r11) — and a pHash bit
#: is a coefficient-vs-median comparison one ulp can flip.
_DCT32_B64 = (
    "eNrlmftTl0UYxbGLZFNmY2hmaHhJzSItRUJ0QVGgzKysGcfI1OyiecvKNMlLTTaZZdmU"
    "2iiZgmHJRYQuoJuYQgIhCgpaCogoApJRaFNjTe3nvM2XfyF/2WHdfZ7d95zzXPbr5/fP"
    "v5+N3/90fHXmgpNBLU2mc+JVix/Z0mSODHj/j1evbjKn3mi5IijonJmXF/7rwsYGM3xW"
    "l1GvPV9vIpc3R1dm1JnU1Ok9TmSeNgkNbw96Nv6UCZlT9eeF606axr96rF0+r9LkPlbV"
    "rkPcMfNT989fXPdumek2KeiV37sUm7DJ78zqkJ9repVfe35a92TT0Y02xM3bm9w6e8zt"
    "sznOjsWuHez82E+cX7vNncNGuHPZYe6clnPbGncPy70s97Tc297au2TTyvImc/SOfY9G"
    "Jpwz6TuXnN8e2mAiOwfMWJJzxhwObNe7eUyNGd7SNjSu/3FzZUJZcNsPDprQHf1ykjp/"
    "be50o73Mzdtwt86WuX0WOzbN2bX4sb2dX/m3x5jHvx3BvqPYMdj1x08Qfv05hx/nCuOc"
    "R3Ru7pHKvXRP3Vu4C2fhKhyFW/MRh9MJcBkIDiP47vrO+q763vDGfgpeeeA5Frwj4cNu"
    "+CI+gaMpg4/iKX6MgYdD4V0DPOsLrwbCo3p4kw5P5sIL8SDtsQvFH01pMps2tu/31Mdn"
    "zffPpNwzNK/KXJv0bPhXF/PNVW60+9y83ezWaZ83JjKfz7ou7LsGO3uxKz+p+JX/xFb+"
    "A9l3JtHZ+Q67n+InHb/bGZOY38+6y/Bf4/abPdhlv+dXehfu0qv0KL3puwlf4XqO79sJ"
    "HQvHYeAjftWC23rw7QOvhNNa+FENj24En1HwqwDe7HI8NBfgZzg8ET9egMeKR6/Ar2/h"
    "bRo8KIef0oN0Ll1Lx9KtdBqBLjuhww7oTjqTrrw4gh4vZTi9HkDPR9B7BaPixV3oOoR9"
    "W7Aju8Pwc2mD81vvRhvCuRRXPufc0dxjKvcq4p7EGy/OS+/CXXFVeEeBwxXglQHO+t5H"
    "4dEgvvsB4sVmcL0BPCPEG/CohG/CsRN82QpP7qtweAfDQ+GGX9sAL2ofd3xSXBAfvoLX"
    "UfDgN/haD89Gr7yreMaqRvNkckpSdXy5meJGzdtoxpnMP826KPZp/2zmp7FuJPtkZy7z"
    "U1k3stX+ecxPbrX/fsYXmZ/Euhj28f9mPvNxrOP/7VjGBcxPZF20/IKf4rz0LtwVt3vw"
    "/RSXpWfFC8VZxdUs+CO9kp/NYXhSBH+ywa8UXEfDszjiyVrwEy9OwdOL4g84joBXsfCX"
    "+sAshgej4WWF44mdBX+kU+le+Vr5WPm2BN2gL0/XoehL8UE6bkSfP6KzaHT7HPpOQZ/S"
    "6R7pnnUn2BdEfCnEbh/8dMRvMOfQuSo4Zxudm3uM514R3DODe6uuUx2muok6z8vPxGWz"
    "FTya+Y7SYzI8kZ7RuxeHE8BZvPLz6/kvX1rAUzjtgBfd4WFX+BRwi8NbuCpvbYC3ilfw"
    "0j4ED/rBu/nwPPOw42MMfFE+Vp5XPlceV94mz5pL5NN15Nv1jMqzyqsF7MvFjvJ0LH7W"
    "4DeBsVMr/0XsS8ROBnYr8PMZfjMYVzCvuiKLfTuxsw27U/FDveDV86q3hU9P4rz0ngnu"
    "FhyVn4fwnefwfTeATx3xAL17eq6CR1Hw4h5wFm7ziReHwPdyxxOjev8l+BkPLzvCsxZ4"
    "sxseDALfceQF5YOT8DNM/EZvyvee7tGJ8u6N6DALvVahx2Po7Rv01A7dKR7sJe8fRM+x"
    "6HUwejSM0vFh1t3Lvh7Y6YNd6VZ+0zjHLs71B3GnF+duk+nuoTqjG/ecoL4AXBX3Vdep"
    "jlOcl94DwF1xXd9VdZbiwfXodTa8aAOOw/nu28BTeo6Bh83wRjhnglclfFgA38TTffBK"
    "PEglHtTBp5A4x9cQeDwG3u2CJ0VDFz+14ZNaU+hG+wNjAfP8bfYy/z3jd8zvZ9zju8/m"
    "+to1/C1/djfz8v9tK/+W+VpG/rYHGEuZP824k/kSxkPM1zFm+85rnddvqX9WPU+97+V3"
    "5WfpPR7cv+D7Kx5M4furriwlXig/h/L9v4Z3itvR8C8UnKTnUnAMJh4J5wri+FJ40PiE"
    "418JPDlNPFsAj0rIM+jeqN9Q3a86399Xv17dfhz9qC5XPle9EO0bP0wh8UP5+nLixzb0"
    "W4Bu1d9vZr4f61THD9zu7JRjNw4/d+J3AOeYwLlYZ2+mnujPPTLoE3ar3uDeys/q39XH"
    "oWOvrlN+Vx6V3qnL7HrwUr0dBt6B4Kb8/iu4xMK3cPDgXcHAKy9uj4IPH8AT3pXszfBg"
    "usPdw3kZfG4Cb/hg80sdX87Cyxj4pn5beVf9uvpx9duR5E3lV+X1QkblfeXxdPaRp82j"
    "2FUe3oVf5elk5peRx3ewbzV2nsPuDvw04beMMYX5s4k++d0uxs5fST71gS3Gr/o+xVPF"
    "ffVxqudzwUf5XfFAehfu6qv84Yfiuurt8eSNKHBVHaY4Ph1+KT9XE2/OgJvidgS8qoKn"
    "0nM6/CIemQBw/gHeLIGH3ag/9a6nfK13M/K4lzeHoLMcFw9MNjrKRLcTiRPK59TdXh3e"
    "jM5Vp//8m9NxV/R8G/OVrJvJvnrsdMWudK2+5T3O8TvnGs059b4wm3qghnvhx77OvfVO"
    "q/c63vO8/l19nOp56nUvvyvOS+/Cnfzu8SoQPqWga+KIXQje+dQXelcUTjPA9Sw8iIY3"
    "p+FZIrw8D48D4WsifJx6wvHtQfiUB1/OwYcnffthq75efbz69jHMx7KuF/vCGcf6vheY"
    "CeyLZ3yA+TDWdVYf7/ueYEexbgz7/La68SHmx7FuKfsKGCcxP4J1Wez/kDGc+cG+7wle"
    "flfdpz5belKdNxL8VM+rrlN+X4ceB8MfxfEvwGERcbotugM/r047BH5Pw59SeCcehIIf"
    "dYBZDW8/hEf54Eqfb18uc/wtgYfixQD4c5A4ofd8vbcr7/Ne7uX7bPI58cGqP1e/QH9u"
    "YtDnA+iaPv+/fI4+s8nHvzBGMd+XdRvZV0OcCMZuNX7U1xdxjs84Vyn1/gW3z1T7vl/q"
    "/dD+RFzQu4/eeVTvK+7r3Ub9u/o41fOq65TfFeeld9XrgcSLHPhQAY8YzWrwToaPc+DB"
    "M+D5JnxbBK8eBsc04tES3v3bu3rf3A5fusDnYnhGHWPeJt7onV/9vvL+dt/3fUO/bn8k"
    "b64hz5Yx1jG/kXXK05nK69jNxs9C8nwzo/L4aq1j30bsrMKu8jbvAPatLW5sUR3Buq3s"
    "S8IO7xTmJH7udvu83+P0u8wm9QPgqndd6Zn8bvrzfVXPf4mexvNemwSvpHfh/rLv7y8e"
    "z+LAl3W2mHiQFedwetjZtdSPBr92BfzkXcHrS47Dr/bwZDL8HkLc6DvF8VLvfqr79a6n"
    "dzzV+cr36s9V1yufS4/qz7uhs3z02oCOW9BdAPWC8nkIcehW4oZ0PlH1BHZLfH8/ND05"
    "RyHnWsk5x3HuudzDn3utJd68Q5zQ77D6PU6/y+h9Xu+0eq/rD97q3zeDq+p51XXK74rz"
    "Fb6/v3p1gd4P2sMD9R0l4DkRXijOBIE39aZdBF/JTzYP3tTC51XwZQU82kKfWAWf/gbI"
    "IPAa"
)


def _dct_basis(n: int):
    """Cached DCT-II basis matrix (constant per img_size — rebuilding
    the 32×32 cos outer product per image row wastes linear work in
    the hot mapInPandas loop; a module-level dict survives across
    rows within each Python worker).  For the pHash size (32) the
    table decodes from frozen literal bits, never libm (see
    ``_DCT32_B64``); other sizes derive on demand and are NOT pinned
    across hosts — only pHash feeds golden-pinned outputs."""
    import numpy as np

    got = _DCT_BASIS_CACHE.get(n)
    if got is None:
        if n == 32:
            import base64
            import zlib

            got = np.frombuffer(
                zlib.decompress(base64.b64decode(_DCT32_B64)), dtype="<f8"
            ).reshape(32, 32)
        else:
            k = np.arange(n)[:, None]
            x = np.arange(n)[None, :]
            got = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
        _DCT_BASIS_CACHE[n] = got
    return got


def _mm_pinned(a, b):
    """Order-pinned float64 matmul ``a @ b`` (reduction axis
    accumulated serially j=0,1,... via elementwise outer products) —
    bit-identical on every host, unlike BLAS dgemm whose blocking/FMA/
    reassociation track the CPU microarchitecture (the codec_vp8_enc
    r11 root cause).  Elementwise IEEE multiply/add leave no ordering
    freedom; cost at 32×32 is 32 vectorized outer products —
    microseconds, and pHash is not the media queries' bottleneck."""
    import numpy as np

    acc = np.multiply.outer(a[:, 0], b[0, :])
    for j in range(1, a.shape[1]):
        acc = acc + np.multiply.outer(a[:, j], b[j, :])
    return acc


def _phash64(pixels, hash_size: int = 8, img_size: int = 32) -> int:
    """64-bit perceptual hash of a decoded image array (pHash, the
    imagehash convention: DCT-II of the downsampled grayscale, all
    hash_size² top-left coefficients compared against their median).
    Pure numpy, deterministic."""
    import numpy as np

    a = np.asarray(pixels, dtype="float64")
    if a.ndim == 3:  # RGB(A) → luma
        a = a[..., :3].mean(axis=2)
    if a.ndim != 2 or a.size == 0:
        return 0
    h, w = a.shape
    # nearest-neighbor downsample to img_size² (deterministic, no
    # interpolation library)
    ri = (np.arange(img_size) * h) // img_size
    ci = (np.arange(img_size) * w) // img_size
    small = a[np.ix_(ri, ci)]
    d = _dct_basis(img_size)
    # order-pinned (host-FP-stable) equivalent of d @ small @ d.T
    freq = _mm_pinned(_mm_pinned(d, small), d.T)
    block = freq[:hash_size, :hash_size].flatten()
    med = np.median(block)
    bits = 0
    for i, c in enumerate(block):
        if c > med:
            bits |= 1 << i
    # fold to a signed 64-bit long for the LongType column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash_images(
    media: DataFrame,
    decoder: str = "auto",
    id_col: str = "media_id",
    bytes_col: str = "payload",
) -> DataFrame:
    """(id, phash): 64-bit perceptual hash per image row.

    decoder='auto' really decodes (stdlib PNG, PIL when installed);
    'fake' hashes a deterministic pseudo-image derived from the raw
    bytes, keeping the plumbing testable with arbitrary payloads.

    Non-image rows are filtered out when a ``kind`` column is present
    (the MEDIA_SCHEMA contract every sibling operator follows); empty
    or NULL payloads hash to NULL, never to a shared sentinel that
    would cross-pair them downstream."""
    import numpy as np

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "image")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ..functions import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for payload in pdf[bytes_col]:
                if not payload:
                    out.append(None)
                elif decoder in ("auto", "real"):
                    out.append(_phash64(codecs.decode_image(bytes(payload))))
                elif decoder == "fake":
                    raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                    side = max(int(len(raw) ** 0.5), 2)
                    img = np.resize(raw, (side, side))
                    out.append(_phash64(img))
                else:
                    raise NotImplementedError(
                        f"no image decoder {decoder!r} in this environment"
                    )
            yield pd.DataFrame({"id": pdf[id_col], "phash": out})

    return media.select(id_col, bytes_col).mapInPandas(
        run, "id long, phash long"
    )


def image_near_dup_pairs(
    media: DataFrame,
    decoder: str = "auto",
    max_hamming: int = 3,
    id_col: str = "media_id",
    bytes_col: str = "payload",
    max_chunk_df: int | None = 1000,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: pHash each image (one
    Arrow-batched map pass), then the chunk-blocked hamming join shared
    with SimHash text dedup (``dedup.hamming_pairs`` — candidates are
    an equi-join on 16-bit hash chunks, never all-pairs).  Media
    corpora contain degenerate constants (all-black thumbnails hash to
    one pHash), so the chunk-df skew guard defaults ON here — see
    ``hamming_pairs``.  Returns (id_a, id_b, hamming)."""
    from .dedup import hamming_pairs

    hashed = (
        phash_images(media, decoder, id_col, bytes_col)
        .filter(F.col("phash").isNotNull())
        .select("id", F.col("phash").alias("sh"))
    )
    return hamming_pairs(hashed, max_hamming, max_chunk_df=max_chunk_df)


def _audio_fingerprint64(
    samples, n_frames: int = 17, n_bands: int = 4
) -> int:
    """64-bit spectral fingerprint of a mono signal: frame the clip,
    FFT each frame, bit = band energy rises from one frame to the
    next (the energy-delta construction behind chromaprint/Shazam-
    family fingerprints — public algorithm).  (n_frames−1) × n_bands
    must equal 64.  Pure numpy, deterministic."""
    import numpy as np

    if (n_frames - 1) * n_bands != 64:
        raise ValueError(
            "(n_frames - 1) * n_bands must equal 64, got "
            f"({n_frames} - 1) * {n_bands} = {(n_frames - 1) * n_bands}"
            " — bits above position 63 would overflow the signed-int64"
            " fold and corrupt the Arrow long conversion"
        )
    x = np.asarray(samples, dtype="float64").reshape(-1)
    if x.size < n_frames:
        x = np.pad(x, (0, n_frames - x.size))
    frame_len = x.size // n_frames
    frames = x[: frame_len * n_frames].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    nbins = spec.shape[1]
    edges = [(b * nbins) // n_bands for b in range(n_bands)] + [nbins]
    energy = np.stack(
        [
            spec[:, edges[b] : edges[b + 1]].sum(axis=1)
            for b in range(n_bands)
        ],
        axis=1,
    )  # n_frames × n_bands
    delta = energy[1:] > energy[:-1]  # (n_frames−1) × n_bands
    bits = 0
    for i, v in enumerate(delta.flatten()):
        if v:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fingerprints(
    media: DataFrame,
    decoder: str = "auto",
    id_col: str = "media_id",
    bytes_col: str = "payload",
) -> DataFrame:
    """(id, afp): 64-bit spectral fingerprint per audio row — the
    audio twin of ``phash_images`` (decoder='auto' decodes WAV with
    the stdlib codec; 'fake' fingerprints a pseudo-signal from the
    raw bytes).  Non-audio rows are filtered out when ``kind`` is
    present; empty/NULL payloads fingerprint to NULL; non-WAV audio
    raises the module's NotImplementedError codec boundary, matching
    ``_decode_payload``."""
    import numpy as np

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "audio")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ..functions import codecs

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for payload in pdf[bytes_col]:
                if not payload:
                    out.append(None)
                elif decoder in ("auto", "real"):
                    if codecs.sniff_format(bytes(payload)) != "wav":
                        raise NotImplementedError(
                            "only WAV audio decodes natively; other "
                            "formats need an audio library not present "
                            "in this environment"
                        )
                    samples, _rate = codecs.decode_wav(bytes(payload))
                    if samples.ndim == 2:  # stereo → mono mean
                        samples = samples.mean(axis=1)
                    out.append(_audio_fingerprint64(samples))
                elif decoder == "fake":
                    raw = np.frombuffer(
                        bytes(payload), dtype=np.uint8
                    ).astype("float64")
                    out.append(_audio_fingerprint64(raw / 127.5 - 1.0))
                else:
                    raise NotImplementedError(
                        f"no audio decoder {decoder!r} in this environment"
                    )
            yield pd.DataFrame({"id": pdf[id_col], "afp": out})

    return media.select(id_col, bytes_col).mapInPandas(
        run, "id long, afp long"
    )


def audio_near_dup_pairs(
    media: DataFrame,
    decoder: str = "auto",
    max_hamming: int = 3,
    id_col: str = "media_id",
    bytes_col: str = "payload",
    max_chunk_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate audio pairs: spectral fingerprints + the shared
    chunk-blocked hamming join, with the chunk-df skew guard ON by
    default (silent clips fingerprint to one constant — see
    ``hamming_pairs``).  Returns (id_a, id_b, hamming)."""
    from .dedup import hamming_pairs

    hashed = (
        audio_fingerprints(media, decoder, id_col, bytes_col)
        .filter(F.col("afp").isNotNull())
        .select("id", F.col("afp").alias("sh"))
    )
    return hamming_pairs(hashed, max_hamming, max_chunk_df=max_chunk_df)


def video_near_dup_pairs(
    media: DataFrame,
    every_ms: int = 1000,
    threshold: float = 0.5,
    decoder: str = "fake",
    max_frame_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate video pairs by frame-set overlap: sample frames
    (``sample_video_frames`` — the codec boundary), treat each video
    as its SET of frame hashes, and score pairs by the overlap
    coefficient |A∩B| / min(|A|,|B|) — robust to one video being a
    clipped or extended cut of the other, the common video-dup case.

    Same candidate shape as the text containment/winnowing family: an
    equi self-join on the frame hash (videos sharing zero frames never
    pair), intersection counts grouped per pair, set sizes attached
    after.  ``max_frame_df`` mirrors ``shingle_pair_counts``'s
    ``max_shingle_df``: a frame shared by thousands of videos (channel
    intro, black frame, test pattern) carries no near-dup signal but
    would emit df²/2 join rows in one bucket — the window-count cap
    bounds the self-join fan-out linearly and its exchange is the very
    partitioning the join consumes.  Sizes are computed over the
    CAPPED frame sets, so overlap stays a true coefficient over the
    retained (informative) frames — the same semantics the text family
    uses.  Returns (id_a, id_b, n_shared, overlap)."""
    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "video")
    # a NULL/empty payload yields frame slices of b'' whose md5 is a
    # CONSTANT — two contentless videos would otherwise pair at
    # overlap 1.0; drop the empty-slice hash from every frame set
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    frames = (
        sample_video_frames(media, every_ms=every_ms, decoder=decoder)
        .select(
            F.col("media_id").cast("long").alias("id"),
            F.col("frame_hash").alias("fh"),
        )
        .filter(F.col("fh") != empty_md5)
        .distinct()
    )
    if max_frame_df is not None:
        w_df = Window.partitionBy("fh")
        frames = (
            frames.withColumn("_df", F.count(F.lit(1)).over(w_df))
            .filter(F.col("_df") <= max_frame_df)
            .drop("_df")
        )
    sizes = frames.groupBy("id").agg(F.count(F.lit(1)).alias("n_frames"))
    a, b = frames.alias("a"), frames.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("id").alias("id_a"), F.col("n_frames").alias("n_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col("id").alias("id_b"), F.col("n_frames").alias("n_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")).cast("double")
            ).alias("overlap"),
        )
        .filter(F.col("overlap") >= threshold)
    )
