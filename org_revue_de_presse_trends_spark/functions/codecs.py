"""Real media codecs for the multimodal operators — import-free where
possible, optional-import elsewhere.

The container ships no PIL/ffmpeg, but two production formats are
decodable with the standard library alone, so those paths are REAL
(bytes in, pixels/samples out), not fakes:

- PNG: zlib + struct decode (8-bit depth, non-interlaced, color types
  0/2/3/4/6 — covers the overwhelming majority of real-world PNGs) and
  a matching encoder, used by the resize operator to re-encode.
- WAV: stdlib ``wave`` for PCM 8/16/32-bit.

Everything else (JPEG, webm, mp4, ...) dispatches to PIL / the ffmpeg
binary when present (``HAVE_PIL`` / ``FFMPEG_BIN``) and raises
``NotImplementedError`` otherwise — the documented codec boundary.

Scale note: these run inside ``mapInPandas`` workers on the executors;
per-image cost is the codec itself (zlib inflate dominates).  The
Python per-pixel fallback in PNG unfiltering only triggers for filter
types 1/3/4 (sequential data dependency along the scanline); types 0/2
— what our encoder emits — stay fully vectorized.
"""

from __future__ import annotations

import shutil
import struct
import zlib

import numpy as np

try:  # pragma: no cover - exercised only where PIL is installed
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

FFMPEG_BIN = shutil.which("ffmpeg")

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"GIF8"):
        return "gif"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload.startswith(b"\x1a\x45\xdf\xa3"):
        return "webm"
    return "unknown"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Supports bit depth 8, interlace 0, color types 0 (gray), 2 (RGB),
    3 (palette → RGB), 4 (gray+alpha), 6 (RGBA).  Raises ValueError on
    malformed input, NotImplementedError on unsupported variants.
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG: bad signature")
    pos, idat, plte = len(PNG_MAGIC), [], None
    width = height = bitdepth = colortype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            (width, height, bitdepth, colortype, _comp, _filt, interlace
             ) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bitdepth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder "
            f"(depth={bitdepth}, colortype={colortype}, "
            f"interlace={interlace}); install PIL for full coverage"
        )
    ch = _PNG_CHANNELS[colortype]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            rec = row.copy()
        elif f == 2:  # up — vectorized (wrapping uint8 add)
            rec = row + prev
        elif f == 1:  # sub — cumulative sum per channel lane
            rec = (
                np.add.accumulate(
                    row.reshape(width, ch), axis=0, dtype=np.uint8
                ).reshape(stride)
            )
        else:  # average / paeth — sequential along x
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    rec[x] = (int(row[x]) + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = int(prev[x - ch]) if x >= ch else 0
                    rec[x] = (int(row[x]) + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {f}")
        out[y], prev = rec, rec
    img = out.reshape(height, width, ch)
    if colortype == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, {1,2,3,4}) → PNG bytes (filter 0,
    one IDAT).  The inverse of ``decode_png`` for supported shapes."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported image shape {img.shape}")
    height, width, ch = img.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    scan = np.zeros((height, width * ch + 1), dtype=np.uint8)
    scan[:, 1:] = img.reshape(height, width * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) → (height, width, C) — pure
    integer index math, deterministic across platforms."""
    h, w = img.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return img[ys][:, xs]


def decode_image(payload: bytes) -> np.ndarray:
    """Image bytes → uint8 (H, W, C): stdlib for PNG, PIL for the rest
    when installed, NotImplementedError at the codec boundary."""
    fmt = sniff_format(payload)
    if fmt == "png":
        try:
            return decode_png(payload)
        except NotImplementedError:
            if not HAVE_PIL:
                raise
    if HAVE_PIL:  # pragma: no cover - exercised only with PIL
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    raise NotImplementedError(
        f"decoding {fmt!r} images requires PIL, which is not installed; "
        "PNG decodes natively"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float32 in [-1, 1] shaped (n, channels),
    sample_rate).  PCM 8/16/32-bit via stdlib ``wave``."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, sw = w.getnframes(), w.getnchannels(), w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(n)
    if sw == 1:  # unsigned 8-bit
        arr = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = (
            np.frombuffer(raw, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    return arr.reshape(-1, ch), rate


def extract_video_frames(
    payload: bytes, every_ms: int, duration_ms: int
) -> list[tuple[int, bytes]]:
    """Video bytes → [(ts_ms, png_bytes)] sampled every ``every_ms``,
    via the ffmpeg binary (one seek+decode per timestamp: simple and
    exact; a single-pass fps filter is the optimization when frame
    volume warrants it).  Raises NotImplementedError without ffmpeg."""
    if FFMPEG_BIN is None:
        raise NotImplementedError(
            "video frame sampling requires the ffmpeg binary, which is "
            "not installed"
        )
    # pragma: no cover — exercised only where ffmpeg exists
    import subprocess
    import tempfile

    frames: list[tuple[int, bytes]] = []
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload)
        f.flush()
        for ts in range(0, max(duration_ms, 0), every_ms):
            proc = subprocess.run(
                [
                    FFMPEG_BIN, "-v", "error", "-ss", f"{ts / 1000:.3f}",
                    "-i", f.name, "-frames:v", "1", "-f", "image2pipe",
                    "-vcodec", "png", "-",
                ],
                capture_output=True,
                timeout=60,
            )
            if proc.returncode == 0 and proc.stdout:
                frames.append((ts, proc.stdout))
    return frames


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    import io
    import wave

    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.round(np.clip(samples * 32767.0, -32768, 32767)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()
