"""WebP-lossless (VP8L) codec — stdlib-only decoder + encoder.

Spec: the WebP Lossless Bitstream Specification (RFC 9649 §4; public).
Decoder covers the full still-image feature set: all four transforms
(predictor, cross-color, subtract-green, color-indexing incl. pixel
bundling), color cache, LZ77 backward references with the two-level
distance mapping, meta-Huffman (the "huffman image"), simple and
normal Huffman codes with the code-length-code layer and the
max_symbol early-stop.  Interop is externally verified both ways in
tests/test_codec_webp.py against the system libwebp via ctypes:
libwebp-encoded streams (which exercise every feature above) must
decode pixel-exact here, and streams produced by ``encode_webp_
lossless`` must decode pixel-exact in libwebp.

The encoder is deliberately minimal but spec-valid: no transforms, no
color cache, no LZ77 — one Huffman group of plain ARGB literals
(canonical codes, length-limited by weight-flattening when a skewed
histogram would exceed the spec's 15-bit/7-bit depth caps).  Lossless
means the simple stream is still bit-exact; compression ratio is not
the goal here (the lake stores parquet, not webp).

Lossy VP8 (the 'VP8 ' chunk — boolean arithmetic coder, intra
prediction, loop filter) and ALPH/ANIM chunks remain the documented
PIL/ffmpeg boundary, like arithmetic JPEG in codecs.py.
"""

from __future__ import annotations

import struct

import numpy as np

#: RFC 9649 §4.2.2 two-level distance mapping: codes 1..120 are close
#: neighbors (dy = v >> 4, dx = 8 - (v & 0xF)); byte-identical to
#: libwebp's code-to-plane table (verified against the system library).
_CODE_TO_PLANE = bytes.fromhex(
    "1807171928062729161a262a38053739151b363a252b48044749141c353b464a"
    "242c58454b343c035759131d565a232d444c555b333d68026769121e666a222e"
    "545c434d656b323e78017779535d111f646c424e767a212f757b313f636d525e"
    "00747c414f1020626e30737d515f40727e616f50717f6070"
)

#: code-length-code symbol order (RFC 9649; note 16 sits after 5 —
#: a DEFLATE-style misremembering of this order decodes correctly for
#: any stream whose code lengths stay <= 5 and corrupts the rest,
#: which is how it was caught: the accept/reject boundary against
#: libwebp landed exactly at max code length 6)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD


class _LsbReader:
    """LSB-first bit reader (VP8L convention; JPEG's reader in
    codecs.py is MSB-first and unsuitable here)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.d[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        return self.read(1)


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code_msb(self, code: int, length: int) -> None:
        """Huffman code bits enter the stream MSB-of-code first (the
        DEFLATE convention VP8L shares)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


# ---------------------------------------------------------------------------
# canonical Huffman (DEFLATE-style assignment; codes read MSB-first)
# ---------------------------------------------------------------------------

def _build_decode_table(code_lengths):
    syms = [(ln, s) for s, ln in enumerate(code_lengths) if ln > 0]
    if not syms:
        raise ValueError("VP8L: empty huffman code")
    if len(syms) == 1:
        return ("const", syms[0][1])
    syms.sort()
    table: dict[tuple[int, int], int] = {}
    code = 0
    prev_len = syms[0][0]
    for ln, s in syms:
        code <<= ln - prev_len
        prev_len = ln
        table[(ln, code)] = s
        code += 1
    if code != (1 << prev_len):
        raise ValueError("VP8L: incomplete huffman code")
    return ("map", table)


def _read_symbol(br: _LsbReader, tab) -> int:
    if tab[0] == "const":
        return tab[1]
    m = tab[1]
    code = 0
    length = 0
    while length <= 15:
        code = (code << 1) | br.bit()
        length += 1
        s = m.get((length, code))
        if s is not None:
            return s
    raise ValueError("VP8L: invalid huffman code in stream")


def _read_huffman_code(br: _LsbReader, alphabet_size: int):
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        if br.bit():
            s0 = br.read(8)
        else:
            s0 = br.bit()
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("VP8L: bad simple code symbols")
            return ("const", s0)
        s1 = br.read(8)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("VP8L: bad simple code symbols")
        lengths[s0] = lengths[s1] = 1
        return _build_decode_table(lengths)
    n_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tab = _build_decode_table(cl_lengths)
    if br.bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        c = _read_symbol(br, cl_tab)
        if c < 16:
            lengths[i] = c
            i += 1
            if c:
                prev = c
        elif c == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif c == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _build_decode_table(lengths)


def _prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _decode_entropy_image(br, w, h, is_level0):
    """One spatially-coded ARGB image (transforms handled by caller
    for level 0); returns a flat list of 32-bit ARGB ints, row-major."""
    cache_bits = br.read(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    hbits = 0
    meta_idx = None
    n_groups = 1
    if is_level0 and br.bit():
        hbits = br.read(3) + 2
        hw, hh = _ceil_div(w, 1 << hbits), _ceil_div(h, 1 << hbits)
        meta_px = _decode_entropy_image(br, hw, hh, False)
        meta_idx = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta_idx) + 1
        meta_w = hw
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman_code(br, 256 + 24 + cache_size),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 40),
            )
        )
    cache = [0] * cache_size
    out: list[int] = []
    total = w * h
    shift = 32 - cache_bits if cache_bits else 0
    grp = groups[0]

    def emit(px: int) -> None:
        out.append(px)
        if cache_size:
            cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px

    while len(out) < total:
        if meta_idx is not None:
            pos = len(out)
            x, y = pos % w, pos // w
            grp = groups[meta_idx[(y >> hbits) * meta_w + (x >> hbits)]]
        s = _read_symbol(br, grp[0])
        if s < 256:
            red = _read_symbol(br, grp[1])
            blue = _read_symbol(br, grp[2])
            alpha = _read_symbol(br, grp[3])
            emit((alpha << 24) | (red << 16) | (s << 8) | blue)
        elif s < 280:
            length = _prefix_value(br, s - 256)
            d0 = _prefix_value(br, _read_symbol(br, grp[4]))
            if d0 > 120:
                dist = d0 - 120
            else:
                v = _CODE_TO_PLANE[d0 - 1]
                dist = max((v >> 4) * w + (8 - (v & 0xF)), 1)
            if dist > len(out):
                raise ValueError("VP8L: backref before image start")
            for _ in range(length):
                emit(out[-dist])
                if len(out) > total:
                    raise ValueError("VP8L: backref overruns image")
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            emit(cache[idx])
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _chans(px: int):
    return ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)


def _pack(c) -> int:
    return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    L, T, TL, TR = _chans(left), _chans(top), _chans(tl), _chans(tr)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _pack([_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4)])
    if mode == 6:
        return _pack([_avg2(L[i], TL[i]) for i in range(4)])
    if mode == 7:
        return _pack([_avg2(L[i], T[i]) for i in range(4)])
    if mode == 8:
        return _pack([_avg2(TL[i], T[i]) for i in range(4)])
    if mode == 9:
        return _pack([_avg2(T[i], TR[i]) for i in range(4)])
    if mode == 10:
        return _pack(
            [_avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)]
        )
    if mode == 11:
        # Select(top, left, top_left): whichever of top/left the
        # gradient argues for (libwebp's exact pa_minus_pb form)
        pa_minus_pb = sum(
            abs(L[i] - TL[i]) - abs(T[i] - TL[i]) for i in range(4)
        )
        return top if pa_minus_pb <= 0 else left
    if mode == 12:
        return _pack(
            [_clamp(L[i] + T[i] - TL[i]) for i in range(4)]
        )
    if mode == 13:
        def half(a: int, b: int) -> int:
            t = a - b
            # C integer division truncates toward zero
            h = t // 2 if t >= 0 else -((-t) // 2)
            return _clamp(a + h)

        return _pack([half(_avg2(L[i], T[i]), TL[i]) for i in range(4)])
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _inverse_predictor(px, w, h, size_bits, sub_px, sub_w):
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[pos - 1]  # mode forced to LEFT on row 0
        elif x == 0:
            pred = px[pos - w]  # mode forced to TOP on column 0
        else:
            mode = (sub_px[(y >> size_bits) * sub_w + (x >> size_bits)]
                    >> 8) & 0xFF
            left = px[pos - 1]
            top = px[pos - w]
            tl = px[pos - w - 1]
            # rightmost column: TR wraps to the first pixel of the
            # CURRENT row (pos - w + 1 lands there), per spec
            tr = px[pos - w + 1]
            pred = _predict(mode, left, top, tl, tr)
        a, r, g, b = _chans(px[pos])
        pa, pr, pg, pb = _chans(pred)
        px[pos] = _pack(
            ((a + pa) & 0xFF, (r + pr) & 0xFF,
             (g + pg) & 0xFF, (b + pb) & 0xFF)
        )


def _ct_delta(t: int, v: int) -> int:
    # both operands are signed bytes; C-style arithmetic shift
    if t >= 128:
        t -= 256
    if v >= 128:
        v -= 256
    return (t * v) >> 5


def _inverse_color_transform(px, w, h, size_bits, sub_px, sub_w):
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = sub_px[(y >> size_bits) * sub_w + (x >> size_bits)]
        g2r = (cte >> 0) & 0xFF   # blue channel of the cte pixel
        g2b = (cte >> 8) & 0xFF   # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        a, r, g, b = _chans(px[pos])
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        px[pos] = _pack((a, r, g, b))


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → uint8 (H, W, 4) RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _LsbReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    return _decode_vp8l_stream(br, w, h)


def _decode_vp8l_stream(br: _LsbReader, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image stream (transform loop + entropy-coded
    image) at known dimensions — shared by the VP8L chunk decoder and
    the ALPH chunk's method-1 (lossless-compressed) alpha plane."""
    # transforms (level 0 only, each type at most once)
    transforms = []
    seen = set()
    cur_w = w
    while br.bit():
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(t)
        if t in (0, 1):  # predictor / cross-color
            size_bits = br.read(3) + 2
            sub_w = _ceil_div(cur_w, 1 << size_bits)
            sub_h = _ceil_div(h, 1 << size_bits)
            sub = _decode_entropy_image(br, sub_w, sub_h, False)
            transforms.append((t, size_bits, sub, sub_w))
        elif t == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_raw = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are componentwise deltas off the previous
            pal = []
            prev = 0
            for p in pal_raw:
                pc = _chans(p)
                qc = _chans(prev)
                prev = _pack(tuple((pc[i] + qc[i]) & 0xFF for i in range(4)))
                pal.append(prev)
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, wbits, pal, cur_w))
            cur_w = _ceil_div(cur_w, 1 << wbits)
    px = _decode_entropy_image(br, cur_w, h, True)
    # inverse transforms in reverse read order
    for tr in reversed(transforms):
        if tr[0] == 3:
            _, wbits, pal, orig_w = tr
            # out-of-range indices decode as transparent black per
            # RFC 9649 (libwebp does the same) — never an error
            if wbits == 0:
                unpacked = []
                for p in px:
                    idx = (p >> 8) & 0xFF
                    unpacked.append(pal[idx] if idx < len(pal) else 0)
            else:
                bpp = 8 >> wbits
                per = 1 << wbits
                mask = (1 << bpp) - 1
                packed_w = _ceil_div(orig_w, per)
                unpacked = []
                for y in range(h):
                    row = px[y * packed_w:(y + 1) * packed_w]
                    for x in range(orig_w):
                        g = (row[x >> wbits] >> 8) & 0xFF
                        idx = (g >> ((x & (per - 1)) * bpp)) & mask
                        unpacked.append(
                            pal[idx] if idx < len(pal) else 0
                        )
                px = unpacked
                cur_w = orig_w
                continue
            px = unpacked
            cur_w = orig_w
        elif tr[0] == 2:
            for i, p in enumerate(px):
                a, r, g, b = _chans(p)
                px[i] = _pack((a, (r + g) & 0xFF, g, (b + g) & 0xFF))
        elif tr[0] == 1:
            _inverse_color_transform(px, cur_w, h, tr[1], tr[2], tr[3])
        else:
            _inverse_predictor(px, cur_w, h, tr[1], tr[2], tr[3])
    if cur_w != w or len(px) != w * h:
        raise ValueError("VP8L: decoded size mismatch")
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba


def _unfilter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Inverse of the ALPH chunk's prediction filters (WebP container
    spec): 0 none, 1 horizontal, 2 vertical, 3 gradient.  All sums are
    mod 256; the gradient predictor clips left+top-topleft to 0..255."""
    if method == 0:
        return a
    h, w = a.shape
    x = a.astype(np.int32)
    if method == 1:      # horizontal: col 0 predicts from above
        col0 = np.cumsum(x[:, 0])
        out = np.cumsum(x, axis=1) + (col0 - x[:, 0])[:, None]
        return (out & 0xFF).astype(np.uint8)
    if method == 2:      # vertical: row 0 predicts from the left
        row0 = np.cumsum(x[0])
        out = np.cumsum(x, axis=0) + (row0 - x[0])[None, :]
        return (out & 0xFF).astype(np.uint8)
    # gradient
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        for xx in range(w):
            if y == 0:
                pred = 0 if xx == 0 else out[0, xx - 1]
            elif xx == 0:
                pred = out[y - 1, 0]
            else:
                g = out[y, xx - 1] + out[y - 1, xx] - out[y - 1, xx - 1]
                pred = 0 if g < 0 else (255 if g > 255 else g)
            out[y, xx] = (int(x[y, xx]) + pred) & 0xFF
    return out.astype(np.uint8)


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk → uint8 (h, w) alpha plane."""
    if not body:
        raise ValueError("WebP: empty ALPH chunk")
    compression = body[0] & 0x03
    filter_m = (body[0] >> 2) & 0x03
    pre_processing = (body[0] >> 4) & 0x03
    reserved = (body[0] >> 6) & 0x03
    if reserved != 0 or compression > 1 or pre_processing > 1:
        raise ValueError("WebP: malformed ALPH header byte")
    data = body[1:]
    if compression == 0:
        if len(data) < w * h:
            raise ValueError("WebP: raw ALPH data truncated")
        plane = np.frombuffer(data[:w * h], dtype=np.uint8).reshape(h, w)
    else:
        # headerless VP8L stream; alpha values ride in the green channel
        rgba = _decode_vp8l_stream(_LsbReader(data), w, h)
        plane = rgba[:, :, 1]
    # pre_processing == 1 (level reduction) needs no decoder action
    return _unfilter_alpha(plane, filter_m)


def _iter_riff_chunks(payload: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        tag = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if i + 8 + size > end:
            raise ValueError("WebP: chunk overruns container")
        yield tag, payload[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)


def _decode_still(chunks: list) -> np.ndarray:
    """Decode one still image from an (ALPH?, VP8|VP8L) chunk list."""
    alph = None
    for tag, body in chunks:
        if tag == b"ALPH":
            alph = body
        elif tag == b"VP8L":
            return decode_vp8l(body)
        elif tag == b"VP8 ":
            from .codec_vp8 import decode_vp8_rgba
            rgba = decode_vp8_rgba(body)
            if alph is not None:
                h, w = rgba.shape[:2]
                rgba[:, :, 3] = _decode_alpha(alph, w, h)
            return rgba
    raise ValueError("WebP: no VP8L/VP8 image chunk found")


def _blend_over(canvas: np.ndarray, tile: np.ndarray, x: int, y: int,
                blend: bool) -> None:
    """Compose a frame tile onto the canvas at (x, y): either straight
    replacement or non-premultiplied alpha 'over' (integer math)."""
    h, w = tile.shape[:2]
    if y + h > canvas.shape[0] or x + w > canvas.shape[1]:
        raise ValueError("WebP: animation frame exceeds the canvas")
    region = canvas[y:y + h, x:x + w]
    if not blend:
        region[...] = tile
        return
    src_a = tile[..., 3].astype(np.int32)
    dst_factor = region[..., 3].astype(np.int32) * (255 - src_a) // 255
    out_a = src_a + dst_factor
    num = (tile[..., :3].astype(np.int32) * src_a[..., None]
           + region[..., :3].astype(np.int32) * dst_factor[..., None])
    region[..., :3] = (num // np.maximum(out_a, 1)[..., None]).astype(
        np.uint8)
    region[..., 3] = out_a.astype(np.uint8)


def decode_webp_anim(payload: bytes, max_frames: int | None = None):
    """Animated WebP → ``(loop_count, [(duration_ms, canvas_rgba)])``:
    every composed canvas state, in order (or just the first
    ``max_frames`` — the first-frame path must not pay for the tail).

    Composition per the container spec: the canvas starts fully
    transparent; each ANMF frame either alpha-blends or overwrites its
    rectangle, and dispose-to-background clears the frame's rectangle
    to transparent before the next frame.  Frame payloads are the
    engine's own still decoders (VP8L / VP8 / ALPH — all
    interop-verified against libwebp); no animation oracle exists in
    this environment, so the composition arithmetic is pinned by
    spec-mirroring tests over LOSSLESS frames (exact by construction).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    canvas_w = canvas_h = None
    loop_count = 0
    frames = []
    saw_anim = False
    for tag, body in _iter_riff_chunks(payload, 12, len(payload)):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("WebP: truncated VP8X chunk")
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("WebP: truncated ANIM chunk")
            loop_count = struct.unpack("<H", body[4:6])[0]
            saw_anim = True
        elif tag == b"ANMF":
            if len(body) < 16:
                raise ValueError("WebP: truncated ANMF chunk")
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            sub = list(_iter_riff_chunks(body, 16, len(body)))
            frames.append((fx, fy, fw, fh, dur, flags, sub))
            if (max_frames is not None and saw_anim
                    and canvas_w is not None
                    and len(frames) >= max_frames):
                break   # first-frame path: don't scan the tail
    if not saw_anim or not frames:
        raise ValueError("WebP: not an animation (no ANIM/ANMF chunks)")
    if canvas_w is None:
        raise ValueError("WebP: animation without a VP8X canvas")
    canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8)
    out = []
    for fx, fy, fw, fh, dur, flags, sub in frames:
        tile = _decode_still(sub)
        if tile.shape[:2] != (fh, fw):
            raise ValueError("WebP: ANMF size disagrees with its payload")
        _blend_over(canvas, tile, fx, fy, blend=not (flags & 0x02))
        out.append((dur, canvas.copy()))
        if max_frames is not None and len(out) >= max_frames:
            break
        if flags & 0x01:       # dispose to background: clear the rect
            canvas[fy:fy + fh, fx:fx + fw] = 0
    return loop_count, out


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container → uint8 (H, W, 4) RGBA.  Lossless (VP8L), lossy
    (VP8 key frame, via codec_vp8) and still alpha (ALPH) all decode
    natively; animations return the first composed frame (the GIF
    precedent — ``decode_webp_anim`` exposes every frame)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    chunks = []
    # lazy walk: decode at the image chunk WITHOUT scanning the tail —
    # libwebp decodes files whose trailing metadata chunk is truncated,
    # and strictness libwebp doesn't share is an interop bug
    for tag, body in _iter_riff_chunks(payload, 12, len(payload)):
        if tag == b"ANIM" or tag == b"ANMF":
            _, anim_frames = decode_webp_anim(payload, max_frames=1)
            return anim_frames[0][1]
        chunks.append((tag, body))
        if tag in (b"VP8L", b"VP8 "):
            return _decode_still(chunks)
    return _decode_still(chunks)


def mux_webp_anim(frames, canvas_w: int, canvas_h: int,
                  loop_count: int = 0) -> bytes:
    """Build an animated WebP from encoded still-WebP payloads.

    ``frames`` is a list of ``(webp_bytes, x, y, duration_ms, blend,
    dispose_bg)`` — each ``webp_bytes`` a complete still WebP (e.g.
    from ``encode_webp_lossless``); its image chunks are lifted into
    an ANMF.  Exists to synthesize animation fixtures in an
    environment with no animation encoder (tests + demos)."""
    anmfs = []
    for data, x, y, dur, blend, dispose in frames:
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (stored /2)")
        if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            raise ValueError("frame payload must be a still WebP")
        sub = b""
        fw = fh = None
        for tag, body in _iter_riff_chunks(data, 12, len(data)):
            if tag in (b"ALPH", b"VP8L", b"VP8 "):
                sub += tag + struct.pack("<I", len(body)) + body
                sub += b"\x00" * (len(body) & 1)
            if tag == b"VP8L":
                bits = int.from_bytes(body[1:5], "little")
                fw = (bits & 0x3FFF) + 1
                fh = ((bits >> 14) & 0x3FFF) + 1
            elif tag == b"VP8 ":
                fw = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
                fh = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
        if fw is None:
            raise ValueError("frame payload has no image chunk")
        flags = (0x02 if not blend else 0x00) | (0x01 if dispose else 0x00)
        head = ((x // 2).to_bytes(3, "little")
                + (y // 2).to_bytes(3, "little")
                + (fw - 1).to_bytes(3, "little")
                + (fh - 1).to_bytes(3, "little")
                + int(dur).to_bytes(3, "little") + bytes([flags]))
        body = head + sub
        anmfs.append(b"ANMF" + struct.pack("<I", len(body)) + body
                     + b"\x00" * (len(body) & 1))
    vp8x = (bytes([0x02]) + b"\x00\x00\x00"
            + (canvas_w - 1).to_bytes(3, "little")
            + (canvas_h - 1).to_bytes(3, "little"))
    anim = b"\x00\x00\x00\x00" + struct.pack("<H", loop_count)
    riff = (b"WEBP"
            + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
            + b"ANIM" + struct.pack("<I", len(anim)) + anim
            + b"".join(anmfs))
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# encoder (minimal spec-valid literal stream)
# ---------------------------------------------------------------------------

def _huffman_lengths(hist: dict[int, int], max_len: int) -> dict[int, int]:
    """Huffman code lengths from a histogram, depth-capped by weight
    flattening (equal weights give a balanced, always-complete code)."""
    import heapq

    syms = sorted(hist)
    if len(syms) == 1:
        return {syms[0]: 0}

    def build(weights):
        heap = [(weights[s], i, (s,)) for i, s in enumerate(syms)]
        heapq.heapify(heap)
        depth = {s: 0 for s in syms}
        nxt = len(syms)
        while len(heap) > 1:
            w1, _, g1 = heapq.heappop(heap)
            w2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, nxt, g1 + g2))
            nxt += 1
        return depth

    depth = build(hist)
    if max(depth.values()) > max_len:
        depth = build({s: 1 for s in syms})
    return depth


def _canonical_encode_table(lengths: dict[int, int]):
    syms = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    if len(syms) == 1:
        # single-symbol codes consume ZERO bits per occurrence (the
        # decoder's "const" case), whatever length was declared
        return {syms[0][1]: (0, 0)}
    table = {}
    code = 0
    prev = syms[0][0] if syms else 0
    for ln, s in syms:
        code <<= ln - prev
        prev = ln
        table[s] = (ln, code)
        code += 1
    return table


def _write_huffman_code(bw: _LsbWriter, lengths: dict[int, int],
                        alphabet_size: int) -> None:
    used = sorted(s for s, ln in lengths.items())
    # simple codes carry symbols in 1/8-bit fields — >255 must take
    # the normal path; a SINGLE >255 symbol then needs a declared
    # nonzero length there (an all-zero lengths array is an invalid
    # prefix code), while its occurrences still cost zero bits (the
    # canonical table maps lone symbols to 0-bit codes, matching the
    # decoder's const case)
    if len(used) == 1 and used[0] > 255 and lengths[used[0]] == 0:
        lengths = {used[0]: 1}
    if max(used) <= 255 and (
        len(used) == 1
        or (len(used) == 2 and all(lengths[s] == 1 for s in used))
    ):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal code
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    cl_hist: dict[int, int] = {}
    for ln in full:
        cl_hist[ln] = cl_hist.get(ln, 0) + 1
    cl_lengths = _huffman_lengths(cl_hist, 7)
    if len(cl_hist) == 1:
        # single code-length symbol: its CL code must still be
        # readable — emit it with length 1 paired with a dummy
        only = next(iter(cl_hist))
        dummy = 0 if only != 0 else 1
        cl_lengths = {only: 1, dummy: 1}
    bw.write(19 - 4, 4)  # emit all 19 code-length-code lengths
    cl_full = [cl_lengths.get(s, 0) for s in range(19)]
    for s in _CL_ORDER:
        bw.write(cl_full[s], 3)
    bw.write(0, 1)  # no max_symbol shortcut: emit every length
    cl_table = _canonical_encode_table(cl_lengths)
    for ln in full:
        cln, code = cl_table[ln]
        bw.write_code_msb(code, cln)


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3|4) → lossless WebP bytes (VP8L literal stream:
    no transforms, no cache, no LZ77 — spec-valid and bit-exact)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("need (H, W, 3|4) uint8")
    h, w = img.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    if img.shape[2] == 3:
        rgba = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    else:
        rgba = img
    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    alpha_used = int((rgba[..., 3] != 255).any())
    bw.write(alpha_used, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    g = rgba[..., 1].ravel()
    r = rgba[..., 0].ravel()
    b = rgba[..., 2].ravel()
    a = rgba[..., 3].ravel()
    planes = []
    for vals, alphabet in ((g, 280), (r, 256), (b, 256), (a, 256)):
        uniq, counts = np.unique(vals, return_counts=True)
        hist = {int(s): int(c) for s, c in zip(uniq, counts)}
        lengths = _huffman_lengths(hist, 15)
        _write_huffman_code(bw, lengths, alphabet)
        planes.append(_canonical_encode_table(lengths))
    _write_huffman_code(bw, {0: 0}, 40)  # unused distance code
    gt, rt, bt, at = planes
    for i in range(w * h):
        for tab, v in ((gt, g[i]), (rt, r[i]), (bt, b[i]), (at, a[i])):
            if tab:  # empty table = single zero-bit symbol
                ln, code = tab[int(v)]
                bw.write_code_msb(code, ln)
    body = b"\x2f" + bytes(bw.out)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
