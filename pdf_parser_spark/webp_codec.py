"""From-scratch WebP lossless (VP8L) codec — decode full, encode subset.

WebP is the third web image format after JPEG and PNG; its lossless
variant (VP8L) is a self-contained spec ("WebP Lossless Bitstream
Specification", part of the public WebP container spec). This module
implements it from the spec alone:

- DECODER: complete VP8L decoding — RIFF/WEBP container (plain and VP8X
  extended layouts), all four transforms (predictor with its 14 modes,
  cross-color, subtract-green, color-indexing with pixel bundling),
  color cache, meta prefix-code groups via the entropy image, simple and
  complex prefix codes, and LZ77 backward references with the 120-entry
  two-dimensional distance map.
- ENCODER (round-trip fixtures + the distance-map probe): literal-pixel
  streams with real canonical prefix codes, optional explicit LZ77
  copies — enough to produce valid VP8L accepted by libwebp and to
  round-trip any RGBA array without transforms.
- Lossy VP8 streams decode for real through vp8_codec.py (from-scratch
  RFC 6386 key-frame decoder, libwebp-verified bit-exact in YUV); the
  RGB conversion layer is the documented BT.601 fixed-point transform.

Spec-constant provenance: the distance map (code -> (dx, dy) neighbor
offset) is derived empirically from libwebp by
scripts/derive_webp_distances.py — hand-built single-copy streams reveal
each plane code's offset — and re-verified against libwebp by tests when
the library is present. The reference repo (acstumler/pdf_parser) has no
image codecs; this module serves the multimodal operators (SURVEY §2
multimodal rows; operators/multimodal.py).
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np


class WebpError(ValueError):
    """Malformed or unsupported WebP stream."""

from pdf_parser_spark.media_codecs import format_boundary

_boundary = format_boundary("WebP", WebpError)


# 120-entry plane-code -> (dx, dy) map, derived from libwebp by
# scripts/derive_webp_distances.py (re-verified by tests when present)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_LITS = 256
_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40


# ---------------------------------------------------------------- bit I/O


class _Bits:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise WebpError("bitstream underrun")
        byte0 = self.pos >> 3
        chunk = self.data[byte0 : byte0 + ((self.pos & 7) + n + 7) // 8]
        v = (int.from_bytes(chunk, "little") >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos += n
        return v

    def peek(self, n: int) -> int:
        byte0 = self.pos >> 3
        chunk = self.data[byte0 : byte0 + ((self.pos & 7) + n + 7) // 8]
        return (int.from_bytes(chunk, "little") >> (self.pos & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n


class _BitWriter:
    __slots__ = ("val", "n")

    def __init__(self):
        self.val = 0
        self.n = 0

    def add(self, value: int, bits: int) -> None:
        self.val |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits

    def bytes(self) -> bytes:
        return self.val.to_bytes((self.n + 7) // 8 or 1, "little")


# ---------------------------------------------------------------- prefix code


class _Prefix:
    """Canonical prefix code, DEFLATE-style bit-reversed for LSB reads."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]):
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise WebpError("prefix code with no symbols")
        if len(nonzero) == 1:
            self.single = nonzero[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        max_len = max(ln for ln, _ in nonzero)
        if max_len > 15:
            raise WebpError("prefix length > 15")
        if sum(1 << (max_len - ln) for ln, _ in nonzero) != (1 << max_len):
            raise WebpError("incomplete prefix code")
        self.max_len = max_len
        size = 1 << max_len
        table = [(-1, 0)] * size
        code = 0
        prev_len = min(ln for ln, _ in nonzero)
        for ln, sym in sorted(nonzero):
            code <<= ln - prev_len
            prev_len = ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            for i in range(rev, size, 1 << ln):
                table[i] = (sym, ln)
            code += 1
        self.table = table

    @classmethod
    def from_codes(cls, lengths: list[int]) -> "dict[int, tuple[int, int]]":
        """Encoder side: symbol -> (reversed code value, length)."""
        nonzero = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
        codes: dict[int, tuple[int, int]] = {}
        if len(nonzero) == 1:
            codes[nonzero[0][1]] = (0, 0)
            return codes
        code = 0
        prev_len = nonzero[0][0]
        for ln, sym in nonzero:
            code <<= ln - prev_len
            prev_len = ln
            codes[sym] = (int(f"{code:0{ln}b}"[::-1], 2), ln)
            code += 1
        return codes

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        sym, ln = self.table[br.peek(self.max_len)]
        if sym < 0:
            raise WebpError("invalid prefix code word")
        br.skip(ln)
        return sym


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Depth-limited Huffman lengths (complete code)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    f = dict(freqs)
    while True:
        heap = [(f[s], i, (s,)) for i, s in enumerate(syms)]
        heapq.heapify(heap)
        nxt = len(syms)
        depth = {s: 0 for s in syms}
        while len(heap) > 1:
            w1, _, g1 = heapq.heappop(heap)
            w2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, nxt, g1 + g2))
            nxt += 1
        if max(depth.values()) <= max_len:
            return depth
        f = {s: max(1, c >> 2) for s, c in f.items()}


# ---------------------------------------------------------------- decoder


def _read_code_lengths(br: _Bits, alphabet: int) -> _Prefix:
    """One prefix code: simple (1-2 symbols) or complex (§ prefix codes)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet
        if num_symbols == 1:
            if first >= alphabet:
                raise WebpError("simple symbol out of alphabet")
            code = _Prefix.__new__(_Prefix)
            code.single = first
            code.table = None
            code.max_len = 0
            return code
        second = br.read(8)
        if first >= alphabet or second >= alphabet or first == second:
            raise WebpError("bad simple code symbols")
        lengths[first] = 1
        lengths[second] = 1
        return _Prefix(lengths)
    # complex
    num_clc = 4 + br.read(4)
    clc_lens = [0] * 19
    for i in range(num_clc):
        clc_lens[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lens)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= alphabet:
                    raise WebpError("repeat past alphabet")
                lengths[i] = prev_len
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:
            i += 7 + br.read(7) + 4  # 18: 11..138 zeros
        if i > alphabet:
            raise WebpError("zero-run past alphabet")
    return _Prefix(lengths)


def _read_value(code: int, br: _Bits) -> int:
    """LZ77 length / plane-code prefix coding (both use the same form)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")


def _decode_entropy_image(
    br: _Bits, w: int, h: int, level0: bool
) -> np.ndarray:
    """Decode one spatially-coded ARGB image (no transforms) as uint32
    (a<<24 | r<<16 | g<<8 | b). Subimages call this with level0=False."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad color-cache bits")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_w = 0
    num_groups = 1
    meta_bits = 0
    if level0 and br.read(1):  # entropy image present
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh, level0=False)
        meta_w = mw
        # meta code = (r << 8) | g of the entropy-image pixel
        meta = ((meta >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    groups: list[_Group] = []
    green_alpha = _GREEN_LITS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    for _ in range(num_groups):
        g = _Group()
        g.green = _read_code_lengths(br, green_alpha)
        g.red = _read_code_lengths(br, 256)
        g.blue = _read_code_lengths(br, 256)
        g.alpha = _read_code_lengths(br, 256)
        g.dist = _read_code_lengths(br, _NUM_DIST_CODES)
        groups.append(g)

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            group = groups[int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])]
        sym = group.green.decode(br)
        if sym < 256:  # literal pixel
            red = group.red.decode(br)
            blue = group.blue.decode(br)
            alpha = group.alpha.decode(br)
            pix = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = pix
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
        elif sym < 256 + _NUM_LENGTH_CODES:  # LZ77 copy
            length = _read_value(sym - 256, br)
            plane = _read_value(group.dist.decode(br), br)
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = _DIST_MAP[plane - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise WebpError("LZ77 reference out of bounds")
            for _ in range(length):
                pix = int(out[pos - dist])
                out[pos] = pix
                pos += 1
                if cache is not None:
                    cache[(0x1E35A7BD * pix & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
        else:  # color-cache hit
            if cache is None:
                raise WebpError("cache symbol without color cache")
            idx = sym - 256 - _NUM_LENGTH_CODES
            pix = int(cache[idx])
            out[pos] = pix
            pos += 1
            # a cache hit re-inserts (no-op) — pixel already keyed
    return out


# ---- transforms (inverse, applied in reverse read order) ----


def _avg2(a, b):
    return (a + b) >> 1


def _predict(mode: int, left, top, topleft, topright):
    """One of the 14 VP8L predictors over uint32 ARGB, per channel."""

    def chans(p):
        return np.stack([(p >> s) & 0xFF for s in (24, 16, 8, 0)], axis=-1).astype(np.int32)

    def pack(c):
        c = c.astype(np.uint32)
        return (c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]

    L, T, TL, TR = chans(left), chans(top), chans(topleft), chans(topright)
    if mode == 0:
        return np.uint32(0xFF000000)
    if mode == 1:
        return pack(L)
    if mode == 2:
        return pack(T)
    if mode == 3:
        return pack(TR)
    if mode == 4:
        return pack(TL)
    if mode == 5:
        return pack(_avg2(_avg2(L, TR), T))
    if mode == 6:
        return pack(_avg2(L, TL))
    if mode == 7:
        return pack(_avg2(L, T))
    if mode == 8:
        return pack(_avg2(TL, T))
    if mode == 9:
        return pack(_avg2(T, TR))
    if mode == 10:
        return pack(_avg2(_avg2(L, TL), _avg2(T, TR)))
    if mode == 11:  # Select
        p = L + T - TL
        pl = np.abs(p - L).sum(axis=-1)
        pt = np.abs(p - T).sum(axis=-1)
        return pack(np.where((pl < pt)[..., None], L, T))
    if mode == 12:  # ClampAddSubtractFull
        return pack(np.clip(L + T - TL, 0, 255))
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return pack(np.clip(ave + (ave - TL) // 2, 0, 255))
    raise WebpError(f"bad predictor mode {mode}")


def _inv_predictor(pix: np.ndarray, w: int, h: int, bits: int, img: np.ndarray) -> None:
    """In-place inverse predictor transform (scalar loop: prediction is
    sequential by construction — each pixel needs its decoded neighbors)."""
    tile_w = (w + (1 << bits) - 1) >> bits
    modes = ((img >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pix[i - 1])  # left
            elif x == 0:
                pred = int(pix[i - w])  # top
            else:
                mode = int(modes[(y >> bits) * tile_w + (x >> bits)])
                left = pix[i - 1]
                top = pix[i - w]
                topleft = pix[i - w - 1]
                # at x == w-1 the flat index i-w+1 is the CURRENT row's
                # first (already reconstructed) pixel — exactly the
                # spec's top-right rule for the rightmost column
                topright = pix[i - w + 1]
                pred = int(
                    _predict(
                        mode,
                        np.uint32(left),
                        np.uint32(top),
                        np.uint32(topleft),
                        np.uint32(topright),
                    )
                )
            p = int(pix[i])
            a = ((p >> 24) + (pred >> 24)) & 0xFF
            r = (((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF
            g = (((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF
            b = ((p & 0xFF) + (pred & 0xFF)) & 0xFF
            pix[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_color_transform(pix: np.ndarray, w: int, h: int, bits: int, img: np.ndarray) -> None:
    tile_w = (w + (1 << bits) - 1) >> bits
    ys, xs = np.divmod(np.arange(w * h), w)
    t = img[(ys >> bits) * tile_w + (xs >> bits)]
    # multipliers pack as: green_to_red in bits 0-7, green_to_blue in
    # 8-15, red_to_blue in 16-23 (ColorTransformElement layout)
    g2r = (t & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((t >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r2b = ((t >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    a = (pix >> 24) & 0xFF
    r = ((pix >> 16) & 0xFF).astype(np.int32)
    g = ((pix >> 8) & 0xFF).astype(np.int32)
    b = (pix & 0xFF).astype(np.int32)
    g_s = g.astype(np.int8).astype(np.int32)
    r = (r + ((g2r * g_s) >> 5)) & 0xFF
    r_s = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
    pix[:] = (a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16) | (
        g.astype(np.uint32) << 8
    ) | b.astype(np.uint32)


def _inv_subtract_green(pix: np.ndarray) -> None:
    g = (pix >> 8) & 0xFF
    r = (((pix >> 16) & 0xFF) + g) & 0xFF
    b = ((pix & 0xFF) + g) & 0xFF
    pix[:] = (pix & 0xFF00FF00) | (r << 16) | b


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L payload -> (h, w, 4) uint8 RGBA."""
    br = _Bits(data)
    if br.read(8) != 0x2F:
        raise WebpError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebpError("bad VP8L version")
    return _decode_vp8l_stream(br, w, h)


def _decode_vp8l_stream(br: _Bits, w: int, h: int) -> np.ndarray:
    """VP8L image stream (transforms + entropy image) with dims given
    externally — the shared body of a VP8L chunk (after its 5-byte
    header) and of an ALPH chunk's lossless payload (implicit dims)."""
    transforms = []  # applied inverse in reverse order
    xsize = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError("duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            img = _decode_entropy_image(br, tw, th, level0=False)
            transforms.append((ttype, bits, img))
        elif ttype == 2:  # subtract green
            transforms.append((2, 0, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, level0=False)
            # palette entries are delta-coded component-wise
            pal = pal.copy()
            for i in range(1, n_colors):
                prev, cur = int(pal[i - 1]), int(pal[i])
                pal[i] = (
                    (((cur >> 24) + (prev >> 24)) & 0xFF) << 24
                    | ((((cur >> 16) + (prev >> 16)) & 0xFF) << 16)
                    | ((((cur >> 8) + (prev >> 8)) & 0xFF) << 8)
                    | (((cur & 0xFF) + (prev & 0xFF)) & 0xFF)
                )
            wb = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
            transforms.append((3, wb, pal))
            xsize = (xsize + (1 << wb) - 1) >> wb

    pix = _decode_entropy_image(br, xsize, h, level0=True)

    for ttype, bits, img in reversed(transforms):
        if ttype == 3:
            pal, wb = img, bits
            if wb == 0:
                idx = (pix >> 8) & 0xFF
                if int(idx.max(initial=0)) >= len(pal):
                    raise WebpError("palette index out of range")
                pix = pal[idx.astype(np.int64)]
            else:
                per = 1 << wb
                ibits = 8 >> wb
                packed = ((pix >> 8) & 0xFF).reshape(h, xsize)
                idx = np.zeros((h, xsize * per), dtype=np.int64)
                for k in range(per):
                    idx[:, k::per] = (packed >> (k * ibits)) & ((1 << ibits) - 1)
                idx = idx[:, :w]
                if int(idx.max(initial=0)) >= len(pal):
                    raise WebpError("palette index out of range")
                pix = pal[idx].reshape(-1)
            xsize = w
        elif ttype == 2:
            _inv_subtract_green(pix)
        elif ttype == 1:
            _inv_color_transform(pix, w, h, bits, img)
        else:
            _inv_predictor(pix, w, h, bits, img)

    a = (pix >> 24) & 0xFF
    r = (pix >> 16) & 0xFF
    g = (pix >> 8) & 0xFF
    b = pix & 0xFF
    return (
        np.stack([r, g, b, a], axis=-1).astype(np.uint8).reshape(h, w, 4)
    )


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    """RIFF chunk: little-endian size + body, padded to even length."""
    return tag + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise WebpError(f"chunk {tag!r} overruns container")
        yield tag, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def _unfilter_alpha(delta: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH chunk's per-pixel prediction filter (WebP
    container spec §Alpha: 0 none, 1 horizontal, 2 vertical,
    3 gradient).  Row 0 of every method unfilters horizontally from a
    zero seed; later rows seed their first pixel from the row above."""
    if method == 0:
        return delta
    h, w = delta.shape
    out = np.empty_like(delta)
    d = delta.astype(np.int32)
    # row 0 is horizontally unfiltered from 0 for every method
    out[0] = np.cumsum(d[0], dtype=np.int64) % 256
    for y in range(1, h):
        prev = out[y - 1].astype(np.int32)
        if method == 2:  # vertical
            out[y] = (prev + d[y]) % 256
            continue
        if method == 1:  # horizontal; first pixel predicts from above
            left = int(prev[0])
            row = out[y]
            dy = d[y]
            for x in range(w):
                left = (left + int(dy[x])) & 0xFF
                row[x] = left
            continue
        # gradient: clip(left + top - top_left)
        left = int(prev[0])
        top_left = int(prev[0])
        row = out[y]
        dy = d[y]
        for x in range(w):
            top = int(prev[x])
            g = left + top - top_left
            g = 0 if g < 0 else 255 if g > 255 else g
            left = (int(dy[x]) + g) & 0xFF
            top_left = top
            row[x] = left
    return out


def decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane.  Compression 0 is a raw
    plane; compression 1 is a headerless VP8L stream whose GREEN channel
    carries the alpha values.  Both then pass the inverse prediction
    filter.  Preprocessing (level reduction) needs no decoder action."""
    if not body:
        raise WebpError("empty ALPH chunk")
    head = body[0]
    if head & 0xC0:
        raise WebpError("reserved ALPH bits set")
    filter_method = (head >> 2) & 0x3
    compression = head & 0x3
    if compression == 0:
        if len(body) - 1 < w * h:
            raise WebpError("raw ALPH plane shorter than w*h")
        plane = np.frombuffer(body, np.uint8, w * h, offset=1).reshape(h, w)
    elif compression == 1:
        pix = _decode_vp8l_stream(_Bits(body[1:]), w, h)
        plane = pix[:, :, 1]  # green channel carries alpha
    else:
        raise WebpError(f"unknown ALPH compression {compression}")
    return _unfilter_alpha(plane, filter_method)


def _decode_frame_payload(
    chunks: list[tuple[bytes, bytes]],
) -> np.ndarray:
    """(ALPH?, VP8|VP8L) chunk run -> RGBA.  ALPH applies to lossy
    frames only (lossless carries its own alpha, spec says ignore)."""
    alph = next((b for t, b in chunks if t == b"ALPH"), None)
    for tag, body in chunks:
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            from pdf_parser_spark import vp8_codec

            y, u, v = vp8_codec.decode_vp8(body)
            rgb = vp8_codec.yuv420_to_rgb(y, u, v)
            hh, ww = rgb.shape[:2]
            if alph is not None:
                alpha = decode_alpha(alph, ww, hh).reshape(hh, ww, 1)
            else:
                alpha = np.full((hh, ww, 1), 255, dtype=np.uint8)
            return np.concatenate([rgb, alpha], axis=-1)
    raise WebpError("no VP8L/VP8 chunk found")


@_boundary
def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (h, w, 4) uint8 RGBA (first/only frame).

    Handles plain and VP8X extended layouts.  VP8L (lossless) decodes
    exactly.  VP8 (lossy) decodes through the from-scratch RFC 6386
    decoder in vp8_codec.py: the Y/U/V planes are bit-identical to any
    conforming decoder's (libwebp-verified); the final YUV->RGB step is
    outside the VP8 spec and uses the documented BT.601 fixed-point
    conversion.  ALPH alpha planes (raw and VP8L-compressed, all four
    prediction filters) apply to lossy frames.  For animations this is
    the first composited frame; decode_webp_frames returns the stack."""
    frames, _ = decode_webp_frames(data)
    return frames[0]


@_boundary
def decode_webp_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    """RIFF/WEBP container -> ((n, h, w, 4) uint8 RGBA frame stack,
    per-frame durations in ms).  Stills return a 1-frame stack with
    duration [0].  Animations (VP8X + ANIM/ANMF) composite onto the
    canvas per the container spec: frame offsets are stored halved,
    blending is straight alpha-over, disposal 1 clears the frame rect
    to the background colour."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP file")
    chunks = list(_iter_chunks(data, 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])))
    if not chunks:
        raise WebpError("empty WebP container")

    if chunks[0][0] != b"VP8X":
        rgba = _decode_frame_payload(chunks)
        return rgba[None, ...], [0]

    vp8x = chunks[0][1]
    if len(vp8x) < 10:
        raise WebpError("short VP8X chunk")
    flags = vp8x[0]
    canvas_w = 1 + int.from_bytes(vp8x[4:7], "little")
    canvas_h = 1 + int.from_bytes(vp8x[7:10], "little")
    has_anim = bool(flags & 0x02)

    if not has_anim:
        rgba = _decode_frame_payload(chunks[1:])
        if rgba.shape[0] != canvas_h or rgba.shape[1] != canvas_w:
            raise WebpError("VP8X canvas does not match frame dims")
        return rgba[None, ...], [0]

    anim = next((b for t, b in chunks if t == b"ANIM"), None)
    if anim is None or len(anim) < 6:
        raise WebpError("animated WebP without ANIM chunk")
    # ANIM background colour is stored B, G, R, A
    bg = np.array([anim[2], anim[1], anim[0], anim[3]], dtype=np.uint8)

    canvas = np.broadcast_to(bg, (canvas_h, canvas_w, 4)).copy()
    frames, durations = [], []
    for tag, body in chunks:
        if tag != b"ANMF":
            continue
        if len(body) < 16:
            raise WebpError("short ANMF chunk")
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = 1 + int.from_bytes(body[6:9], "little")
        fh = 1 + int.from_bytes(body[9:12], "little")
        duration = int.from_bytes(body[12:15], "little")
        fflags = body[15]
        no_blend = bool(fflags & 0x02)
        dispose_bg = bool(fflags & 0x01)
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise WebpError("ANMF frame outside canvas")
        sub = _decode_frame_payload(list(_iter_chunks(body, 16, len(body))))
        if sub.shape[0] != fh or sub.shape[1] != fw:
            raise WebpError("ANMF dims do not match frame payload")
        region = canvas[fy : fy + fh, fx : fx + fw]
        if no_blend:
            region[:] = sub
        else:
            # straight (non-premultiplied) alpha-over, integer exact:
            # out_a = fa + ca*(255-fa)/255, channels weighted likewise
            fa = sub[:, :, 3:4].astype(np.int64)
            ca = region[:, :, 3:4].astype(np.int64)
            blend_a = fa * 255 + ca * (255 - fa)  # x255 scale
            num = (
                sub[:, :, :3].astype(np.int64) * fa * 255
                + region[:, :, :3].astype(np.int64) * ca * (255 - fa)
            )
            safe = np.maximum(blend_a, 1)
            region[:, :, :3] = ((num + safe // 2) // safe).astype(np.uint8)
            region[:, :, 3:4] = ((blend_a + 127) // 255).astype(np.uint8)
        frames.append(canvas.copy())
        durations.append(duration)
        if dispose_bg:
            canvas[fy : fy + fh, fx : fx + fw] = bg
    if not frames:
        raise WebpError("animated WebP without ANMF frames")
    return np.stack(frames), durations

# ---------------------------------------------------------------- encoder


def _value_to_code(v: int) -> tuple[int, int, int]:
    """Inverse of _read_value: value -> (code, extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    vm = v - 1
    for s in range(4, 64):
        e = (s - 2) >> 1
        off = (2 + (s & 1)) << e
        if off <= vm < off + (1 << e):
            return s, e, vm - off
    raise WebpError(f"value {v} out of prefix-code range")


def _write_prefix_code(
    w: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Write one prefix-code description; returns symbol -> (revcode, len)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        w.add(1, 1)  # simple
        w.add(len(used) - 1, 1)
        first = used[0]
        if first > 1:
            w.add(1, 1)
            w.add(first, 8)
        else:
            w.add(0, 1)
            w.add(first, 1)
        if len(used) == 1:
            return {first: (0, 0)}
        w.add(used[1], 8)
        return {first: (0, 1), used[1]: (1, 1)}
    w.add(0, 1)  # complex
    # literal code-length sequence (no 16/17/18 run codes — valid, larger)
    clc_freq: dict[int, int] = {}
    for v in lengths:
        clc_freq[v] = clc_freq.get(v, 0) + 1
    if len(clc_freq) == 1:
        # degenerate: add a never-emitted second symbol so the CLC is a
        # complete 1-bit code rather than a 0-bit special case
        clc_freq[1 if 0 in clc_freq else 0] = 1
    clc_len_map = _huffman_lengths(clc_freq, max_len=7)
    clc_lens = [0] * 19
    for s, ln in clc_len_map.items():
        clc_lens[s] = ln
    num_clc = max(
        (i for i, s in enumerate(_CLC_ORDER) if clc_lens[s] > 0), default=0
    ) + 1
    num_clc = max(num_clc, 4)
    w.add(num_clc - 4, 4)
    for i in range(num_clc):
        w.add(clc_lens[_CLC_ORDER[i]], 3)
    clc_codes = _Prefix.from_codes(clc_lens)
    w.add(0, 1)  # no explicit max-symbol
    for v in lengths:
        code, ln = clc_codes[v]
        w.add(code, ln)
    return _Prefix.from_codes(lengths)


def _freq(values) -> dict[int, int]:
    out: dict[int, int] = {}
    for v in values:
        out[v] = out.get(v, 0) + 1
    return out


def encode_vp8l(
    rgba: "np.ndarray", copies: dict[int, tuple[int, int]] | None = None
) -> bytes:
    """Encode (h, w, 4) uint8 RGBA as a VP8L payload: literal pixels with
    real canonical prefix codes, no transforms, no color cache.

    copies: optional {pixel_index: (length, plane_code)} explicit LZ77
    copies replacing the literals they cover — the distance-map probe and
    the LZ77 decoder tests use this; normal encoding passes None.
    """
    h, w_, _ = rgba.shape
    if not (1 <= w_ <= 1 << 14 and 1 <= h <= 1 << 14):
        raise WebpError("image dimensions out of VP8L range")
    copies = copies or {}
    w = _BitWriter()
    w.add(0x2F, 8)
    w.add(w_ - 1, 14)
    w.add(h - 1, 14)
    w.add(1 if (rgba[:, :, 3] != 255).any() else 0, 1)  # alpha hint
    w.add(0, 3)  # version
    w.add(0, 1)  # no transforms
    w.add(0, 1)  # no color cache
    w.add(0, 1)  # no entropy image (single prefix group)

    flat = rgba.reshape(-1, 4)
    n = len(flat)
    # plan the token stream
    tokens = []  # ("lit", r,g,b,a) | ("copy", len_code, len_e, len_x, d_code, d_e, d_x)
    greens, reds, blues, alphas, dists = [], [], [], [], []
    pos = 0
    while pos < n:
        if pos in copies:
            length, plane = copies[pos]
            lc, le, lx = _value_to_code(length)
            dc, de, dx = _value_to_code(plane)
            tokens.append(("copy", lc, le, lx, dc, de, dx))
            greens.append(256 + lc)
            dists.append(dc)
            pos += length
            continue
        r, g, b, a = (int(x) for x in flat[pos])
        tokens.append(("lit", r, g, b, a))
        greens.append(g)
        reds.append(r)
        blues.append(b)
        alphas.append(a)
        pos += 1

    green_alpha = _GREEN_LITS + _NUM_LENGTH_CODES
    codes = []
    for vals, alphabet in (
        (greens, green_alpha),
        (reds, 256),
        (blues, 256),
        (alphas, 256),
        (dists, _NUM_DIST_CODES),
    ):
        lens = [0] * alphabet
        freq = _freq(vals)
        if not freq:
            freq = {0: 1}  # unused code still needs a valid description
        for s, ln in _huffman_lengths(freq).items():
            lens[s] = ln
        codes.append(_write_prefix_code(w, lens))
    cg, cr, cb, ca, cd = codes

    for tok in tokens:
        if tok[0] == "lit":
            _, r, g, b, a = tok
            w.add(cg[g][0], cg[g][1])
            w.add(cr[r][0], cr[r][1])
            w.add(cb[b][0], cb[b][1])
            w.add(ca[a][0], ca[a][1])
        else:
            _, lc, le, lx, dc, de, dx = tok
            sym = 256 + lc
            w.add(cg[sym][0], cg[sym][1])
            w.add(lx, le)
            w.add(cd[dc][0], cd[dc][1])
            w.add(dx, de)
    return w.bytes()


def encode_webp_lossless(
    rgba: "np.ndarray", copies: dict[int, tuple[int, int]] | None = None
) -> bytes:
    """(h, w, 4) uint8 RGBA -> RIFF/WEBP file with a VP8L chunk."""
    payload = encode_vp8l(rgba, copies)
    riff = b"WEBP" + _riff_chunk(b"VP8L", payload)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp_anim(
    frames: "np.ndarray",
    durations_ms: list[int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    canvas: tuple[int, int] | None = None,
    bg_rgba: tuple[int, int, int, int] = (255, 255, 255, 255),
    no_blend: bool = True,
    dispose_bg: bool = False,
    loop: int = 0,
) -> bytes:
    """Frame stack -> animated RIFF/WEBP (VP8X + ANIM + ANMF chunks,
    each frame a lossless VP8L payload).  The muxer half of the
    animation round-trip oracle for decode_webp_frames — the same
    encoder-as-oracle pattern as encode_gif/encode_vp8_frame.  Frame
    offsets must be even (the container stores them halved)."""
    n, fh, fw = frames.shape[:3]
    offsets = offsets or [(0, 0)] * n
    durations_ms = durations_ms or [100] * n
    cw, ch = canvas or (
        max(x + fw for x, _ in offsets),
        max(y + fh for _, y in offsets),
    )
    r, g, b, a = bg_rgba
    body = _riff_chunk(
        b"VP8X",
        bytes([0x12, 0, 0, 0])  # ANIM | ALPHA flags
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little"),
    )
    body += _riff_chunk(
        b"ANIM", bytes([b, g, r, a]) + loop.to_bytes(2, "little")
    )
    for i in range(n):
        x, y = offsets[i]
        if x & 1 or y & 1:
            raise WebpError("ANMF offsets must be even")
        payload = encode_vp8l(np.ascontiguousarray(frames[i]))
        anmf = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(durations_ms[i]).to_bytes(3, "little")
            + bytes([(0x02 if no_blend else 0) | (0x01 if dispose_bg else 0)])
            + _riff_chunk(b"VP8L", payload)
        )
        body += _riff_chunk(b"ANMF", anmf)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
