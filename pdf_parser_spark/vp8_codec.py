"""From-scratch lossy VP8 (RFC 6386) intra-frame decoder.

Lossy WebP is a single VP8 key frame in a RIFF container; this module
decodes that key frame — boolean arithmetic decoder, frame header,
segment/loop-filter/quantizer state, keyframe intra mode parsing with
B-mode contexts, DCT token decoding over the published probability
tables, exact integer inverse WHT/DCT, all ten 4x4 B-prediction modes
plus the 16x16 and chroma 8x8 modes, and both the normal and simple
loop filters — implemented from RFC 6386's published algorithms alone.

The decoder's output is the NORMATIVE part of the format: RFC 6386's
reconstruction is integer-exact, so the Y/U/V planes produced here are
byte-identical to any conforming decoder's.  tests/test_vp8_codec.py
asserts exactly that against libwebp's WebPDecodeYUV on libwebp-encoded
bitstreams across sizes, qualities and content (the same oracle pattern
as zstd_codec/brotli_codec: the container's real C library is the
ground truth, the pure decoder is the from-scratch correctness
reference).  YUV->RGB conversion is NOT part of VP8 and is provided
separately (`yuv420_to_rgb`) with its coefficients documented.

Constant tables (coefficient probabilities, keyframe B-mode
probabilities, dequantization lookups) live in vp8_tables.py, extracted
from the container's libwebp by scripts/derive_vp8_tables.py and
re-derived in tests — see that module's provenance note.

The reference repo (acstumler/pdf_parser) has no image codecs; this
module serves the multimodal operators (operators/multimodal.py,
webp_codec.decode_webp), closing the "lossy VP8 gated" scope line.

Scale note: like the other from-scratch codecs this is a correctness
reference — operators dispatch to native libwebp when loadable and fall
back here (same rationale as BENCH.md's codec-throughput section).
"""

from __future__ import annotations

import numpy as np

from pdf_parser_spark.media_codecs import format_boundary
from pdf_parser_spark.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)


class Vp8Error(ValueError):
    """Malformed or unsupported VP8 stream."""


_boundary = format_boundary("VP8", Vp8Error)

# ---------------------------------------------------------------------------
# RFC 6386 §8/§11 trees (tree_index pairs; negative = leaf)

# intra Y modes (§11.2): DC, V, H, TM, B_PRED
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# intra B (4x4) modes (§11.2)
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]

BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]

UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]

MB_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

# token tree (§13.2); ids: DCT_0..DCT_4 = 0..4, cat1..cat6 = 5..10, EOB = 11
DCT_EOB = 11
COEFF_TREE = [
    -DCT_EOB, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
]
# cat extra-bit probabilities and value bases (§13.2)
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASE = [5, 7, 11, 19, 35, 67]

COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# 16x16-mode MBs contribute these B modes as context for neighbours (§11.3)
_YMODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


class BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder (reads past-the-end as 0)."""

    __slots__ = ("d", "pos", "end", "value", "rng", "bit_count")

    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.d = data
        self.end = len(data) if end is None else end
        self.pos = start
        self.value = (self._byte() << 8) | self._byte()
        self.rng = 255
        self.bit_count = 0

    def _byte(self) -> int:
        p = self.pos
        if p >= self.end:
            self.pos = p + 1
            return 0
        self.pos = p + 1
        return self.d[p]

    def bit(self, prob: int = 128) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.rng -= split
            self.value -= big
        else:
            ret = 0
            self.rng = split
        # renormalize
        while self.rng < 128:
            self.value = (self.value << 1) & 0xFFFFFF
            self.rng <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit() else v

    def tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def _wrap16(v: int) -> int:
    """Coefficient banks are int16 in every real decoder (the RFC's
    reference code types them `short`); out-of-gamut levels that only a
    hostile stream can produce wrap rather than widen.  Matching the
    wrap keeps this decoder bit-identical to libwebp on such streams."""
    return ((v + 0x8000) & 0xFFFF) - 0x8000


# ---------------------------------------------------------------------------
# exact integer inverse transforms (§14.3-14.4)


def iwht4x4(blk: list[int]) -> list[int]:
    """Inverse Walsh-Hadamard for the Y2 block (RFC 6386 §14.3)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = blk[i] + blk[12 + i]
        b1 = blk[4 + i] + blk[8 + i]
        c1 = blk[4 + i] - blk[8 + i]
        d1 = blk[i] - blk[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = _wrap16((a1 + b1 + 3) >> 3)
        out[r + 1] = _wrap16((c1 + d1 + 3) >> 3)
        out[r + 2] = _wrap16((a1 - b1 + 3) >> 3)
        out[r + 3] = _wrap16((d1 - c1 + 3) >> 3)
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16 (§14.4)
_C2 = 35468  # sin(pi/8)*sqrt(2), Q16


def idct4x4(blk: list[int]) -> list[int]:
    """Inverse DCT, exact integer per RFC 6386 §14.4 (Python's >> is the
    arithmetic shift the spec's reference code relies on)."""
    tmp = [0] * 16
    for i in range(4):
        i4, i8, i12 = blk[4 + i], blk[8 + i], blk[12 + i]
        a1 = blk[i] + i8
        b1 = blk[i] - i8
        c1 = ((i4 * _C2) >> 16) - (i12 + ((i12 * _C1) >> 16))
        d1 = (i4 + ((i4 * _C1) >> 16)) + ((i12 * _C2) >> 16)
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        t1, t2, t3 = tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = tmp[r] + t2
        b1 = tmp[r] - t2
        c1 = ((t1 * _C2) >> 16) - (t3 + ((t3 * _C1) >> 16))
        d1 = (t1 + ((t1 * _C1) >> 16)) + ((t3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# header state


class _FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_delta", "mode_lf_delta",
        "quant", "coeff_probs", "use_skip", "prob_skip_false",
        "num_parts",
    )


def _parse_quant(bd: BoolDecoder) -> dict:
    """§9.6 quantizer indices (base + five optional deltas)."""
    q = {"y_ac": bd.literal(7)}
    for key in ("y_dc", "y2_dc", "y2_ac", "uv_dc", "uv_ac"):
        q[key] = bd.signed_literal(4) if bd.bit() else 0
    return q


def _segment_quant(hdr: _FrameHeader, seg: int) -> tuple:
    """Per-segment dequant factors (§9.6, §14.1)."""
    q = hdr.quant
    if hdr.seg_enabled:
        base = hdr.seg_quant[seg] if hdr.seg_abs else q["y_ac"] + hdr.seg_quant[seg]
    else:
        base = q["y_ac"]
    base = _clamp(base, 0, 127)

    def dq_dc(delta):
        return DC_QLOOKUP[_clamp(base + delta, 0, 127)]

    def dq_ac(delta):
        return AC_QLOOKUP[_clamp(base + delta, 0, 127)]

    y1 = (dq_dc(q["y_dc"]), dq_ac(0))
    y2 = (dq_dc(q["y2_dc"]) * 2, max(8, (dq_ac(q["y2_ac"]) * 155) // 100))
    uv = (min(132, dq_dc(q["uv_dc"])), dq_ac(q["uv_ac"]))
    return y1, y2, uv


def _parse_header(bd: BoolDecoder) -> _FrameHeader:
    hdr = _FrameHeader()
    bd.bit()  # color_space (must be 0 for the profile libwebp writes)
    bd.bit()  # clamping_type (reconstruction clamps regardless)

    hdr.seg_enabled = bd.bit()
    hdr.seg_update_map = 0
    hdr.seg_abs = 0
    hdr.seg_quant = [0] * 4
    hdr.seg_lf = [0] * 4
    hdr.seg_tree_probs = [255] * 3
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.bit()
        update_data = bd.bit()
        if update_data:
            hdr.seg_abs = bd.bit()
            for i in range(4):
                if bd.bit():
                    hdr.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.bit():
                    hdr.seg_lf[i] = bd.signed_literal(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.bit():
                    hdr.seg_tree_probs[i] = bd.literal(8)

    hdr.filter_type = bd.bit()  # 1 = simple
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bd.bit()
    hdr.ref_lf_delta = [0] * 4
    hdr.mode_lf_delta = [0] * 4
    if hdr.lf_delta_enabled and bd.bit():  # mode_ref_lf_delta_update
        for arr in (hdr.ref_lf_delta, hdr.mode_lf_delta):
            for i in range(4):
                if bd.bit():
                    arr[i] = bd.signed_literal(6)

    hdr.num_parts = 1 << bd.literal(2)
    hdr.quant = _parse_quant(bd)
    bd.bit()  # refresh_entropy_probs (no effect within a single key frame)

    # §13.4 token probability updates
    probs = [[[row[:] for row in ctx] for ctx in band] for band in COEFF_PROBS]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bit(COEFF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    hdr.coeff_probs = probs

    hdr.use_skip = bd.bit()
    hdr.prob_skip_false = bd.literal(8) if hdr.use_skip else 0
    return hdr


# ---------------------------------------------------------------------------
# residual token decoding (§13)


def _decode_coeffs(
    bd: BoolDecoder,
    probs,  # coeff_probs[plane]
    ctx: int,
    first: int,
    dq_dc: int,
    dq_ac: int,
) -> list[int] | None:
    """Decode one 4x4 block's tokens; returns dequantized coefficients in
    raster order, or None if the block is all-zero."""
    coeffs = None
    i = first
    skip_eob = False
    while i < 16:
        p = probs[COEFF_BANDS[i]][ctx]
        token = bd.tree(COEFF_TREE, p, 2 if skip_eob else 0)
        if token == DCT_EOB:
            break
        if token == 0:  # DCT_0
            skip_eob = True
            ctx = 0
            i += 1
            continue
        skip_eob = False
        if token <= 4:
            v = token
        else:
            cat = token - 5
            v = CAT_BASE[cat]
            bitpos = 0
            for cp in CAT_PROBS[cat]:
                v += bd.bit(cp) << (len(CAT_PROBS[cat]) - 1 - bitpos)
                bitpos += 1
        ctx = 1 if v == 1 else 2
        if bd.bit():
            v = -v
        if coeffs is None:
            coeffs = [0] * 16
        coeffs[ZIGZAG[i]] = _wrap16(v * (dq_dc if ZIGZAG[i] == 0 else dq_ac))
        i += 1
    return coeffs


# ---------------------------------------------------------------------------
# intra prediction (§12)


def _pred_dc(above, left, size: int, has_above: bool, has_left: bool) -> int:
    if has_above and has_left:
        total = sum(above[:size]) + sum(left[:size])
        return (total + size) >> _dc_shift(size, 2)
    if has_above:
        return (sum(above[:size]) + (size >> 1)) >> _dc_shift(size, 1)
    if has_left:
        return (sum(left[:size]) + (size >> 1)) >> _dc_shift(size, 1)
    return 128


def _dc_shift(size: int, sides: int) -> int:
    # size 16: 4 (one side) / 5 (both); size 8: 3 / 4
    base = 4 if size == 16 else 3
    return base + (sides - 1)


def _pred_block(mode: int, above, left, al: int, size: int,
                has_above: bool, has_left: bool) -> np.ndarray:
    """16x16 or 8x8 whole-block intra prediction (§12.2)."""
    if mode == DC_PRED:
        return np.full((size, size), _pred_dc(above, left, size, has_above,
                                              has_left), dtype=np.int32)
    if mode == V_PRED:
        return np.tile(np.asarray(above[:size], dtype=np.int32), (size, 1))
    if mode == H_PRED:
        return np.tile(
            np.asarray(left[:size], dtype=np.int32).reshape(size, 1), (1, size)
        )
    # TM_PRED
    a = np.asarray(above[:size], dtype=np.int32)
    lcol = np.asarray(left[:size], dtype=np.int32).reshape(size, 1)
    return np.clip(lcol + a - al, 0, 255)


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _pred_b(mode: int, a, l, p: int) -> list[list[int]]:
    """4x4 B-mode prediction (§12.3). ``a`` has 8 entries (above +
    above-right), ``l`` 4 (left), ``p`` is the above-left pixel."""
    b = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(a[:4]) + sum(l) + 4) >> 3
        for r in range(4):
            for c in range(4):
                b[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                b[r][c] = _clamp(l[r] + a[c] - p, 0, 255)
    elif mode == B_VE:
        row = [
            _avg3(p, a[0], a[1]),
            _avg3(a[0], a[1], a[2]),
            _avg3(a[1], a[2], a[3]),
            _avg3(a[2], a[3], a[4]),
        ]
        for r in range(4):
            b[r] = row[:]
    elif mode == B_HE:
        col = [
            _avg3(p, l[0], l[1]),
            _avg3(l[0], l[1], l[2]),
            _avg3(l[1], l[2], l[3]),
            _avg3(l[2], l[3], l[3]),
        ]
        for r in range(4):
            for c in range(4):
                b[r][c] = col[r]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                d = r + c
                if d < 6:
                    b[r][c] = _avg3(a[d], a[d + 1], a[d + 2])
                else:
                    b[r][c] = _avg3(a[6], a[7], a[7])
    elif mode == B_RD:
        pp = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                d = c - r + 3  # 0..6
                b[r][c] = _avg3(pp[d], pp[d + 1], pp[d + 2])
    elif mode == B_VR:
        pp = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2], a[3]]
        b[3][0] = _avg3(pp[1], pp[2], pp[3])
        b[2][0] = _avg3(pp[2], pp[3], pp[4])
        b[3][1] = b[1][0] = _avg3(pp[3], pp[4], pp[5])
        b[2][1] = b[0][0] = _avg2(pp[4], pp[5])
        b[3][2] = b[1][1] = _avg3(pp[4], pp[5], pp[6])
        b[2][2] = b[0][1] = _avg2(pp[5], pp[6])
        b[3][3] = b[1][2] = _avg3(pp[5], pp[6], pp[7])
        b[2][3] = b[0][2] = _avg2(pp[6], pp[7])
        b[1][3] = _avg3(pp[6], pp[7], pp[8])
        b[0][3] = _avg2(pp[7], pp[8])
    elif mode == B_VL:
        b[0][0] = _avg2(a[0], a[1])
        b[1][0] = _avg3(a[0], a[1], a[2])
        b[2][0] = b[0][1] = _avg2(a[1], a[2])
        b[1][1] = b[3][0] = _avg3(a[1], a[2], a[3])
        b[2][1] = b[0][2] = _avg2(a[2], a[3])
        b[3][1] = b[1][2] = _avg3(a[2], a[3], a[4])
        b[2][2] = b[0][3] = _avg2(a[3], a[4])
        b[3][2] = b[1][3] = _avg3(a[3], a[4], a[5])
        b[2][3] = _avg3(a[4], a[5], a[6])
        b[3][3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HD:
        pp = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2]]
        b[3][0] = _avg2(pp[0], pp[1])
        b[3][1] = _avg3(pp[0], pp[1], pp[2])
        b[2][0] = b[3][2] = _avg2(pp[1], pp[2])
        b[2][1] = b[3][3] = _avg3(pp[1], pp[2], pp[3])
        b[2][2] = b[1][0] = _avg2(pp[2], pp[3])
        b[2][3] = b[1][1] = _avg3(pp[2], pp[3], pp[4])
        b[1][2] = b[0][0] = _avg2(pp[3], pp[4])
        b[1][3] = b[0][1] = _avg3(pp[3], pp[4], pp[5])
        b[0][2] = _avg3(pp[4], pp[5], pp[6])
        b[0][3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == B_HU:
        b[0][0] = _avg2(l[0], l[1])
        b[0][1] = _avg3(l[0], l[1], l[2])
        b[0][2] = b[1][0] = _avg2(l[1], l[2])
        b[0][3] = b[1][1] = _avg3(l[1], l[2], l[3])
        b[1][2] = b[2][0] = _avg2(l[2], l[3])
        b[1][3] = b[2][1] = _avg3(l[2], l[3], l[3])
        b[2][2] = b[2][3] = b[3][0] = b[3][1] = b[3][2] = b[3][3] = l[3]
    else:
        raise Vp8Error(f"bad B mode {mode}")
    return b


# ---------------------------------------------------------------------------
# loop filter (§15)


def _u2s(v: int) -> int:
    return v - 128


def _c(v: int) -> int:
    return _clamp(v, -128, 127)


def _s2u(v: int) -> int:
    return _c(v) + 128


class _Edge:
    """A p3..q3 view across a filter edge inside a numpy plane."""

    __slots__ = ("plane", "fixed", "axis", "base")

    def __init__(self, plane, axis: int, fixed: int, base: int):
        # axis 0: horizontal edge (rows vary), axis 1: vertical (cols vary)
        self.plane = plane
        self.axis = axis
        self.fixed = fixed  # the row (axis 0) / col (axis 1) of q0
        self.base = base  # the cross index (col for axis 0)

    def get(self, off: int) -> int:
        # off -4..3 relative to the edge: p3..p0 = -4..-1, q0..q3 = 0..3
        i = self.fixed + off
        if self.axis == 0:
            return int(self.plane[i, self.base])
        return int(self.plane[self.base, i])

    def set(self, off: int, v: int) -> None:
        i = self.fixed + off
        if self.axis == 0:
            self.plane[i, self.base] = v
        else:
            self.plane[self.base, i] = v


def _common_adjust(e: _Edge, use_outer: bool) -> int:
    p1 = _u2s(e.get(-2))
    p0 = _u2s(e.get(-1))
    q0 = _u2s(e.get(0))
    q1 = _u2s(e.get(1))
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    e.set(0, _s2u(q0 - f1))
    e.set(-1, _s2u(p0 + f2))
    return f1


def _filter_mask(e: _Edge, interior: int, edge_limit: int) -> bool:
    p3, p2, p1, p0 = (e.get(-4), e.get(-3), e.get(-2), e.get(-1))
    q0, q1, q2, q3 = (e.get(0), e.get(1), e.get(2), e.get(3))
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit
        and abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior
        and abs(q3 - q2) <= interior
    )


def _hev(e: _Edge, thresh: int) -> bool:
    return abs(e.get(-2) - e.get(-1)) > thresh or abs(e.get(1) - e.get(0)) > thresh


def _subblock_filter(e: _Edge, hev_t: int, interior: int, edge_limit: int):
    if not _filter_mask(e, interior, edge_limit):
        return
    hev = _hev(e, hev_t)
    a = _common_adjust(e, hev)
    if not hev:
        a = (a + 1) >> 1
        e.set(1, _s2u(_u2s(e.get(1)) - a))
        e.set(-2, _s2u(_u2s(e.get(-2)) + a))


def _mb_filter(e: _Edge, hev_t: int, interior: int, edge_limit: int):
    if not _filter_mask(e, interior, edge_limit):
        return
    if _hev(e, hev_t):
        _common_adjust(e, True)
        return
    p2, p1, p0 = _u2s(e.get(-3)), _u2s(e.get(-2)), _u2s(e.get(-1))
    q0, q1, q2 = _u2s(e.get(0)), _u2s(e.get(1)), _u2s(e.get(2))
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    e.set(0, _s2u(q0 - a))
    e.set(-1, _s2u(p0 + a))
    a = _c((18 * w + 63) >> 7)
    e.set(1, _s2u(q1 - a))
    e.set(-2, _s2u(p1 + a))
    a = _c((9 * w + 63) >> 7)
    e.set(2, _s2u(q2 - a))
    e.set(-3, _s2u(p2 + a))


def _simple_filter(e: _Edge, edge_limit: int):
    p1, p0, q0, q1 = e.get(-2), e.get(-1), e.get(0), e.get(1)
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _common_adjust(e, True)


# ---------------------------------------------------------------------------
# frame decode


class _MbInfo:
    __slots__ = ("ymode", "uvmode", "bmodes", "segment", "skip", "has_coeffs")


def _parse_modes(bd: BoolDecoder, hdr: _FrameHeader) -> list[_MbInfo]:
    """§11.2 keyframe per-MB prediction records (all MBs, raster order)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    # B-mode context rows: above[mb_x*4 + i], left[4]
    above = [[B_DC] * 4 for _ in range(mb_w)]
    mbs: list[_MbInfo] = []
    for mb_y in range(mb_h):
        left = [B_DC] * 4
        for mb_x in range(mb_w):
            mi = _MbInfo()
            mi.segment = 0
            if hdr.seg_enabled and hdr.seg_update_map:
                mi.segment = bd.tree(MB_SEGMENT_TREE, hdr.seg_tree_probs)
            mi.skip = bool(bd.bit(hdr.prob_skip_false)) if hdr.use_skip else False
            mi.ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if mi.ymode == B_PRED:
                bmodes = [0] * 16
                for i in range(16):
                    r, c = i >> 2, i & 3
                    a_mode = above[mb_x][c] if r == 0 else bmodes[i - 4]
                    l_mode = left[r] if c == 0 else bmodes[i - 1]
                    bmodes[i] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[a_mode][l_mode]
                    )
                mi.bmodes = bmodes
            else:
                mi.bmodes = [_YMODE_TO_B[mi.ymode]] * 16
            above[mb_x] = mi.bmodes[12:16]
            left = [mi.bmodes[3], mi.bmodes[7], mi.bmodes[11], mi.bmodes[15]]
            mi.uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            mbs.append(mi)
    return mbs


@_boundary
def decode_vp8(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a VP8 key frame; returns (y, u, v) uint8 planes of shape
    (h, w), (ceil(h/2), ceil(w/2)) x2 — the normative reconstruction."""
    if len(data) < 10:
        raise Vp8Error("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise Vp8Error("interframe: lossy WebP is always a key frame")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 keyframe start code")
    w16 = data[6] | (data[7] << 8)
    h16 = data[8] | (data[9] << 8)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if not width or not height:
        raise Vp8Error("zero frame dimension")
    if 10 + part1_size > len(data):
        raise Vp8Error("first partition overruns payload")

    bd = BoolDecoder(data, 10, 10 + part1_size)
    hdr = _parse_header(bd)
    hdr.width, hdr.height = width, height
    hdr.mb_w = (width + 15) >> 4
    hdr.mb_h = (height + 15) >> 4

    # token partitions (§9.5): sizes trail the first partition
    pos = 10 + part1_size
    part_sizes = []
    for i in range(hdr.num_parts - 1):
        if pos + 3 > len(data):
            raise Vp8Error("truncated partition size table")
        part_sizes.append(data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16))
        pos += 3
    starts, offs = [], pos
    for s in part_sizes:
        starts.append((offs, offs + s))
        offs += s
    starts.append((offs, len(data)))
    if any(e > len(data) for _, e in starts):
        raise Vp8Error("token partition overruns payload")
    token_bds = [BoolDecoder(data, s, e) for s, e in starts]

    mbs = _parse_modes(bd, hdr)
    seg_dq = [_segment_quant(hdr, s) for s in range(4)]

    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    Y = np.empty((mb_h * 16, mb_w * 16), dtype=np.int32)
    U = np.empty((mb_h * 8, mb_w * 8), dtype=np.int32)
    V = np.empty((mb_h * 8, mb_w * 8), dtype=np.int32)

    # §13 nonzero contexts
    nz_y_above = [0] * (mb_w * 4)
    nz_u_above = [0] * (mb_w * 2)
    nz_v_above = [0] * (mb_w * 2)
    nz_y2_above = [0] * mb_w

    for mb_y in range(mb_h):
        tbd = token_bds[mb_y % hdr.num_parts]
        nz_y_left = [0] * 4
        nz_u_left = [0] * 2
        nz_v_left = [0] * 2
        nz_y2_left = 0
        for mb_x in range(mb_w):
            mi = mbs[mb_y * mb_w + mb_x]
            (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac) = seg_dq[mi.segment]
            has_y2 = mi.ymode != B_PRED

            y_blocks: list[list[int] | None] = [None] * 16
            u_blocks: list[list[int] | None] = [None] * 4
            v_blocks: list[list[int] | None] = [None] * 4
            y2_out = None
            any_nz = False

            if mi.skip:
                # §13: a skipped MB resets Y/U/V contexts; Y2 context only
                # when the MB actually has a Y2 block.
                for i in range(4):
                    nz_y_above[mb_x * 4 + i] = 0
                    nz_y_left[i] = 0
                for i in range(2):
                    nz_u_above[mb_x * 2 + i] = 0
                    nz_u_left[i] = 0
                    nz_v_above[mb_x * 2 + i] = 0
                    nz_v_left[i] = 0
                if has_y2:
                    nz_y2_above[mb_x] = 0
                    nz_y2_left = 0
            else:
                probs = hdr.coeff_probs
                if has_y2:
                    ctx = nz_y2_above[mb_x] + nz_y2_left
                    y2 = _decode_coeffs(tbd, probs[1], ctx, 0, y2dc, y2ac)
                    nz = y2 is not None
                    nz_y2_above[mb_x] = nz_y2_left = int(nz)
                    any_nz |= nz
                    if y2 is not None:
                        y2_out = iwht4x4(y2)
                    plane, first = 0, 1
                else:
                    plane, first = 3, 0
                for i in range(16):
                    r, c = i >> 2, i & 3
                    ctx = nz_y_above[mb_x * 4 + c] + nz_y_left[r]
                    blk = _decode_coeffs(
                        tbd, probs[plane], ctx, first, y1dc, y1ac
                    )
                    nz = blk is not None
                    nz_y_above[mb_x * 4 + c] = nz_y_left[r] = int(nz)
                    any_nz |= nz
                    y_blocks[i] = blk
                for blocks, nz_above, nz_left in (
                    (u_blocks, nz_u_above, nz_u_left),
                    (v_blocks, nz_v_above, nz_v_left),
                ):
                    for i in range(4):
                        r, c = i >> 1, i & 1
                        ctx = nz_above[mb_x * 2 + c] + nz_left[r]
                        blk = _decode_coeffs(
                            tbd, probs[2], ctx, 0, uvdc, uvac
                        )
                        nz = blk is not None
                        nz_above[mb_x * 2 + c] = nz_left[r] = int(nz)
                        any_nz |= nz
                        blocks[i] = blk

            if y2_out is not None:
                for i in range(16):
                    if y_blocks[i] is None:
                        y_blocks[i] = [0] * 16
                    y_blocks[i][0] = y2_out[i]
            mi.has_coeffs = any_nz

            _reconstruct_mb(
                Y, U, V, mi, mb_x, mb_y, mb_w, mb_h, y_blocks, u_blocks,
                v_blocks,
            )

    _loop_filter(Y, U, V, hdr, mbs)

    y = Y[:height, :width].astype(np.uint8)
    u = U[: (height + 1) >> 1, : (width + 1) >> 1].astype(np.uint8)
    v = V[: (height + 1) >> 1, : (width + 1) >> 1].astype(np.uint8)
    return y, u, v


def _edge_pixels(plane: np.ndarray, x0: int, y0: int, size: int,
                 mb_x: int, mb_y: int):
    """(above, left, above_left, has_above, has_left) for a whole-block
    prediction at (y0, x0).  Frame edges use the §12.2 dummy rows: 127
    above, 129 left, 127 above-left on the top row."""
    has_above, has_left = mb_y > 0, mb_x > 0
    above = (
        plane[y0 - 1, x0 : x0 + size].tolist() if has_above else [127] * size
    )
    left = (
        plane[y0 : y0 + size, x0 - 1].tolist() if has_left else [129] * size
    )
    if has_above and has_left:
        al = int(plane[y0 - 1, x0 - 1])
    elif has_above:  # left frame edge, not top: libwebp/dixie use 129
        al = 129
    else:  # top row (including the corner MB): 127
        al = 127
    return above, left, al, has_above, has_left


def _add_residual(plane: np.ndarray, y0: int, x0: int,
                  blk: list[int] | None) -> None:
    if blk is None:
        return
    res = idct4x4(blk)
    tgt = plane[y0 : y0 + 4, x0 : x0 + 4]
    arr = np.asarray(res, dtype=np.int32).reshape(4, 4)
    np.clip(tgt + arr, 0, 255, out=tgt)


def _reconstruct_mb(Y, U, V, mi: _MbInfo, mb_x: int, mb_y: int,
                    mb_w: int, mb_h: int, y_blocks, u_blocks, v_blocks):
    yx, yy = mb_x * 16, mb_y * 16

    if mi.ymode == B_PRED:
        # top-right pixels for column-3 subblocks (§12.3 / libwebp rule):
        # every row reuses the row above the MB, never in-MB pixels
        if mb_y == 0:
            top_right = [127] * 4
        elif mb_x == mb_w - 1:
            top_right = [int(Y[yy - 1, yx + 15])] * 4
        else:
            top_right = Y[yy - 1, yx + 16 : yx + 20].tolist()
        for i in range(16):
            r, c = i >> 2, i & 3
            bx, by = yx + c * 4, yy + r * 4
            # above 4 + above-right 4
            if by == 0:
                above = [127] * 8
            else:
                above = Y[by - 1, bx : bx + 4].tolist()
                if c == 3:
                    above += top_right
                else:
                    above += Y[by - 1, bx + 4 : bx + 8].tolist()
            if bx == 0:
                left = [129] * 4
            else:
                left = Y[by : by + 4, bx - 1].tolist()
            if bx == 0:
                al = 127 if by == 0 else 129
            elif by == 0:
                al = 127
            else:
                al = int(Y[by - 1, bx - 1])
            pred = _pred_b(mi.bmodes[i], above, left, al)
            Y[by : by + 4, bx : bx + 4] = np.asarray(pred, dtype=np.int32)
            _add_residual(Y, by, bx, y_blocks[i])
    else:
        above, left, al, ha, hl = _edge_pixels(Y, yx, yy, 16, mb_x, mb_y)
        Y[yy : yy + 16, yx : yx + 16] = _pred_block(
            mi.ymode, above, left, al, 16, ha, hl
        )
        for i in range(16):
            _add_residual(Y, yy + (i >> 2) * 4, yx + (i & 3) * 4, y_blocks[i])

    cx, cy = mb_x * 8, mb_y * 8
    for plane, blocks in ((U, u_blocks), (V, v_blocks)):
        above, left, al, ha, hl = _edge_pixels(plane, cx, cy, 8, mb_x, mb_y)
        plane[cy : cy + 8, cx : cx + 8] = _pred_block(
            mi.uvmode, above, left, al, 8, ha, hl
        )
        for i in range(4):
            _add_residual(plane, cy + (i >> 1) * 4, cx + (i & 1) * 4, blocks[i])


def _mb_filter_level(hdr: _FrameHeader, mi: _MbInfo) -> int:
    if hdr.seg_enabled:
        lvl = (
            hdr.seg_lf[mi.segment]
            if hdr.seg_abs
            else hdr.filter_level + hdr.seg_lf[mi.segment]
        )
        lvl = _clamp(lvl, 0, 63)
    else:
        lvl = hdr.filter_level
    if hdr.lf_delta_enabled:
        lvl += hdr.ref_lf_delta[0]  # key frame: every MB is INTRA (ref 0)
        if mi.ymode == B_PRED:
            lvl += hdr.mode_lf_delta[0]
        lvl = _clamp(lvl, 0, 63)
    return lvl


def _loop_filter(Y, U, V, hdr: _FrameHeader, mbs) -> None:
    """§15 frame-level loop filter, raster MB order, normative edge
    sequence (left MB edge, inner vertical, top MB edge, inner
    horizontal), applied to the reconstructed (pre-filter) planes."""
    if hdr.filter_level == 0:
        return
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    simple = hdr.filter_type == 1
    sharp = hdr.sharpness

    level_cache: dict[tuple, tuple] = {}

    def limits(level: int) -> tuple:
        key = level
        if key not in level_cache:
            interior = level
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            mb_lim = (level + 2) * 2 + interior
            sb_lim = level * 2 + interior
            hev = 2 if level >= 40 else (1 if level >= 15 else 0)
            level_cache[key] = (interior, mb_lim, sb_lim, hev)
        return level_cache[key]

    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mi = mbs[mb_y * mb_w + mb_x]
            level = _mb_filter_level(hdr, mi)
            if level == 0:
                continue
            interior, mb_lim, sb_lim, hev_t = limits(level)
            inner = mi.has_coeffs or mi.ymode == B_PRED
            yx, yy = mb_x * 16, mb_y * 16
            cx, cy = mb_x * 8, mb_y * 8

            if simple:
                if mb_x > 0:
                    for r in range(16):
                        _simple_filter(_Edge(Y, 1, yx, yy + r), mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(_Edge(Y, 1, yx + dx, yy + r), sb_lim)
                if mb_y > 0:
                    for c in range(16):
                        _simple_filter(_Edge(Y, 0, yy, yx + c), mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _simple_filter(_Edge(Y, 0, yy + dy, yx + c), sb_lim)
                continue

            if mb_x > 0:
                for r in range(16):
                    _mb_filter(_Edge(Y, 1, yx, yy + r), hev_t, interior, mb_lim)
                for r in range(8):
                    _mb_filter(_Edge(U, 1, cx, cy + r), hev_t, interior, mb_lim)
                    _mb_filter(_Edge(V, 1, cx, cy + r), hev_t, interior, mb_lim)
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _subblock_filter(
                            _Edge(Y, 1, yx + dx, yy + r), hev_t, interior, sb_lim
                        )
                for r in range(8):
                    _subblock_filter(
                        _Edge(U, 1, cx + 4, cy + r), hev_t, interior, sb_lim
                    )
                    _subblock_filter(
                        _Edge(V, 1, cx + 4, cy + r), hev_t, interior, sb_lim
                    )
            if mb_y > 0:
                for c in range(16):
                    _mb_filter(_Edge(Y, 0, yy, yx + c), hev_t, interior, mb_lim)
                for c in range(8):
                    _mb_filter(_Edge(U, 0, cy, cx + c), hev_t, interior, mb_lim)
                    _mb_filter(_Edge(V, 0, cy, cx + c), hev_t, interior, mb_lim)
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _subblock_filter(
                            _Edge(Y, 0, yy + dy, yx + c), hev_t, interior, sb_lim
                        )
                for c in range(8):
                    _subblock_filter(
                        _Edge(U, 0, cy + 4, cx + c), hev_t, interior, sb_lim
                    )
                    _subblock_filter(
                        _Edge(V, 0, cy + 4, cx + c), hev_t, interior, sb_lim
                    )


# ---------------------------------------------------------------------------
# minimal VP8 key-frame ENCODER (§8 bool encoder + §9/§19 syntax)
#
# Purpose-built round-trip oracle: it writes structurally simple frames
# (one token partition, no segmentation, no probability updates) with
# caller-chosen prediction modes and quantized coefficient levels, so
# decoder behaviour can be pinned per-mode/per-token against both this
# module's decoder and libwebp's.  The same encoder-as-oracle pattern as
# flac_codec/jpeg_codec.


class BoolEncoder:
    """RFC 6386 §8 boolean encoder.  ``low`` is kept as an unbounded int
    so byte carries fall out of ordinary arithmetic instead of the
    reference's explicit carry-walk."""

    def __init__(self):
        self.low = 0
        self.rng = 255
        self.shifts = 0

    def bit(self, b: int, prob: int = 128) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if b:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            self.low <<= 1
            self.shifts += 1

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.bit(1 if v < 0 else 0)

    def tree(self, tree: list[int], probs, value: int, start: int = 0) -> None:
        # find the root-to-leaf path, then emit it
        def walk(i, acc):
            for b in (0, 1):
                nxt = tree[i + b]
                if nxt <= 0:
                    if -nxt == value:
                        return acc + [(i, b)]
                else:
                    found = walk(nxt, acc + [(i, b)])
                    if found is not None:
                        return found
            return None

        path = walk(start, [])
        if path is None:
            raise Vp8Error(f"value {value} not in tree")
        for node, b in path:
            self.bit(b, probs[node >> 1])

    def finish(self) -> bytes:
        # the decoder primes 8+shifts significant bit positions; emit
        # low at that scale, MSB-first, padded right to a whole byte
        nbits = 8 + self.shifts
        pad = (8 - nbits % 8) % 8
        return (self.low << pad).to_bytes((nbits + pad) // 8, "big")


def _write_coeff_block(
    enc: BoolEncoder, probs, ctx: int, first: int, levels: list[int]
) -> int:
    """Write one 4x4 block's quantized levels (raster order) as tokens;
    returns the new nonzero flag."""
    # scan-order levels
    scan = [levels[ZIGZAG[i]] for i in range(16)]
    last = -1
    for i in range(first, 16):
        if scan[i]:
            last = i
    i = first
    skip_eob = False
    while i < 16:
        p = probs[COEFF_BANDS[i]][ctx]
        if i > last:
            enc.tree(COEFF_TREE, p, DCT_EOB, 2 if skip_eob else 0)
            return int(last >= first)
        v = scan[i]
        a = abs(v)
        if a == 0:
            enc.tree(COEFF_TREE, p, 0, 2 if skip_eob else 0)
            skip_eob = True
            ctx = 0
            i += 1
            continue
        if a <= 4:
            enc.tree(COEFF_TREE, p, a, 2 if skip_eob else 0)
        else:
            cat = next(
                c for c in range(5, -1, -1) if a >= CAT_BASE[c]
            )
            if cat < 5 and a >= CAT_BASE[cat + 1]:
                raise Vp8Error("level out of category range")
            enc.tree(COEFF_TREE, p, 5 + cat, 2 if skip_eob else 0)
            extra = a - CAT_BASE[cat]
            nb = len(CAT_PROBS[cat])
            for j in range(nb - 1, -1, -1):
                enc.bit((extra >> j) & 1, CAT_PROBS[cat][nb - 1 - j])
        enc.bit(1 if v < 0 else 0)
        skip_eob = False
        ctx = 1 if a == 1 else 2
        i += 1
    return int(last >= first)


def encode_vp8_frame(
    mb_w: int,
    mb_h: int,
    modes: list[dict],
    qi: int = 4,
    filter_level: int = 0,
    width: int | None = None,
    height: int | None = None,
) -> bytes:
    """Build a VP8 key-frame payload.  ``modes`` has one dict per MB in
    raster order: {"ymode": int, "bmodes": [16]|None, "uvmode": int,
    "y": [16 blocks of 16 raster levels]|None, "y2": [16]|None,
    "u"/"v": [4 blocks]|None}.  Levels are pre-quantization integers
    (the decoder multiplies by the dequant factors for ``qi``)."""
    width = width if width is not None else mb_w * 16
    height = height if height is not None else mb_h * 16

    e = BoolEncoder()
    e.bit(0)  # color_space
    e.bit(0)  # clamping_type
    e.bit(0)  # segmentation_enabled
    e.bit(0)  # filter_type: normal
    e.literal(filter_level, 6)
    e.literal(0, 3)  # sharpness
    e.bit(0)  # lf_delta_enabled
    e.literal(0, 2)  # log2 partitions
    e.literal(qi, 7)
    for _ in range(5):
        e.bit(0)  # no quantizer deltas
    e.bit(1)  # refresh_entropy_probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    e.bit(0, COEFF_UPDATE_PROBS[i][j][k][l])
    e.bit(1)  # mb_no_skip_coeff
    e.literal(128, 8)  # prob_skip_false

    # token partition runs in parallel
    te = BoolEncoder()
    nz_y_above = [0] * (mb_w * 4)
    nz_u_above = [0] * (mb_w * 2)
    nz_v_above = [0] * (mb_w * 2)
    nz_y2_above = [0] * mb_w
    above_b = [[B_DC] * 4 for _ in range(mb_w)]

    mi_iter = iter(modes)
    for mb_y in range(mb_h):
        nz_y_left = [0] * 4
        nz_u_left = [0] * 2
        nz_v_left = [0] * 2
        nz_y2_left = 0
        left_b = [B_DC] * 4
        for mb_x in range(mb_w):
            m = next(mi_iter)
            ymode = m["ymode"]
            has_y2 = ymode != B_PRED
            y_lv = m.get("y") or [[0] * 16 for _ in range(16)]
            u_lv = m.get("u") or [[0] * 16 for _ in range(4)]
            v_lv = m.get("v") or [[0] * 16 for _ in range(4)]
            y2_lv = m.get("y2") or [0] * 16
            skip = not (
                any(any(b) for b in y_lv)
                or any(any(b) for b in u_lv)
                or any(any(b) for b in v_lv)
                or (has_y2 and any(y2_lv))
            )
            e.bit(1 if skip else 0, 128)  # prob_skip_false = 128
            e.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                bmodes = m["bmodes"]
                for i in range(16):
                    r, c = i >> 2, i & 3
                    am = above_b[mb_x][c] if r == 0 else bmodes[i - 4]
                    lm = left_b[r] if c == 0 else bmodes[i - 1]
                    e.tree(BMODE_TREE, KF_BMODE_PROBS[am][lm], bmodes[i])
            else:
                bmodes = [_YMODE_TO_B[ymode]] * 16
            above_b[mb_x] = bmodes[12:16]
            left_b = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            e.tree(UV_MODE_TREE, KF_UV_MODE_PROB, m["uvmode"])

            if skip:
                for i in range(4):
                    nz_y_above[mb_x * 4 + i] = nz_y_left[i] = 0
                for i in range(2):
                    nz_u_above[mb_x * 2 + i] = nz_u_left[i] = 0
                    nz_v_above[mb_x * 2 + i] = nz_v_left[i] = 0
                if has_y2:
                    nz_y2_above[mb_x] = nz_y2_left = 0
                continue
            if has_y2:
                ctx = nz_y2_above[mb_x] + nz_y2_left
                nz = _write_coeff_block(te, COEFF_PROBS[1], ctx, 0, y2_lv)
                nz_y2_above[mb_x] = nz_y2_left = nz
                plane, first = 0, 1
            else:
                plane, first = 3, 0
            for i in range(16):
                r, c = i >> 2, i & 3
                ctx = nz_y_above[mb_x * 4 + c] + nz_y_left[r]
                nz = _write_coeff_block(
                    te, COEFF_PROBS[plane], ctx, first, y_lv[i]
                )
                nz_y_above[mb_x * 4 + c] = nz_y_left[r] = nz
            for lv, nz_above, nz_left in (
                (u_lv, nz_u_above, nz_u_left),
                (v_lv, nz_v_above, nz_v_left),
            ):
                for i in range(4):
                    r, c = i >> 1, i & 1
                    ctx = nz_above[mb_x * 2 + c] + nz_left[r]
                    nz = _write_coeff_block(te, COEFF_PROBS[2], ctx, 0, lv[i])
                    nz_above[mb_x * 2 + c] = nz_left[r] = nz

    part1 = e.finish()
    tokens = te.finish()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    out = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + b"\x9d\x01\x2a"
    out += bytes([width & 0xFF, (width >> 8) & 0x3F])
    out += bytes([height & 0xFF, (height >> 8) & 0x3F])
    return out + part1 + tokens


# ---------------------------------------------------------------------------
# consumer-level colour conversion (NOT part of RFC 6386)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Plain (non-fancy) 4:2:0 upsample + BT.601 full-swing conversion,
    the same fixed-point coefficients libwebp documents (YUV_FIX).  The
    colour transform is outside the VP8 spec — decoders are free to pick
    their upsampler — so this output is deterministic but NOT claimed
    byte-identical to libwebp's fancy-upsampled RGB path."""
    h, w = y.shape
    u_full = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    v_full = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yy = y.astype(np.int32) - 16
    uu = u_full.astype(np.int32) - 128
    vv = v_full.astype(np.int32) - 128
    # BT.601 studio-swing coefficients in Q14 (1.164, 1.596, 0.392,
    # 0.813, 2.018 — the same values libwebp's yuv.h documents)
    t = 19077 * yy + (1 << 13)
    r = (t + 26149 * vv) >> 14
    g = (t - 6419 * uu - 13320 * vv) >> 14
    b = (t + 33050 * uu) >> 14
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
