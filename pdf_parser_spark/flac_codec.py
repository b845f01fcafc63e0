"""From-scratch FLAC codec (RFC 9639 / xiph spec) — decode + encode.

FLAC is the lossless audio format a web crawl actually meets (podcasts,
archives, wikis); the audio operators previously accepted only WAV.
This module implements the format from the public spec:

- DECODER: streaminfo + metadata-block walk, frame headers (UTF-8-coded
  frame/sample numbers, all block-size/sample-rate/sample-size codes,
  CRC-8), all four subframe types (constant, verbatim, fixed orders 0-4,
  LPC orders 1-32 with quantized-coefficient shift), wasted bits, rice
  residuals (4- and 5-bit parameter variants, escape-to-raw partitions),
  all four channel assignments (independent, left/side, right/side,
  mid/side), frame CRC-16, and the whole-stream MD5 check.
- ENCODER (the decoder's round-trip oracle — no FLAC library exists in
  this container): 4096-sample blocks, per-block choice of constant /
  fixed(0-2) / LPC(8) subframes by residual cost, per-frame stereo-mode
  choice (independent vs left/side vs mid/side), per-partition rice
  parameters, correct CRCs and STREAMINFO MD5 — so every decoder path
  above is exercised by tests with pure round-trips.

16-bit PCM focus (the corpus interchange depth); other depths decode
when streams carry them. The reference repo has no audio layer; this
module serves the multimodal audio operators (operators/multimodal.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Malformed or unsupported FLAC stream."""

from pdf_parser_spark.media_codecs import format_boundary

_boundary = format_boundary("FLAC", FlacError)


_BLOCK = 4096

# frame-header block-size codes (§9.1.1): code -> samples (None = coded)
_BS_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}
_SR_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------- bit I/O
# FLAC is MSB-first (unlike zstd/brotli/webp)


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise FlacError("bitstream underrun")
        first = self.pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        shift = (last + 1) * 8 - end
        self.pos = end
        return (chunk >> shift) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_coded(value: int) -> bytes:
    """FLAC's extended-UTF-8 number coding (frame/sample numbers)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, first_max in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << first_max):
            out = bytearray()
            lead_bits = 7 - nbytes
            out.append((0xFF << (lead_bits + 1) & 0xFF) | (value >> (6 * (nbytes - 1))))
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise FlacError("coded number out of range")


def _read_utf8_coded(br: _Bits) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad coded number")
    value = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


# ---------------------------------------------------------------- decoder


def _read_residual(br: _Bits, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise FlacError("block size not divisible by partitions")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = block_size >> porder
        if p == 0:
            n -= order
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for i in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out[idx] = (v >> 1) ^ -(v & 1)  # zigzag
                idx += 1
    return out


def _read_subframe(br: _Bits, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # constant
        v = br.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # verbatim
        out = np.array([br.read_signed(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # fixed
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * int(out[i - 1 - j])
            out[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = 0
            # python-int accumulation: exact for any stream, and garbage
            # from a corrupted frame can't silently wrap int64 before the
            # CRC check rejects it
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            v = int(resid[i - order]) + (pred >> shift)
            if not -(1 << 62) < v < (1 << 62):
                raise FlacError("LPC sample out of range")
            out[i] = v
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


@_boundary
def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n_samples, channels) int32 array, sample_rate)."""
    if data[:4] != b"fLaC":
        raise FlacError("missing fLaC marker")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise FlacError("truncated metadata")
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise FlacError("missing STREAMINFO")
    si = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = si >> 44
    channels = ((si >> 41) & 0x7) + 1
    bps = ((si >> 36) & 0x1F) + 1
    total = si & ((1 << 36) - 1)
    md5_expect = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while (total == 0 or got < total) and pos < len(data):
        br = _Bits(data[pos:])
        if br.read(14) != 0x3FFE:
            raise FlacError("lost frame sync")
        if br.read(1):
            raise FlacError("reserved frame-header bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise FlacError("reserved frame-header bit 2")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise FlacError("reserved block-size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BS_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("invalid sample-rate code")
        fbps = bps if ss_code == 0 else _SS_CODE.get(ss_code)
        if fbps is None:
            raise FlacError("reserved sample-size code")
        br.align_byte()
        hdr_len = br.byte_pos()
        crc8 = br.read(8)
        if _crc8(data[pos : pos + hdr_len]) != crc8:
            raise FlacError("frame header CRC-8 mismatch")

        if chan_code < 8:
            nch = chan_code + 1
            if nch != channels:
                raise FlacError("channel count change mid-stream")
            subs = [_read_subframe(br, block_size, fbps) for _ in range(nch)]
        elif chan_code == 8:  # left/side
            left = _read_subframe(br, block_size, fbps)
            side = _read_subframe(br, block_size, fbps + 1)
            subs = [left, left - side]
        elif chan_code == 9:  # right/side
            side = _read_subframe(br, block_size, fbps + 1)
            right = _read_subframe(br, block_size, fbps)
            subs = [right + side, right]
        elif chan_code == 10:  # mid/side
            mid = _read_subframe(br, block_size, fbps)
            side = _read_subframe(br, block_size, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise FlacError("reserved channel assignment")
        br.align_byte()
        frame_len = br.byte_pos()
        crc16 = br.read(16)
        if _crc16(data[pos : pos + frame_len]) != crc16:
            raise FlacError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        got += block_size
        pos += br.byte_pos()

    out = np.stack(
        [np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in chans],
        axis=-1,
    )
    if total:
        out = out[:total]
    if verify_md5 and md5_expect != b"\x00" * 16:
        if _pcm_md5(out, bps) != md5_expect:
            raise FlacError("stream MD5 mismatch")
    return out.astype(np.int32), sample_rate


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the interleaved little-endian PCM, per STREAMINFO rules."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    if nbytes == 2:
        raw = flat.astype("<i2").tobytes()
    elif nbytes == 1:
        raw = flat.astype(np.int8).tobytes()
    elif nbytes == 3:
        as32 = flat.astype("<i4").tobytes()
        raw = b"".join(as32[i : i + 3] for i in range(0, len(as32), 4))
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------- encoder


def _write_residual(w: _BitWriter, resid: np.ndarray, block_size: int, order: int) -> None:
    porder = 0  # single partition; the rice parameter still adapts per frame
    r64 = resid.astype(np.int64)
    zig = (r64 << 1) ^ (r64 >> 63)
    mean = int(zig.mean()) if len(zig) else 0
    param = max(0, min(14, mean.bit_length() - 1))
    w.write(0, 2)  # rice, 4-bit params
    w.write(porder, 4)
    w.write(param, 4)
    for v in zig:
        v = int(v)
        q = v >> param
        if q > 1 << 20:
            raise FlacError("rice parameter blew up")
        w.write_unary(q)
        if param:
            w.write(v & ((1 << param) - 1), param)


def _best_fixed_order(sig: np.ndarray) -> int:
    best, best_cost = 0, None
    d = sig.astype(np.int64)
    for order in range(3):
        if len(d) <= order:
            break
        r = d.copy()
        for _ in range(order):
            r = np.diff(r)
        cost = np.abs(r).sum()
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _lpc_coefs(sig: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin + coefficient quantization; None if degenerate."""
    x = sig.astype(np.float64)
    n = len(x)
    if n <= order * 2:
        return None
    # Welch-window the data for estimation: near-sinusoidal signals make
    # the raw normal equations singular (poles on the unit circle) and
    # Levinson-Durbin collapses; windowing is the standard encoder fix
    t = 2.0 * np.arange(n) / (n - 1) - 1.0
    xw = x * (1.0 - t * t)
    auto = np.array([np.dot(xw[: n - k], xw[k:]) for k in range(order + 1)])
    if auto[0] <= 0:
        return None
    auto[0] *= 1 + 1e-10
    err = auto[0]
    a = np.zeros(order)
    for i in range(order):
        acc = auto[i + 1] - np.dot(a[:i], auto[i:0:-1][:i])
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1] if i else a[:i]
        a[i] = k
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0:
        return None
    shift = min(14, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-9)))))
    q = np.round(a * (1 << shift)).astype(np.int64)
    limit = 1 << (precision - 1)
    q = np.clip(q, -limit, limit - 1)
    if not q.any():
        return None
    return q, shift, precision


def _rice_bits(resid: np.ndarray) -> int:
    """Bit cost of the single-partition rice coding _write_residual emits."""
    r64 = resid.astype(np.int64)
    zig = (r64 << 1) ^ (r64 >> 63)
    mean = int(zig.mean()) if len(zig) else 0
    param = max(0, min(14, mean.bit_length() - 1))
    return len(zig) * (1 + param) + int((zig >> param).sum())


def _subframe_plan(sig: np.ndarray, bps: int):
    """Pick (kind, payload) minimizing actual encoded bit cost."""
    d = sig.astype(np.int64)
    if len(set(d.tolist())) == 1:
        return ("constant", None)
    order = _best_fixed_order(d)
    r = d.copy()
    for _ in range(order):
        r = np.diff(r)
    best = ("fixed", order)
    best_cost = order * bps + _rice_bits(r)
    lpc = _lpc_coefs(d, order=8)
    if lpc is not None:
        q, shift, precision = lpc
        o = len(q)
        pred = np.zeros(len(d) - o, dtype=np.int64)
        for j in range(o):
            pred += q[j] * d[o - 1 - j : len(d) - 1 - j]
        resid = d[o:] - (pred >> shift)
        cost = o * bps + o * precision + 9 + _rice_bits(resid)
        if cost < best_cost and np.abs(resid).max() < (1 << 30):
            best = ("lpc", (q, shift, precision))
            best_cost = cost
    if len(d) * bps < best_cost:  # incompressible: store raw
        best = ("verbatim", None)
    return best


def _write_subframe(w: _BitWriter, sig: np.ndarray, bps: int) -> None:
    kind, payload = _subframe_plan(sig, bps)
    d = sig.astype(np.int64)
    w.write(0, 1)
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(d[0]), bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in d:
            w.write_signed(int(v), bps)
        return
    if kind == "fixed":
        order = payload
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in d[:order]:
            w.write_signed(int(v), bps)
        r = d.copy()
        for _ in range(order):
            r = np.diff(r)
        _write_residual(w, r, len(d), order)
        return
    q, shift, precision = payload
    order = len(q)
    w.write(31 + order, 6)
    w.write(0, 1)
    for v in d[:order]:
        w.write_signed(int(v), bps)
    w.write(precision - 1, 4)
    w.write_signed(shift, 5)
    for c in q:
        w.write_signed(int(c), precision)
    pred = np.zeros(len(d) - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * d[order - 1 - j : len(d) - 1 - j]
    resid = d[order:] - (pred >> shift)
    _write_residual(w, resid, len(d), order)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n, channels) or (n,) int16/int32 PCM -> FLAC bytes (16-bit)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels > 8:
        raise FlacError("too many channels")
    bps = 16
    pcm = samples.astype(np.int64)

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", _BLOCK, _BLOCK)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += _pcm_md5(pcm[:, :channels], bps)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_no = 0
    for start in range(0, max(n, 1), _BLOCK):
        block = pcm[start : start + _BLOCK]
        bs = len(block)
        if bs == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        bs_code = 12 if bs == 4096 else 7
        w.write(bs_code, 4)
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sample_rate, 14)
        w.write(sr_code, 4)

        # stereo-mode choice: exercise all assignments where profitable
        mode = "indep"
        if channels == 2:
            left, right = block[:, 0], block[:, 1]
            side = left - right
            mid = (left + right) >> 1
            cost_i = np.abs(np.diff(left)).sum() + np.abs(np.diff(right)).sum()
            cost_ls = np.abs(np.diff(left)).sum() + np.abs(np.diff(side)).sum()
            cost_ms = np.abs(np.diff(mid)).sum() + np.abs(np.diff(side)).sum()
            mode = min(
                (("indep", cost_i), ("leftside", cost_ls), ("midside", cost_ms)),
                key=lambda t: t[1],
            )[0]
        chan_code = {
            "indep": channels - 1, "leftside": 8, "midside": 10
        }[mode]
        w.write(chan_code, 4)
        w.write(4, 3)  # 16-bit
        w.write(0, 1)
        for b in _utf8_coded(frame_no):
            w.write(b, 8)
        if bs_code == 7:
            w.write(bs - 1, 16)
        if sr_code == 14:
            w.write(sample_rate, 16)
        w.align_byte()
        hdr = w.bytes()
        w2 = _BitWriter()
        if mode == "indep":
            for c in range(channels):
                _write_subframe(w2, block[:, c], bps)
        elif mode == "leftside":
            _write_subframe(w2, left, bps)
            _write_subframe(w2, side, bps + 1)
        else:
            _write_subframe(w2, mid, bps)
            _write_subframe(w2, side, bps + 1)
        w2.align_byte()
        frame = hdr + bytes([_crc8(hdr)]) + w2.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
