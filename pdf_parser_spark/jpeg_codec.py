"""From-scratch baseline JPEG codec (encode + decode), stdlib + numpy only.

JPEG is the dominant image format on the web — a Common-Crawl-style media
table is mostly JFIF payloads — and the container has no imaging library,
which left operators/multimodal.py's real image branch PNG-only. Baseline
sequential JPEG (ITU-T T.81, a public spec) needs nothing beyond bit
twiddling and an 8x8 DCT, so this module implements it directly from the
spec: the Annex K quantization and Huffman tables, JFIF YCbCr color
conversion, zigzag run-length entropy coding, and a generic-sampling MCU
walk on decode.

Scope, chosen to decode what cameras and `libjpeg`-family encoders emit by
default and to refuse loudly otherwise:

- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
  sampling factors (4:4:4 / 4:2:0 / 4:2:2 / 4:1:1 all fall out of the
  generic MCU loop), restart markers (DRI/RSTn). Progressive (SOF2),
  arithmetic coding, 12-bit, and CMYK raise ``ValueError`` rather than
  mis-decoding.
- encode: baseline sequential, grayscale or RGB, 4:4:4 or 4:2:0, IJG-style
  quality scaling of the Annex K tables, Annex K Huffman tables (no
  per-image optimization — the standard tables are what the spec's own
  examples use and keep the encoder deterministic).

The encoder exists so the decoder is testable end-to-end in-container
(encode → decode → PSNR), and so synthetic media tables can carry real
JFIF payloads. Both directions are deterministic: same array in, same
bytes out.

Like media_codecs.py, these are CODECS, not a DataFrame API — the
multimodal operators call them inside Arrow-batched ``mapInPandas`` stages.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 — example quantization tables (row-major 8x8).
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# zigzag[i] = row-major index of the i-th coefficient in zigzag order
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 — typical Huffman tables: (bits[1..16] counts, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: coeffs = C @ block @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0, :] = 1.0 / np.sqrt(8)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C canonical code generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _canonical_codes."""
    return {(l, c): sym for sym, (c, l) in _canonical_codes(bits, values).items()}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (libjpeg's jpeg_quality_scaling, public source)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


# ---------------------------------------------------------------- encode

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            self.write(0x7F, 8 - self._nbits)  # pad with 1-bits

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (T.81 F.1.2.3: pad, then marker)."""
        self.flush()
        self.out += bytes((0xFF, 0xD0 + (n & 7)))


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _encode_blocks(writer: _BitWriter, blocks: np.ndarray, dc_tbl, ac_tbl,
                   pred: int) -> int:
    """Huffman-encode zigzagged quantized blocks; returns the new DC predictor."""
    for blk in blocks:
        zz = blk[_ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        cat, extra = _magnitude(diff)
        code, length = dc_tbl[cat]
        writer.write(code, length)
        if cat:
            writer.write(extra, cat)
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tbl[0xF0]  # ZRL: 16 zeros
                writer.write(code, length)
                run -= 16
            cat, extra = _magnitude(v)
            code, length = ac_tbl[(run << 4) | cat]
            writer.write(code, length)
            writer.write(extra, cat)
            run = 0
        if last < 63:
            code, length = ac_tbl[0x00]  # EOB
            writer.write(code, length)
    return pred


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (n, 8, 8) with edge replication to 8-multiples."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _quantize(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    # the orthonormal 8-point DCT's a(0)=1/sqrt(8), a(k)=1/2 scaling IS
    # T.81 A.3.3's 1/4*C(u)*C(v) convention — no extra gain factor
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
    q = qtbl.reshape(8, 8).astype(np.float64)
    return np.round(coeffs / q).astype(np.int64).reshape(-1, 64)


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes from an (H, W) gray or (H, W, {1,3}) uint8 array.

    subsample=True writes 4:2:0 chroma (the web default); False writes
    4:4:4. Grayscale input produces a single-component scan.
    restart_interval > 0 emits a DRI segment and RSTn markers every that
    many MCUs (what camera firmware writes for error resilience) — it
    exists mainly so the decoder's restart path is testable in-container.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"unsupported array shape for JPEG: {arr.shape}")
    h, w, ch = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    luma_q, chroma_q = _quality_tables(quality)

    if ch == 1:
        planes = [a[:, :, 0].astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, then 2x2 block-average (JFIF centered siting)
            def sub(p: np.ndarray) -> np.ndarray:
                hh, ww = p.shape
                p = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
                return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
                    axis=(1, 3))
            planes = [y, sub(cb), sub(cr)]
        else:
            planes = [y, cb, cr]

    # ---- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tbl in ((0, luma_q),) + (((1, chroma_q),) if ch == 3 else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(tbl[z]) for z in _ZIGZAG)
    # SOF0: sampling factors — luma 2x2 when subsampled, else all 1x1
    samp_y = 0x22 if (ch == 3 and subsample) else 0x11
    comps = [(1, samp_y, 0)] + ([(2, 0x11, 1), (3, 0x11, 1)] if ch == 3 else [])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for cid, samp, qid in comps:
        out += bytes((cid, samp, qid))
    huff = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ch == 3:
        huff += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, values) in huff:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _samp, _qid in comps:
        out += bytes((cid, 0x00 if cid == 1 else 0x11))
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    # ---- entropy-coded scan, interleaved in MCU order
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    writer = _BitWriter()
    if ch == 1 or not subsample:
        qblocks = [_quantize(_to_blocks(p), luma_q if i == 0 else chroma_q)
                   for i, p in enumerate(planes)]
        n_mcus = len(qblocks[0])
        preds = [0] * len(planes)
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                writer.restart(m // restart_interval - 1)
                preds = [0] * len(planes)
            for i in range(len(planes)):
                dc, ac = (dc_l, ac_l) if i == 0 else (dc_c, ac_c)
                preds[i] = _encode_blocks(writer, qblocks[i][m:m + 1], dc, ac,
                                          preds[i])
    else:
        # 4:2:0 — each MCU is four Y blocks (2x2) then one Cb, one Cr
        yb = _to_blocks(planes[0])
        cbb = _quantize(_to_blocks(planes[1]), chroma_q)
        crb = _quantize(_to_blocks(planes[2]), chroma_q)
        yq = _quantize(yb, luma_q)
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        # _to_blocks padded Y to 8-multiples; repad its block GRID to even
        bx, by = (w + 7) // 8, (h + 7) // 8
        grid = np.arange(by * bx).reshape(by, bx)
        if by % 2 or bx % 2:
            grid = np.pad(grid, ((0, by % 2), (0, bx % 2)), mode="edge")
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                m = my * mcux + mx
                if restart_interval and m and m % restart_interval == 0:
                    writer.restart(m // restart_interval - 1)
                    preds = [0, 0, 0]
                for dy in (0, 1):
                    for dx in (0, 1):
                        blk = yq[grid[2 * my + dy, 2 * mx + dx]]
                        preds[0] = _encode_blocks(writer, blk[None, :], dc_l,
                                                  ac_l, preds[0])
                ci = my * ((bx + 1) // 2) + mx
                preds[1] = _encode_blocks(writer, cbb[ci:ci + 1], dc_c, ac_c,
                                          preds[1])
                preds[2] = _encode_blocks(writer, crb[ci:ci + 1], dc_c, ac_c,
                                          preds[2])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode

class _BitReader:
    """MSB-first bit reader over entropy-coded data; unstuffs 0xFF00."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def bit(self) -> int:
        if not self._nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # a real marker mid-scan (EOI / RST handled by caller):
                    # treat as end of data — spec pads the tail with 1-bits
                    self.pos -= 1
                    return 1
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte; if positioned at a marker return its 2nd byte."""
        self._nbits = 0
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and self.data[self.pos + 1] != 0x00):
            marker = self.data[self.pos + 1]
            self.pos += 2
            return marker
        return None


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `cat` extra bits to a signed coefficient."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_block(reader: _BitReader, dc_tbl, ac_tbl, pred: int
                  ) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    cat = _read_symbol(reader, dc_tbl)
    diff = _extend(reader.bits(cat), cat) if cat else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_symbol(reader, ac_tbl)
        run, cat = rs >> 4, rs & 0xF
        if cat == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(reader.bits(cat), cat)
        k += 1
    return zz, pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """(H, W, {1,3}) uint8 from baseline sequential JFIF/JPEG bytes."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(body[b + 1:b + 65], np.uint8)
                qtables[tid] = tbl
                b += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            b = 0
            while b < len(body):
                tc = body[b]
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                values = list(body[b + 17:b + 17 + n])
                if len(bits) < 16 or len(values) < n:
                    raise ValueError("truncated JPEG DHT segment")
                htables[tc] = _decode_table(bits, values)
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline/ext. seq.
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component padded block planes
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                                   dtype=np.float64)
    order = [by_id[cid] for cid, _tsel in scan]
    tsel = {cid: t for cid, t in scan}
    preds = {c["id"]: 0 for c in comps}
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                marker = reader.align_to_marker()
                if marker is None or not (0xD0 <= marker <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                preds = {c["id"]: 0 for c in comps}
            for c in order:
                dc_tbl = htables.get(tsel[c["id"]] >> 4)
                ac_tbl = htables.get(0x10 | (tsel[c["id"]] & 0xF))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references missing DHT table")
                q = qtables.get(c["q"])
                if q is None:
                    raise ValueError("JPEG scan references missing DQT table")
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz, preds[c["id"]] = _decode_block(
                            reader, dc_tbl, ac_tbl, preds[c["id"]])
                        # zz is in zigzag order, q in natural order: reorder
                        # BEFORE dequantizing (mixing the orders only shows up
                        # on high-frequency content — DC sits at 0 in both)
                        coef = (zz[_UNZIGZAG] * q).reshape(8, 8).astype(
                            np.float64)
                        blk = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * c["v"] + dy) * 8
                        x0 = (mx * c["h"] + dx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8)
