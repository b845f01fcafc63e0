"""From-scratch baseline-TIFF codec — decode + encode.

TIFF rounds out the raster formats a crawl meets (scans, archives,
geo/document tooling). Implemented from the public TIFF 6.0 spec:

- DECODER: both byte orders (II/MM), IFD walk (first image), strip
  layout (any RowsPerStrip), compressions 1 (none), 5 (TIFF-LZW with
  MSB-first codes and the early-change quirk), 8/32946 (Deflate), and
  32773 (PackBits); photometric 0/1 (grayscale, incl. WhiteIsZero
  inversion), 2 (RGB/RGBA with associated or unassociated extra
  samples), 3 (palette with 16-bit color map); 1/4/8 bits per sample;
  horizontal differencing predictor (tag 317); planar configuration 1.
- ENCODER (round-trip oracle): 8-bit gray/RGB/RGBA, little-endian,
  selectable none/PackBits/LZW/Deflate compression and the horizontal
  predictor, multi-strip — every decoder branch above is either
  round-trip-covered or exercised by a hand-assembled fixture in tests.

Tiles, planar=2, 16-bit samples, and JPEG-in-TIFF raise loudly. The
reference repo has no image layer; this module serves the multimodal
operators (operators/multimodal.py image dispatch).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""

from pdf_parser_spark.media_codecs import format_boundary

_boundary = format_boundary("TIFF", TiffError)


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def _read_ifd(data: bytes, order: str) -> dict[int, list[int]]:
    if len(data) < 8:
        raise TiffError("too short")
    try:
        (ifd_off,) = struct.unpack_from(order + "I", data, 4)
        tags: dict[int, list[int]] = {}
        (count,) = struct.unpack_from(order + "H", data, ifd_off)
        for i in range(count):
            pos = ifd_off + 2 + 12 * i
            tag, typ, n = struct.unpack_from(order + "HHI", data, pos)
            if typ not in _TYPE_SIZE:
                continue
            size = _TYPE_SIZE[typ] * n
            if size <= 4:
                raw = data[pos + 8 : pos + 8 + size]
            else:
                (off,) = struct.unpack_from(order + "I", data, pos + 8)
                raw = data[off : off + size]
            if len(raw) < size:
                raise TiffError(f"tag {tag} value runs past the file")
            fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
            if fmt:
                tags[tag] = list(struct.unpack(order + fmt * n, raw))
            elif typ == 5:  # rational
                vals = struct.unpack(order + "II" * n, raw)
                tags[tag] = [vals[2 * j] // max(vals[2 * j + 1], 1) for j in range(n)]
    except struct.error as exc:  # truncated IFD / out-of-range offsets
        raise TiffError(f"malformed IFD: {exc}") from exc
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first codes, ClearCode 256, EOI 257, and the
    'early change' (code width bumps one entry early)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise TiffError("LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffError("LZW code out of range")
            out += entry
            prev = entry
            # early change: width grows when the NEXT code would overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (the decoder's round-trip oracle)."""
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((256, width))
    cur = b""
    for b in bytes(data):
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        out_bits.append((table[cur], width))
        table[nxt] = next_code
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table full: clear
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        out_bits.append((table[cur], width))
    out_bits.append((257, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and data[j] == data[j + 1])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


@_boundary
def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w) gray or (h, w, 3|4) uint8 array (first IFD)."""
    if data[:2] == b"II" and data[2:4] == b"\x2a\x00":
        order = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00\x2a":
        order = ">"
    else:
        raise TiffError("not a TIFF file")
    t = _read_ifd(data, order)
    if 322 in t or 323 in t:
        raise TiffError("tiled TIFF unsupported (strip layout only)")
    w = t.get(256, [0])[0]
    h = t.get(257, [0])[0]
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise TiffError("bad dimensions")
    bits = t.get(258, [1])
    spp = t.get(277, [1])[0]
    if any(b not in (1, 4, 8) for b in bits):
        raise TiffError(f"unsupported bits per sample {bits}")
    if len(set(bits)) != 1:
        raise TiffError("mixed bits per sample")
    bps = bits[0]
    if spp > 1 and bps != 8:
        raise TiffError("multi-sample images must be 8-bit")
    compression = t.get(259, [1])[0]
    photometric = t.get(262, [1])[0]
    planar = t.get(284, [1])[0]
    if planar != 1:
        raise TiffError("planar configuration 2 unsupported")
    predictor = t.get(317, [1])[0]
    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts:
        raise TiffError("missing strip offsets/counts")
    rows_per_strip = t.get(278, [h])[0] or h

    row_bytes = (w * spp * bps + 7) // 8
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = bytes(data[off : off + cnt])
        nrows = min(rows_per_strip, h - i * rows_per_strip)
        expected = row_bytes * nrows
        if compression == 1:
            dec = strip[:expected]
        elif compression == 5:
            dec = _lzw_decode(strip)[:expected]
        elif compression in (8, 32946):
            dec = zlib.decompress(strip)[:expected]
        elif compression == 32773:
            dec = _packbits_decode(strip, expected)
        else:
            raise TiffError(f"unsupported compression {compression}")
        if len(dec) < expected:
            raise TiffError("short strip")
        raw += dec

    arr8: np.ndarray
    if bps == 8:
        arr8 = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w * spp)
    elif bps == 4:
        rows = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, row_bytes)
        nib = np.zeros((h, row_bytes * 2), dtype=np.uint8)
        nib[:, 0::2] = rows >> 4
        nib[:, 1::2] = rows & 0xF
        arr8 = nib[:, :w]
    else:  # 1-bit
        rows = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, row_bytes)
        arr8 = np.unpackbits(rows, axis=1)[:, :w]

    if predictor == 2:
        if bps != 8:
            raise TiffError("predictor on sub-byte samples unsupported")
        arr8 = np.cumsum(
            arr8.reshape(h, w, spp).astype(np.uint32), axis=1, dtype=np.uint32
        ).astype(np.uint8).reshape(h, w * spp)
    elif predictor not in (1,):
        raise TiffError(f"unsupported predictor {predictor}")

    if photometric in (0, 1):
        if spp != 1:
            raise TiffError("grayscale with extra samples unsupported")
        img = arr8[:, :w]
        if bps == 1:
            img = img * 255
        elif bps == 4:
            img = (img * 17).astype(np.uint8)
        if photometric == 0:  # WhiteIsZero
            img = 255 - img
        return np.ascontiguousarray(img)
    if photometric == 3:  # palette
        cmap = t.get(320)
        if not cmap or spp != 1:
            raise TiffError("palette image without color map")
        n = len(cmap) // 3
        pal = np.array(
            [[cmap[i] >> 8, cmap[n + i] >> 8, cmap[2 * n + i] >> 8] for i in range(n)],
            dtype=np.uint8,
        )
        idx = arr8[:, :w]
        if int(idx.max(initial=0)) >= n:
            raise TiffError("palette index out of range")
        return pal[idx]
    if photometric == 2:
        if spp == 3:
            return np.ascontiguousarray(arr8.reshape(h, w, 3))
        if spp == 4:
            return np.ascontiguousarray(arr8.reshape(h, w, 4))
        raise TiffError(f"RGB with {spp} samples unsupported")
    raise TiffError(f"unsupported photometric interpretation {photometric}")


def encode_tiff(
    img: np.ndarray,
    compression: str = "lzw",
    predictor: bool = False,
    rows_per_strip: int = 64,
) -> bytes:
    """(h,w) gray / (h,w,3|4) uint8 -> little-endian baseline TIFF."""
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8}[compression]
    if img.ndim == 2:
        h, w = img.shape
        spp = 1
        photometric = 1
        flat = img
    else:
        h, w, spp = img.shape
        photometric = 2
        flat = img.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = flat[y0 : y0 + rows_per_strip].astype(np.uint8)
        if predictor and comp_tag != 1:
            d = block.reshape(block.shape[0], -1, spp).astype(np.int16)
            d[:, 1:] -= d[:, :-1].copy()
            block = (d & 0xFF).astype(np.uint8).reshape(block.shape[0], -1)
        raw = block.tobytes()
        if comp_tag == 1:
            strips.append(raw)
        elif comp_tag == 5:
            strips.append(_lzw_encode(raw))
        elif comp_tag == 8:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(_packbits_encode(raw))

    entries = []  # (tag, type, count, value_or_bytes)
    nstrips = len(strips)

    def add(tag, typ, values):
        entries.append((tag, typ, values))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [comp_tag])
    add(262, 3, [photometric])
    add(273, 4, [0] * nstrips)  # patched below
    add(277, 3, [spp])
    add(278, 4, [min(rows_per_strip, h)])
    add(279, 4, [len(s) for s in strips])
    if spp == 4:
        add(338, 3, [2])  # unassociated alpha
    if predictor and comp_tag != 1:
        add(317, 3, [2])
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext = bytearray()
    ext_base = ifd_off + ifd_size
    fixed = []
    for tag, typ, values in entries:
        fmt = {3: "H", 4: "I"}[typ]
        size = _TYPE_SIZE[typ] * len(values)
        if size <= 4:
            raw = struct.pack("<" + fmt * len(values), *values).ljust(4, b"\x00")
            fixed.append((tag, typ, len(values), raw, None))
        else:
            fixed.append((tag, typ, len(values), None, len(ext)))
            ext += struct.pack("<" + fmt * len(values), *values)
    data_base = ext_base + len(ext)
    # strip offsets now known
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(fixed))
    for tag, typ, n, inline, ext_off in fixed:
        out += struct.pack("<HHI", tag, typ, n)
        if inline is not None:
            if tag == 273 and n == 1:
                out += struct.pack("<I", strip_offsets[0])
                continue
            out += inline
        else:
            if tag == 273:
                # rewrite the ext block region for offsets
                fmt = {3: "H", 4: "I"}[typ]
                packed = struct.pack("<" + fmt * n, *strip_offsets)
                ext[ext_off : ext_off + len(packed)] = packed
            out += struct.pack("<I", ext_base + ext_off)
    out += struct.pack("<I", 0)  # next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)
