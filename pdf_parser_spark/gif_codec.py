"""From-scratch GIF codec (decode + encode), stdlib + numpy only.

GIF is still a meaningful slice of web images (and the dominant short
animation format in older crawls); the container has no imaging library,
so this implements GIF87a/89a directly from the published specification
(CompuServe GIF89a spec, public): logical screen descriptor, global and
local color tables, graphic-control extensions (frame delay, transparency,
disposal), interlaced row ordering, and variable-code-width LZW with
LSB-first bit packing.

- ``decode_gif(data)`` → (frames, delays_ms): frames is (n, H, W, 4)
  uint8 RGBA composited on the logical screen per the disposal methods
  (none/keep, restore-to-background, restore-to-previous); a plain
  single-image GIF yields n=1.
- ``encode_gif(frames, delays_ms, interlace=False)`` — animated (or
  single-frame) GIF89a writer with a 256-color global palette (frames are
  palettized by exact color lookup; encode refuses frames with > 256
  distinct colors — the writer exists to round-trip the decoder, not to
  quantize) and real LZW compression with code-table resets.

Deterministic both ways; like media_codecs.py these are CODECS, not a
DataFrame API — operators/multimodal.py calls them inside Arrow-batched
``mapInPandas`` stages.
"""

from __future__ import annotations

import struct

import numpy as np

from pdf_parser_spark.media_codecs import format_boundary

__all__ = ["decode_gif", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW

def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/END codes, code width
    grows after the table fills, capped at 12 bits until the next CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    # table: code -> bytes; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        if n_out + len(entry) > n_expected:
            entry = entry[: n_expected - n_out]  # defensive over-run clamp
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = table[code] if code < len(table) else entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if n_out >= n_expected:
            break
    if n_out != n_expected:
        raise ValueError(
            f"GIF LZW produced {n_out} of {n_expected} expected pixels"
        )
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    w = b""
    for b in indices.astype(np.uint8).tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):  # table full: reset (spec-permitted)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns (bytes,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        pos += n


# ---------------------------------------------------------------- decode

@format_boundary("GIF")
def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → ((n, H, W, 4) uint8 RGBA frames, per-frame delay ms)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    screen = np.zeros((h, w, 4), dtype=np.uint8)  # transparent background
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image
    transparent: int | None = None
    delay_ms = 0
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _sub_blocks(data, pos)
                if len(body) >= 4:
                    packed = body[0]
                    disposal = (packed >> 2) & 0x7
                    delay_ms = struct.unpack("<H", body[1:3])[0] * 10
                    transparent = body[3] if packed & 0x01 else None
            else:  # comment / app / plain-text: skip sub-blocks
                _body, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(mcs, lzw, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                deinter[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = deinter
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        rgba = np.empty((ih, iw, 4), dtype=np.uint8)
        rgba[:, :, :3] = ct[idx]
        rgba[:, :, 3] = 255
        if transparent is not None and transparent < len(ct):
            rgba[:, :, 3] = np.where(idx == transparent, 0, 255)

        before = screen.copy()
        region = screen[iy : iy + ih, ix : ix + iw]
        opaque = rgba[:, :, 3] == 255
        region[opaque] = rgba[opaque]
        frames.append(screen.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background (transparent) in region
            screen[iy : iy + ih, ix : ix + iw] = 0
        elif disposal == 3:  # restore to previous
            screen = before
        transparent, delay_ms, disposal = None, 0, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


# ---------------------------------------------------------------- encode

def encode_gif(frames: np.ndarray, delays_ms: list[int] | None = None,
               interlace: bool = False) -> bytes:
    """(n, H, W, 3) uint8 frames → GIF89a bytes (exact-palette writer)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        f = f[None]
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"unsupported frame shape for GIF: {frames.shape}")
    n, h, w, _ = f.shape
    colors = np.unique(f.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError(
            f"GIF writer is exact-palette: {len(colors)} > 256 distinct "
            "colors (quantize upstream)"
        )
    # palette size: power of two >= max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4 | (bits - 1),
                       0, 0)
    out += pal.tobytes()
    delays = delays_ms or [0] * n
    mcs = max(2, bits)
    for i in range(n):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0, max(0, int(delays[i])) // 10, 0) + b"\x00"
        iflags = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = np.array(
            [lut[tuple(px)] for px in f[i].reshape(-1, 3)], dtype=np.uint8
        ).reshape(h, w)
        if interlace:
            order = [r for start, step in _INTERLACE_PASSES
                     for r in range(start, h, step)]
            idx = idx[order]
        out.append(mcs)
        lzw = _lzw_encode(mcs, idx.reshape(-1))
        for j in range(0, len(lzw), 255):
            chunk = lzw[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
