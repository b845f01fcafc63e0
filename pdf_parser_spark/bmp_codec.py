"""From-scratch BMP and ICO codecs — decode + encode.

Favicons (ICO) and legacy BMP images are a steady fraction of a web
crawl's image bytes; both are fully specified public formats (Windows
BITMAPINFOHEADER family; the ICO container). Implemented from the spec:

- BMP DECODER: BITMAPCOREHEADER (12-byte) and BITMAPINFOHEADER/V4/V5
  (40/108/124-byte) variants; 1/4/8-bit palette, 16-bit (555 and
  BI_BITFIELDS masks), 24-bit BGR, 32-bit BGRA; BI_RLE8 and BI_RLE4
  run-length decompression (incl. delta and absolute modes); bottom-up
  and top-down row order; 4-byte row padding.
- ICO DECODER: icon directory walk, per-entry dispatch to the embedded
  PNG (media_codecs.decode_png) or BMP-without-fileheader payload with
  the ICO quirks — doubled height, the 1-bit AND transparency mask
  (applied only when the XOR image has no alpha), "0 means 256" sizes.
  decode_ico returns the LARGEST image; decode_ico_all returns every
  entry.
- ENCODERS (round-trip oracles): 24-bit and 32-bit BMP, and ICO wrapping
  either PNG or BMP entries — every decoder branch above has a pure
  round-trip test.

The reference repo has no image layer; this module serves the
multimodal operators (operators/multimodal.py image dispatch).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Malformed or unsupported BMP/ICO payload."""

from pdf_parser_spark.media_codecs import format_boundary

_boundary = format_boundary("BMP/ICO", BmpError)


# ---------------------------------------------------------------- BMP decode


def _masks_to_shifts(mask: int) -> tuple[int, int]:
    """(shift, bit width) of a contiguous channel mask; (0,0) for mask 0."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def _scale_to_8(v: np.ndarray, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros_like(v, dtype=np.uint8)
    if width == 8:
        return v.astype(np.uint8)
    # replicate high bits (the conventional expansion)
    out = v.astype(np.uint32)
    acc = np.zeros_like(out)
    filled = 0
    while filled < 8:
        take = min(width, 8 - filled)
        acc = (acc << take) | (out >> (width - take))
        filled += take
    return acc.astype(np.uint8)


def _decode_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indices, bottom-up rows."""
    rows = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if four_bit:
                pair = [(val >> 4) & 0xF, val & 0xF]
                for i in range(count):
                    if x < w and y < h:
                        rows[y, x] = pair[i & 1]
                    x += 1
            else:
                end = min(x + count, w)
                if y < h:
                    rows[y, x:end] = val
                x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                break
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val pixels follow
            cnt = val
            if four_bit:
                nbytes = (cnt + 1) // 2
                chunk = data[pos : pos + nbytes]
                pos += nbytes + (nbytes & 1)  # word-aligned
                for i in range(cnt):
                    b = chunk[i >> 1]
                    px = (b >> 4) & 0xF if i % 2 == 0 else b & 0xF
                    if x < w and y < h:
                        rows[y, x] = px
                    x += 1
            else:
                chunk = data[pos : pos + cnt]
                pos += cnt + (cnt & 1)
                for px in chunk:
                    if x < w and y < h:
                        rows[y, x] = px
                    x += 1
    return rows[::-1]  # RLE bitmaps are always bottom-up


def decode_bmp_dib(data: bytes, ico_mode: bool = False) -> np.ndarray:
    """Decode a DIB (BMP without the 14-byte file header) -> (h,w,4) RGBA.

    ico_mode: the header height is doubled (XOR + AND mask) and a 1-bit
    AND mask may follow the pixel data.
    """
    if len(data) < 12:
        raise BmpError("DIB too short")
    (hdr_size,) = struct.unpack_from("<I", data, 0)
    if hdr_size == 12:  # BITMAPCOREHEADER
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, 4)
        compression = 0
        palette_entry = 3
        n_colors = 0
        top_down = False
    elif hdr_size in (40, 52, 56, 108, 124):
        w, h, planes, bpp, compression = struct.unpack_from("<iihHI", data, 4)
        n_colors = struct.unpack_from("<I", data, 32)[0]
        palette_entry = 4
        top_down = h < 0
        h = abs(h)
    else:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise BmpError("bad plane count")
    if ico_mode:
        h //= 2
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise BmpError("bad dimensions")

    pos = hdr_size
    r_mask = g_mask = b_mask = a_mask = 0
    if compression == 3:  # BI_BITFIELDS
        if hdr_size == 40:
            r_mask, g_mask, b_mask = struct.unpack_from("<III", data, pos)
            pos += 12
        else:
            r_mask, g_mask, b_mask, a_mask = struct.unpack_from("<IIII", data, 40)
    elif hdr_size >= 108:
        r_mask, g_mask, b_mask, a_mask = struct.unpack_from("<IIII", data, 40)

    palette = None
    if bpp <= 8:
        count = n_colors or (1 << bpp)
        palette = np.zeros((count, 4), dtype=np.uint8)
        for i in range(count):
            entry = data[pos + i * palette_entry : pos + (i + 1) * palette_entry]
            if len(entry) < 3:
                raise BmpError("truncated palette")
            palette[i] = (entry[2], entry[1], entry[0], 255)
        pos += count * palette_entry
    elif compression == 0 and n_colors:
        pos += n_colors * palette_entry  # "important colors" palette, skip

    if compression in (1, 2):  # RLE8 / RLE4
        if palette is None:
            raise BmpError("RLE without palette")
        idx = _decode_rle(data[pos:], w, h, four_bit=(compression == 2))
        out = palette[idx]
        return out
    if compression not in (0, 3):
        raise BmpError(f"unsupported compression {compression}")

    row_bytes = (w * bpp + 31) // 32 * 4
    need = row_bytes * h
    pix = data[pos : pos + need]
    if len(pix) < need:
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(pix, dtype=np.uint8).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]

    if bpp == 1:
        bits = np.unpackbits(rows[:, : (w + 7) // 8], axis=1)[:, :w]
        out = palette[bits]
    elif bpp == 4:
        nib = np.zeros((h, ((w + 1) // 2) * 2), dtype=np.uint8)
        half = rows[:, : (w + 1) // 2]
        nib[:, 0::2] = (half >> 4) & 0xF
        nib[:, 1::2] = half & 0xF
        out = palette[nib[:, :w]]
    elif bpp == 8:
        out = palette[rows[:, :w]]
    elif bpp == 16:
        v = rows[:, : w * 2].reshape(h, w, 2)
        v16 = v[:, :, 0].astype(np.uint32) | (v[:, :, 1].astype(np.uint32) << 8)
        if compression == 0 or (r_mask, g_mask, b_mask) == (0, 0, 0):
            r_mask, g_mask, b_mask = 0x7C00, 0x03E0, 0x001F
        chans = []
        for mask in (r_mask, g_mask, b_mask, a_mask):
            sh, wd = _masks_to_shifts(mask)
            chans.append(_scale_to_8((v16 >> sh) & ((1 << wd) - 1), wd))
        out = np.stack(chans, axis=-1)
        if a_mask == 0:
            out[:, :, 3] = 255
    elif bpp == 24:
        v = rows[:, : w * 3].reshape(h, w, 3)
        out = np.stack(
            [v[:, :, 2], v[:, :, 1], v[:, :, 0], np.full((h, w), 255, np.uint8)],
            axis=-1,
        )
    elif bpp == 32:
        v = rows[:, : w * 4].reshape(h, w, 4)
        if compression == 3 and a_mask not in (0, 0xFF000000):
            v32 = (
                v[:, :, 0].astype(np.uint32)
                | (v[:, :, 1].astype(np.uint32) << 8)
                | (v[:, :, 2].astype(np.uint32) << 16)
                | (v[:, :, 3].astype(np.uint32) << 24)
            )
            chans = []
            for mask in (r_mask, g_mask, b_mask, a_mask):
                sh, wd = _masks_to_shifts(mask)
                chans.append(_scale_to_8((v32 >> sh) & ((1 << wd) - 1), wd))
            out = np.stack(chans, axis=-1)
        else:
            out = np.stack([v[:, :, 2], v[:, :, 1], v[:, :, 0], v[:, :, 3]], axis=-1)
        if not ico_mode and not out[:, :, 3].any():
            out = out.copy()
            out[:, :, 3] = 255  # common BGRX files store 0 alpha meaning opaque
    else:
        raise BmpError(f"unsupported bit depth {bpp}")

    out = np.ascontiguousarray(out)
    if ico_mode:
        has_alpha = bpp == 32 and out[:, :, 3].any()
        if not has_alpha:
            and_row = (w + 31) // 32 * 4
            mask_data = data[pos + need : pos + need + and_row * h]
            if len(mask_data) == and_row * h:
                mrows = np.frombuffer(mask_data, dtype=np.uint8).reshape(h, and_row)
                mrows = mrows[::-1]
                mbits = np.unpackbits(mrows[:, : (w + 7) // 8], axis=1)[:, :w]
                out = out.copy()
                out[:, :, 3] = np.where(mbits == 1, 0, 255)
            else:
                out = out.copy()
                out[:, :, 3] = 255
    return out


@_boundary
def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file bytes -> (h, w, 4) uint8 RGBA."""
    if data[:2] != b"BM":
        raise BmpError("not a BMP file")
    return decode_bmp_dib(data[14:])


# ---------------------------------------------------------------- BMP encode


def encode_bmp(rgba: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> 24-bit (opaque) or 32-bit BGRA BMP."""
    if rgba.ndim == 2:
        rgba = np.stack([rgba] * 3, axis=-1)
    h, w, ch = rgba.shape
    alpha = ch == 4 and bool((rgba[:, :, 3] != 255).any())
    if alpha:
        bpp, row_bytes = 32, w * 4
        v = np.zeros((h, w, 4), dtype=np.uint8)
        v[:, :, 0] = rgba[:, :, 2]
        v[:, :, 1] = rgba[:, :, 1]
        v[:, :, 2] = rgba[:, :, 0]
        v[:, :, 3] = rgba[:, :, 3]
        rows = v.reshape(h, row_bytes)
    else:
        bpp = 24
        row_bytes = (w * 3 + 3) & ~3
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, 0 : w * 3 : 3] = rgba[:, :, 2]
        rows[:, 1 : w * 3 : 3] = rgba[:, :, 1]
        rows[:, 2 : w * 3 : 3] = rgba[:, :, 0]
    pix = rows[::-1].tobytes()
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, bpp, 0, len(pix), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    return hdr + dib + pix


# ---------------------------------------------------------------- ICO


def _ico_entries(data: bytes) -> list[tuple[int, int, bytes]]:
    if len(data) < 6 or data[:4] not in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        raise BmpError("not an ICO/CUR file")
    (count,) = struct.unpack_from("<H", data, 4)
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise BmpError("truncated icon directory")
        bw, bh = data[off], data[off + 1]
        size, img_off = struct.unpack_from("<II", data, off + 8)
        w = bw or 256
        h = bh or 256
        out.append((w, h, data[img_off : img_off + size]))
    return out


@_boundary
def decode_ico_all(data: bytes) -> list[np.ndarray]:
    """Every icon entry decoded to (h, w, 4) RGBA."""
    out = []
    for _, _, payload in _ico_entries(data):
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from pdf_parser_spark import media_codecs

            try:
                png = media_codecs.decode_png(payload)
            except Exception as exc:  # zlib errors etc. from a bad entry
                raise BmpError(f"bad PNG icon entry: {exc}") from exc
            if png.ndim == 2:
                png = np.stack([png] * 3, axis=-1)
            if png.shape[-1] == 3:
                png = np.concatenate(
                    [png, np.full((*png.shape[:2], 1), 255, np.uint8)], axis=-1
                )
            out.append(png)
        else:
            out.append(decode_bmp_dib(payload, ico_mode=True))
    return out


@_boundary
def decode_ico(data: bytes) -> np.ndarray:
    """The largest icon in the file (the conventional pick) as RGBA."""
    imgs = decode_ico_all(data)
    if not imgs:
        raise BmpError("empty ICO")
    return max(imgs, key=lambda a: a.shape[0] * a.shape[1])


def encode_ico(images: "list[np.ndarray]", as_png: bool = True) -> bytes:
    """RGBA images -> ICO; entries stored as PNG (modern) or 32-bit BMP."""
    from pdf_parser_spark import media_codecs

    payloads = []
    for img in images:
        h, w = img.shape[:2]
        if w > 256 or h > 256:
            raise BmpError("icon entries cap at 256x256")
        if as_png:
            payloads.append(media_codecs.encode_png(img))
        else:
            v = np.zeros((h, w, 4), dtype=np.uint8)
            v[:, :, 0] = img[:, :, 2]
            v[:, :, 1] = img[:, :, 1]
            v[:, :, 2] = img[:, :, 0]
            v[:, :, 3] = img[:, :, 3] if img.shape[-1] == 4 else 255
            pix = v[::-1].reshape(h, w * 4).tobytes()
            and_row = (w + 31) // 32 * 4
            mask = b"\x00" * (and_row * h)
            dib = struct.pack(
                "<IiihHIIiiII", 40, w, h * 2, 1, 32, 0, len(pix) + len(mask),
                2835, 2835, 0, 0,
            )
            payloads.append(dib + pix + mask)
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for img, payload in zip(images, payloads):
        h, w = img.shape[:2]
        out += struct.pack(
            "<BBBBHHII",
            w & 0xFF if w < 256 else 0,
            h & 0xFF if h < 256 else 0,
            0, 0, 1, 32, len(payload), offset,
        )
        offset += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)
