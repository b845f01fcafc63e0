"""Baseline-TIFF codec — round-trip matrix + hand-built decoder fixtures.

The encoder round-trips 8-bit gray/RGB/RGBA across all four compressions
and the horizontal predictor; decoder-only branches (big-endian byte
order, WhiteIsZero inversion, palette images, 1-bit and 4-bit samples)
are exercised by hand-assembled files with independently computed
expected pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parser_spark import tiff_codec as T


def test_roundtrip_matrix():
    rng = np.random.default_rng(1)
    samples = {
        "gray": rng.integers(0, 256, size=(37, 53), dtype=np.uint8),
        "rgb": rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8),
        "rgba": rng.integers(0, 256, size=(20, 30, 4), dtype=np.uint8),
        "smooth": np.tile(np.arange(64, dtype=np.uint8), (40, 1)),
    }
    for name, img in samples.items():
        for comp in ("none", "lzw", "packbits", "deflate"):
            for pred in (False, True):
                blob = T.encode_tiff(img, compression=comp, predictor=pred,
                                     rows_per_strip=16)
                assert np.array_equal(T.decode_tiff(blob), img), (name, comp, pred)


def test_lzw_stream_primitives():
    rng = np.random.default_rng(2)
    for data in (b"", b"a", b"TOBEORNOTTOBEORTOBEORNOT" * 20,
                 bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
                 b"\x00" * 10000):
        assert T._lzw_decode(T._lzw_encode(data)) == data
    for data in (b"", b"abc", b"aaaaaaaabcd" * 30, bytes(range(256))):
        assert T._packbits_decode(T._packbits_encode(data), len(data)) == data


def _mm_tiff_gray_white_is_zero() -> tuple[bytes, np.ndarray]:
    """Hand-built big-endian 4x2 8-bit WhiteIsZero grayscale."""
    pix = bytes([0, 64, 128, 255, 10, 20, 30, 40])
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0),  # WhiteIsZero
        (273, 4, 1, None), (277, 3, 1, 1), (278, 4, 1, 2), (279, 4, 1, len(pix)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(struct.pack(">2sHI", b"MM", 42, ifd_off))
    out += struct.pack(">H", len(entries))
    for tag, typ, n, val in entries:
        v = data_off if val is None else val
        if typ == 3:
            out += struct.pack(">HHIHH", tag, typ, n, v, 0)
        else:
            out += struct.pack(">HHII", tag, typ, n, v)
    out += struct.pack(">I", 0)
    out += pix
    want = 255 - np.frombuffer(pix, dtype=np.uint8).reshape(2, 4)
    return bytes(out), want


def test_big_endian_white_is_zero():
    blob, want = _mm_tiff_gray_white_is_zero()
    assert np.array_equal(T.decode_tiff(blob), want)


def _le_tiff(entries_extra, pix, w, h, bps=8, extra_blobs=b""):
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bps),
        (259, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
        (278, 4, 1, h), (279, 4, 1, len(pix)),
    ] + entries_extra
    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    data_off = ext_off + len(extra_blobs)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, n, val in entries:
        v = data_off if val is None else val
        if typ == 3 and n == 1:
            out += struct.pack("<HHIHH", tag, typ, n, v, 0)
        else:
            out += struct.pack("<HHII", tag, typ, n, v)
    out += struct.pack("<I", 0)
    out += extra_blobs
    out += pix
    return bytes(out)


def test_palette_photometric():
    # 3-entry palette, 16-bit color-map values (v >> 8 gives 8-bit)
    n = 3
    cmap_vals = [0x1100, 0x2200, 0x3300,  # red plane
                 0x0400, 0x0500, 0x0600,  # green (tiny values -> >>8 = small)
                 0xAA00, 0xBB00, 0xCC00]  # blue
    cmap = struct.pack("<" + "H" * (3 * n), *cmap_vals)
    pix = bytes([0, 1, 2, 1])
    # hand-assemble: color map bytes first, pixel strip after
    combined = cmap + pix
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (277, 3, 1, 1), (278, 4, 1, 1), (279, 4, 1, len(pix)),
    ]
    ifd_off = 8
    base = ifd_off + 2 + 12 * (len(entries) + 2) + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    all_entries = entries + [(320, 3, 3 * n, base), (273, 4, 1, base + len(cmap))]
    all_entries.sort(key=lambda e: e[0])
    out += struct.pack("<H", len(all_entries))
    for tag, typ, nv, val in all_entries:
        if typ == 3 and nv == 1:
            out += struct.pack("<HHIHH", tag, typ, nv, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, nv, val)
    out += struct.pack("<I", 0)
    out += combined
    got = T.decode_tiff(bytes(out))
    assert got.shape == (1, 4, 3)
    assert got[0, 0].tolist() == [0x11, 0x04, 0xAA]
    assert got[0, 2].tolist() == [0x33, 0x06, 0xCC]
    assert got[0, 3].tolist() == [0x22, 0x05, 0xBB]


def test_1bit_and_4bit_gray():
    # 1-bit, 10 px wide: 1010101010 -> 0xAA, 0x80
    blob = _le_tiff([(262, 3, 1, 1)], bytes([0b10101010, 0b10000000]), 10, 1, bps=1)
    got = T.decode_tiff(blob)
    assert got[0, :4].tolist() == [255, 0, 255, 0]
    # 4-bit: values scale by 17
    blob4 = _le_tiff([(262, 3, 1, 1)], bytes([0x12, 0x34]), 4, 1, bps=4)
    assert T.decode_tiff(blob4)[0].tolist() == [17, 34, 51, 68]


def test_unsupported_raise_loudly():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    blob = bytearray(T.encode_tiff(img, compression="none"))
    with pytest.raises(T.TiffError):
        T.decode_tiff(b"II\x2b\x00rest")  # BigTIFF magic
    # tiled gate: inject tag 322 (TileWidth)
    tiled = _le_tiff([(322, 3, 1, 16)], img.tobytes(), 8, 8)
    with pytest.raises(T.TiffError, match="tiled"):
        T.decode_tiff(tiled)
