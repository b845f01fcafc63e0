"""BMP + ICO codecs — round-trip and hand-built-variant tests.

The encoder covers 24/32-bit BMP and PNG/BMP-entry ICO; the remaining
decoder branches (1/4/8-bit palette, 16-bit masks, RLE8/RLE4, top-down
rows, core header) are exercised by hand-assembled files whose expected
pixels are computed independently in the test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parser_spark import bmp_codec as B


def _rgba(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_roundtrip_24_and_32bit():
    img = _rgba(13, 9)
    opaque = img.copy()
    opaque[:, :, 3] = 255
    assert np.array_equal(B.decode_bmp(B.encode_bmp(opaque)), opaque)
    # translucent -> 32-bit path
    assert np.array_equal(B.decode_bmp(B.encode_bmp(img)), img)
    # odd width exercises the 24-bit row padding
    odd = opaque[:, :7]
    assert np.array_equal(B.decode_bmp(B.encode_bmp(odd)), odd)


def _dib(w, h, bpp, compression, palette=b"", pix=b"", n_colors=0):
    hdr = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, bpp, compression, len(pix), 0, 0, n_colors, 0
    )
    return hdr + palette + pix


def test_8bit_palette_and_topdown():
    # 3x2, palette [red, green, blue], bottom-up then top-down
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0]) + bytes([255, 0, 0, 0])
    rows_bu = bytes([0, 1, 2, 0]) + bytes([2, 2, 1, 0])  # padded to 4
    img = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(3, 2, 8, 0, pal, rows_bu, 3))
    # bottom-up: stored first row is the BOTTOM row
    assert img[1, 0].tolist() == [255, 0, 0, 255]   # red
    assert img[0, 0].tolist() == [0, 0, 255, 255]   # blue
    img_td = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(3, -2, 8, 0, pal, rows_bu, 3))
    assert np.array_equal(img_td, img[::-1])


def test_1bit_and_4bit():
    pal2 = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])
    # width 10, 1bpp: bits 1010101010 -> byte 0xAA, 0x80, padded to 4
    row = bytes([0b10101010, 0b10000000, 0, 0])
    img = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(10, 1, 1, 0, pal2, row, 2))
    assert img[0, 0, 2] == 255 and img[0, 1, 2] == 0 and img[0, 8, 2] == 255
    pal16 = b"".join(bytes([i * 16, i * 8, i * 4, 0]) for i in range(16))
    row4 = bytes([0x12, 0x34, 0, 0])  # pixels 1,2,3,4 then pad
    img4 = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(4, 1, 4, 0, pal16, row4, 16))
    assert img4[0, 0].tolist() == [4, 8, 16, 255]
    assert img4[0, 3].tolist() == [16, 32, 64, 255]


def test_16bit_555_and_bitfields():
    # one pixel, 5-5-5: r=31, g=0, b=15 -> 0x7C0F
    pix = struct.pack("<HH", 0x7C0F, 0)
    img = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(1, 1, 16, 0, b"", pix))
    assert img[0, 0].tolist() == [255, 0, 123, 255]
    # 565 via BI_BITFIELDS
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    pix565 = struct.pack("<HH", (31 << 11) | (63 << 5) | 0, 0)
    img2 = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(1, 1, 16, 3, masks + b"", pix565))
    assert img2[0, 0].tolist() == [255, 255, 0, 255]


def test_rle8():
    pal = bytes([0, 0, 10, 0]) + bytes([0, 0, 20, 0]) + bytes([0, 0, 30, 0])
    # row0(bottom): run 4x idx1; EOL; row1: absolute-mode [2,0,2] (escape
    # 00 03, then 3 indices + pad byte to word-align); EOB
    rle = bytes([4, 1, 0, 0, 0, 3, 2, 0, 2, 0, 0, 1])
    img = B.decode_bmp(b"BM" + b"\x00" * 12 + _dib(4, 2, 8, 1, pal, rle, 3))
    assert img[1].tolist() == [[20, 0, 0, 255]] * 4          # bottom row
    assert img[0, :3, 0].tolist() == [30, 10, 30]            # absolute row


def test_ico_roundtrip_png_and_bmp_entries():
    imgs = [_rgba(16, 16, 1), _rgba(32, 32, 2)]
    for as_png in (True, False):
        blob = B.encode_ico(imgs, as_png=as_png)
        all_imgs = B.decode_ico_all(blob)
        assert len(all_imgs) == 2
        for got, want in zip(all_imgs, imgs):
            assert np.array_equal(got, want), as_png
        # decode_ico picks the largest
        assert B.decode_ico(blob).shape == (32, 32, 4)


def test_ico_and_mask_transparency():
    # 24-bit-style entry (32bpp with zero alpha) + AND mask marking the
    # first pixel transparent
    img = _rgba(2, 2, 3)
    img[:, :, 3] = 0  # no XOR alpha -> AND mask governs
    v = np.zeros((2, 2, 4), dtype=np.uint8)
    v[:, :, 0], v[:, :, 1], v[:, :, 2] = img[:, :, 2], img[:, :, 1], img[:, :, 0]
    pix = v[::-1].tobytes()
    # mask rows bottom-up: top row has pixel (0,0) transparent -> bit 1
    mask = bytes([0b00000000, 0, 0, 0]) + bytes([0b10000000, 0, 0, 0])
    dib = struct.pack("<IiihHIIiiII", 40, 2, 4, 1, 32, 0, len(pix) + len(mask), 0, 0, 0, 0)
    payload = dib + pix + mask
    ico = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", 2, 2, 0, 0, 1, 32, len(payload), 22
    ) + payload
    out = B.decode_ico(ico)
    assert out[0, 0, 3] == 0 and out[0, 1, 3] == 255 and out[1, 0, 3] == 255


def test_malformed():
    with pytest.raises(B.BmpError):
        B.decode_bmp(b"XX")
    with pytest.raises(B.BmpError):
        B.decode_ico(b"\x00\x00\x09\x00")
