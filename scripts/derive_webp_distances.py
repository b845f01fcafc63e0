"""Derive VP8L's 120-entry distance map empirically from libwebp.

Plane codes 1..120 in WebP-lossless LZ77 name two-dimensional neighbor
offsets rather than linear distances. The table is a spec constant; this
script recovers it from the reference decoder instead of transcribing
120 rows: for each plane code k it builds a minimal VP8L stream (all
literal pixels carrying their own coordinates, plus one length-1 copy
with plane code k at a center position), decodes it with the SYSTEM
libwebp, and reads the copied pixel's coordinates back off.

The derived table is hard-coded in pdf_parser_spark/webp_codec.py as
_DIST_MAP; tests/test_webp_codec.py re-runs this derivation when libwebp
is present and asserts the constant matches.

Run: python scripts/derive_webp_distances.py
"""

from __future__ import annotations

import ctypes
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pdf_parser_spark import webp_codec as W  # noqa: E402


def _decoder():
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


def derive(width: int = 17, height: int = 10) -> list[tuple[int, int]]:
    lib = _decoder()
    cx, cy = width // 2, height - 2  # probe position: room on all sides
    probe_idx = cy * width + cx
    # literal pixels carry their coordinates: r=x, g=y, b=x^y
    img = np.zeros((height, width, 4), dtype=np.uint8)
    for y in range(height):
        for x in range(width):
            img[y, x] = (x, y, x ^ y, 255)
    table: list[tuple[int, int]] = []
    for plane in range(1, 121):
        blob = W.encode_webp_lossless(img, copies={probe_idx: (1, plane)})
        wv, hv = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(wv), ctypes.byref(hv))
        if not p:
            raise AssertionError(f"libwebp rejected probe for plane {plane}")
        arr = np.ctypeslib.as_array(p, shape=(hv.value, wv.value, 4)).copy()
        r, g, _, _ = arr[cy, cx]
        dx, dy = cx - int(r), cy - int(g)
        # dist < 1 clamps to 1 in the decoder; offsets here never clamp
        # because the probe sits away from the left/top edges
        table.append((dx, dy))
    return table


if __name__ == "__main__":
    table = derive()
    print("_DIST_MAP = [")
    for i in range(0, 120, 8):
        row = ", ".join(f"({dx}, {dy})" for dx, dy in table[i : i + 8])
        print(f"    {row},")
    print("]")
    match = table == W._DIST_MAP
    print(f"# matches webp_codec._DIST_MAP: {match}")
