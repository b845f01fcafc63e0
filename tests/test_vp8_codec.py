"""Lossy VP8 (RFC 6386) decoder — oracle parity, round-trip, and table
provenance tests.

Correctness sources, mirroring test_webp_codec/test_zstd_codec:
1. EMBEDDED fixture (runs without libwebp): a libwebp-encoded 48x32
   frame pinned by SHA-256 of the decoded Y/U/V planes — VP8
   reconstruction is normative, so the planes are format constants.
2. NATIVE parity (skip-if-absent): libwebp encodes across content
   types, sizes (incl. non-MB-multiple), and the full quality range;
   our decoder's planes must equal WebPDecodeYUV's bit-for-bit.
3. SELF round-trip: the module's own key-frame encoder drives both our
   decoder AND libwebp over chosen prediction modes / token categories
   / filter levels — each feature is pinned in isolation.
4. SPEC tables: vp8_tables.py re-derives from the shipped libwebp
   (scripts/derive_vp8_tables.py) so the constants cannot drift.
"""

from __future__ import annotations

import base64
import ctypes
import hashlib
import sys
from pathlib import Path

import numpy as np
import pytest

import pdf_parser_spark.vp8_codec as V
from pdf_parser_spark.vp8_tables import AC_QLOOKUP, DC_QLOOKUP


def _lib():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


_LIB = _lib()
needs_native = pytest.mark.skipif(_LIB is None, reason="libwebp not loadable")


def _enc_native(img: np.ndarray, q: float) -> bytes:
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(
        img.tobytes(), w, h, w * 3, float(q), ctypes.byref(out)
    )
    assert n
    blob = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return blob


def _dec_native_yuv(blob: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uvstride = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h), ctypes.byref(u),
        ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uvstride),
    )
    assert p
    W, H, S, US = w.value, h.value, stride.value, uvstride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y_ = np.ctypeslib.as_array(p, shape=(H, S))[:, :W].copy()
    u_ = np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy()
    v_ = np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy()
    _LIB.WebPFree(p)
    return y_, u_, v_


def _vp8_payload(webp_blob: bytes) -> bytes:
    assert webp_blob[:4] == b"RIFF" and webp_blob[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp_blob):
        tag = webp_blob[pos : pos + 4]
        size = int.from_bytes(webp_blob[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            return webp_blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _wrap_webp(payload: bytes) -> bytes:
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _images():
    rng = np.random.default_rng(5)
    out = {}
    h, w = 41, 57  # non-MB-multiple on purpose
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out["gradient"] = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    out["noise"] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[::2, :, 0] = 200
    img[:, ::3, 1] = 150
    img[h // 2 :, w // 2 :] = [30, 180, 240]
    out["blocks"] = img
    base = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
    photo = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w]
    out["photo"] = np.clip(
        photo + rng.integers(-6, 7, (h, w, 3)), 0, 255
    ).astype(np.uint8)
    return out


# libwebp-encoded 48x32 noise frame at q80; the pinned SHAs below are
# libwebp's own WebPDecodeYUV output for it (normative reconstruction)
_FIXTURE_B64 = (
    "cBkAnQEqMAAgAAFAJiWwAnTKEEBaUuhPgcADbAeYD9oP2A7AHoAfs76p/qAftj7AH6zeqV/o"
    "/2y+AX9i/2y+AD9ov/dggjQTNx754uOAPlQ1AuxfBXvB9xMgH9c/ADvCqweLR8x/0PGB3IP+"
    "19AP7X4A3yP+bfqB8AH8f/mX/O/rvuWfo3/K/w/5O+wL8m/m3+y/tvwA/x7+Z/6/+5+yX6j/"
    "1L9h/9Tz3T3aZ+8tr5qEgj+mLmYPJXrqDUSZSgJT2M8+5qddnXTTzVRUekj1HeGIgAAA/cT5"
    "kpVgn1OYkT2IHcsGppLLP3wkbBgiJHULG4s29kS8Bf+sR0+wu5doVBos2MTVSwwF/N2VJLgK"
    "UWUywezvZvop7CpxwPwyh1Kt+s1jVDsah+/fM48AhT3VnQrFtoUjB/esX969E6TU7LJvE7IY"
    "OSP/BOg278QyXwbmRGpjXhtAxskkUEXpRVtSghd1m01v/M2QrOi21kC/mhp5WNDHHOUHVYCY"
    "LBh8tS6f35cSsrye63yCD3Uq08KJKP4P/PphwcAzlVM3Phw2WgS6vg8Zds060+OCntXT5MWb"
    "Z4tToSsKur22PgVEsbK/9hsYQTHied2NKYh4uID2q/gAsdxPnQZcl/d5iagj3oqs6W7bc/cw"
    "4JMlLp9AYWI461oXOCo1y1U9ghD9lsauJrC4DPszoPwLbCpQoVX7GNTelIni6OOk4b8ixqKN"
    "zPpOihtoWBcnlZjKhrMIrZZwdbgnyjLo8kqiNFt/Oi1cjb08xf0+uZ1OeqngAJtftw4Rs0WN"
    "6c1Ix6zSRkI0siBcWDfjp24kQwPn28fJvHpt8CfSUpmn+0scA0IngRzbgDVWMas/X4B4Ymo/"
    "3LAIWgHG6Qjb66ZAAk8qa49qxQ0EVaCqeRKEd72gBG/HoaXCDjn9lNhhZSh6yMavCgSHGqxr"
    "9nsH6iofD5HdiDvZ3F6B0ve3q5PIH51OfbVdvaRyPPER0fyV3FzqVv5g23NUinsvREaq7T4N"
    "WIKpdowufNlcQdaT+lgKyYF+ktfU13pvTl+rhlmDWaVBHG4GY3m58RpD/qtrshZjQBajhFCW"
    "aLi7RFs/NuRlxdgNpWEY2tY6nVwqnjfSJO4EoE/ECLT0U2UNmwycduRgxndy7r86du1gI4vY"
    "b4+wM0WA9YKEKbS/e0XBiX/46TtezFkgaSyHl9XLpUf8EWQfWCNopLXmaRzos2BhkLsQUBeq"
    "g6Xy5bLYjVxhte07wYTB+Nh4dcTZIeOmtxr4usD0ph6UstVtGUi8zmV/25oL0dbOL4LmN8EE"
    "T77p7OUn2hHb9EFI/sMOzOp5Z4ndnrO3vlkxWHg3wy7RwG2pgW034SlvVRGShmlUARiaHUt4"
    "DjAsmghNiHzIUHrnCs8bBFOFhYAojrQ+2xp/9oO7JA6h6U7GQqsJ2aktITKZNdsG5s0/qFER"
    "mRKB47klxM4tcMON2iKNaJ8E+WejrK/YvrFWgDumiAg1DFThk1F5SpEfWGRkDKGjfqZcT56H"
    "lvRsop7tBn6RXeyocUqAxRWmntz+cMoZMegwfpXFUx4LC2J+kuPfYjTTaa14yKmzTnfLUxWR"
    "UfDs9Ds7PqZqhT/FKAuljUFb28uNQWmz0xL2nXvI6mxjlv7b4HqnrXb4AdRw2sXCOvhTGQl1"
    "4ca5E1SqnkCj8BhHarlSvlRkrgnRW1xrU7UhsTaVEwHVvtyDBTlWUNcPg/i0WvAPsnHJywar"
    "6AAAAA=="
)

_FIXTURE = base64.b64decode("".join(_FIXTURE_B64))
_FIXTURE_SHAS = {
    "Y": "1b68031145eacd6559920d65f175f3c97356d6d988bc8b2d2ad2b2cd674fad27",
    "U": "7b8542a52667c0f8e1ac1493390a816774a660df2cbcebdd920255cd91ab94fa",
    "V": "c7124ecef121dad9a1dbc7a616221c1c0d3dd7623c5229bb098aae1317899bf8",
}


def test_embedded_fixture_planes_pinned():
    y, u, v = V.decode_vp8(_FIXTURE)
    assert y.shape == (32, 48) and u.shape == (16, 24) and v.shape == (16, 24)
    for name, plane in zip("YUV", (y, u, v)):
        assert hashlib.sha256(plane.tobytes()).hexdigest() == _FIXTURE_SHAS[name]


def test_rgb_conversion_deterministic():
    y, u, v = V.decode_vp8(_FIXTURE)
    rgb = V.yuv420_to_rgb(y, u, v)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    # flat mid-gray YUV maps to mid-gray RGB
    g = V.yuv420_to_rgb(
        np.full((4, 4), 126, np.uint8),
        np.full((2, 2), 128, np.uint8),
        np.full((2, 2), 128, np.uint8),
    )
    assert np.all(np.abs(g.astype(int) - 128) <= 1)


@needs_native
@pytest.mark.parametrize("kind", ["gradient", "noise", "blocks", "photo"])
@pytest.mark.parametrize("q", [5, 40, 75, 95])
def test_native_parity(kind, q):
    img = _images()[kind]
    blob = _enc_native(img, q)
    ref = _dec_native_yuv(blob)
    got = V.decode_vp8(_vp8_payload(blob))
    for name, a, b in zip("YUV", got, ref):
        assert np.array_equal(a, b), f"{name} plane mismatch at q={q}"


@needs_native
def test_all_prediction_modes_pinned():
    """Every 16x16 / chroma / B mode through our encoder: our decoder
    and libwebp must reconstruct identical planes (all-skip frames, so
    this isolates prediction exactly)."""
    for ym in range(4):
        for uv in range(4):
            payload = V.encode_vp8_frame(2, 2, [
                {"ymode": ym, "uvmode": uv} for _ in range(4)
            ])
            got = V.decode_vp8(payload)
            ref = _dec_native_yuv(_wrap_webp(payload))
            assert all(np.array_equal(a, b) for a, b in zip(got, ref)), (ym, uv)
    for bm in range(10):
        payload = V.encode_vp8_frame(1, 1, [
            {"ymode": V.B_PRED, "bmodes": [bm] * 16, "uvmode": 0}
        ])
        got = V.decode_vp8(payload)
        ref = _dec_native_yuv(_wrap_webp(payload))
        assert all(np.array_equal(a, b) for a, b in zip(got, ref)), bm


@needs_native
def test_token_categories_y2_and_filter_levels():
    """Randomized in-gamut residuals across every token category, Y2
    blocks, and the loop-filter level range, all pinned to libwebp."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        mb_w, mb_h = int(rng.integers(1, 4)), int(rng.integers(1, 3))
        qi = int(rng.integers(0, 128))
        flevel = int(rng.integers(0, 64))
        maxdq = max(DC_QLOOKUP[qi], AC_QLOOKUP[qi],
                    AC_QLOOKUP[qi] * 155 // 100 * 2)
        cap = max(1, 4000 // maxdq)

        def blk():
            b = [0] * 16
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(0, 16))] = int(
                    rng.integers(1, cap + 1)
                ) * int(rng.choice([-1, 1]))
            return b

        modes = []
        for _ in range(mb_w * mb_h):
            if rng.random() < 0.5:
                m = {"ymode": V.B_PRED,
                     "bmodes": rng.integers(0, 10, 16).tolist(),
                     "uvmode": int(rng.integers(0, 4))}
            else:
                m = {"ymode": int(rng.integers(0, 4)),
                     "uvmode": int(rng.integers(0, 4))}
            if rng.random() < 0.8:
                m["y"] = [blk() if rng.random() < 0.7 else [0] * 16
                          for _ in range(16)]
                m["u"] = [blk() if rng.random() < 0.5 else [0] * 16
                          for _ in range(4)]
                m["v"] = [blk() if rng.random() < 0.5 else [0] * 16
                          for _ in range(4)]
                if m["ymode"] != V.B_PRED and rng.random() < 0.7:
                    m["y2"] = blk()
            modes.append(m)
        payload = V.encode_vp8_frame(mb_w, mb_h, modes, qi=qi,
                                     filter_level=flevel)
        got = V.decode_vp8(payload)
        ref = _dec_native_yuv(_wrap_webp(payload))
        assert all(np.array_equal(a, b) for a, b in zip(got, ref)), (
            trial, mb_w, mb_h, qi, flevel)


def test_self_roundtrip_without_native():
    """Encoder->decoder loop needs no external library: all-skip frames
    reconstruct the exact prediction surfaces."""
    payload = V.encode_vp8_frame(1, 1, [{"ymode": V.DC_PRED, "uvmode": 0}])
    y, u, v = V.decode_vp8(payload)
    assert np.all(y == 128) and np.all(u == 128) and np.all(v == 128)
    # H_PRED propagates the 129 left dummy column
    payload = V.encode_vp8_frame(1, 1, [{"ymode": V.H_PRED, "uvmode": 2}])
    y, u, v = V.decode_vp8(payload)
    assert np.all(y == 129) and np.all(u == 129) and np.all(v == 129)


def test_bool_coder_roundtrip_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 300))
        bits = rng.integers(0, 2, n).tolist()
        probs = rng.integers(1, 255, n).tolist()
        e = V.BoolEncoder()
        for b, p in zip(bits, probs):
            e.bit(int(b), int(p))
        d = V.BoolDecoder(e.finish())
        assert [d.bit(int(p)) for p in probs] == [int(b) for b in bits]


def test_malformed_streams_raise():
    with pytest.raises(V.Vp8Error):
        V.decode_vp8(b"\x00\x00")
    with pytest.raises(V.Vp8Error):  # interframe tag
        V.decode_vp8(b"\x01" + _FIXTURE[1:])
    with pytest.raises(V.Vp8Error):  # bad start code
        V.decode_vp8(_FIXTURE[:3] + b"\x00\x01\x2a" + _FIXTURE[6:])
    with pytest.raises(V.Vp8Error):  # first partition overruns payload
        V.decode_vp8(_FIXTURE[:24])
    # truncated TOKEN data must not raise (bool decoder reads 0s past
    # the end, the normative behaviour) — planes still come back
    y, _, _ = V.decode_vp8(_FIXTURE[: len(_FIXTURE) - 40])
    assert y.shape == (32, 48)


@needs_native
def test_tables_rederive_from_libwebp():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        from derive_vp8_tables import derive_tables
    finally:
        sys.path.pop(0)
    got = derive_tables()
    import pdf_parser_spark.vp8_tables as T
    assert got["COEFF_PROBS"] == T.COEFF_PROBS
    assert got["COEFF_UPDATE_PROBS"] == T.COEFF_UPDATE_PROBS
    assert got["KF_BMODE_PROBS"] == T.KF_BMODE_PROBS
    assert got["DC_QLOOKUP"] == T.DC_QLOOKUP
    assert got["AC_QLOOKUP"] == T.AC_QLOOKUP
