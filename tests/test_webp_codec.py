"""WebP lossless (VP8L) codec — round-trip, parity, and spec-table tests.

Correctness sources:
1. SELF round-trip: our literal-stream encoder through our decoder.
2. NATIVE parity (skip-if-absent): libwebp-encoded images across feature
   territory (predictor + cross-color transforms, palettes of several
   bundling widths, LZ77-heavy tiles, color cache, translucency) must
   decode pixel-identically to libwebp's own decoder — the encoder's
   default alpha-cleanup makes decoder-vs-decoder the honest comparison,
   with an exact original-array check for fully-opaque images.
3. SPEC table: the 120-entry distance map is re-derived from libwebp via
   single-copy probe streams (scripts/derive_webp_distances.py).
"""

from __future__ import annotations

import ctypes
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from pdf_parser_spark import webp_codec as W


def _lib():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


_LIB = _lib()
needs_native = pytest.mark.skipif(_LIB is None, reason="libwebp not loadable")


def _enc_native(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGBA(img.tobytes(), w, h, w * 4, ctypes.byref(out))
    assert n
    return ctypes.string_at(out, n)


def _dec_native(blob: bytes) -> np.ndarray:
    wv, hv = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(blob, len(blob), ctypes.byref(wv), ctypes.byref(hv))
    assert p
    return np.ctypeslib.as_array(p, shape=(hv.value, wv.value, 4)).copy()


def _samples() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(5)
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256, np.full((h, w), 255)],
        axis=-1,
    ).astype(np.uint8)
    pal2 = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], dtype=np.uint8)
    pal4 = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255], [9, 9, 9, 255]],
        dtype=np.uint8,
    )
    pal12 = rng.integers(0, 256, size=(12, 4), dtype=np.uint8)
    pal12[:, 3] = 255
    tile = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    return {
        "gradient": grad,
        "noise": rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8),
        "palette2": pal2[rng.integers(0, 2, size=(h, w))],
        "palette4": pal4[rng.integers(0, 4, size=(h, w))],
        "palette12": pal12[rng.integers(0, 12, size=(h, w))],
        "tiled": np.tile(tile, (6, 9, 1)),
        "big": np.tile(grad, (4, 4, 1)),
        "photo": np.clip(
            np.cumsum(rng.normal(0, 4, size=(120, 160, 4)), axis=1).astype(int)
            + 128,
            0,
            255,
        ).astype(np.uint8),
        "tiny": np.array([[[1, 2, 3, 255]]], dtype=np.uint8),
    }


# ------------------------------------------------------------ self round-trip


def test_roundtrip_own_encoder():
    for name, img in _samples().items():
        blob = W.encode_webp_lossless(img)
        assert np.array_equal(W.decode_webp(blob), img), name


def test_roundtrip_with_explicit_lz77_copies():
    img = np.arange(16 * 8 * 4, dtype=np.uint8).reshape(8, 16, 4) % 251
    # copy 5 pixels from one row up (plane code 1 -> (0,1))
    blob = W.encode_webp_lossless(img, copies={16 * 4 + 3: (5, 1)})
    got = W.decode_webp(blob)
    exp = img.reshape(-1, 4).copy()
    exp[16 * 4 + 3 : 16 * 4 + 8] = exp[16 * 3 + 3 : 16 * 3 + 8]
    assert np.array_equal(got.reshape(-1, 4), exp)


def test_malformed_and_lossy_gate():
    with pytest.raises(W.WebpError):
        W.decode_webp(b"RIFFxxxxNOPE")
    with pytest.raises(W.WebpError):
        W.decode_webp(b"")
    # a truncated lossy VP8 chunk fails typed, not with a crash
    lossy = b"RIFF" + b"\x14\x00\x00\x00" + b"WEBP" + b"VP8 " + b"\x04\x00\x00\x00" + b"\x00" * 4
    with pytest.raises(ValueError):
        W.decode_webp(lossy)
    # a REAL lossy VP8 frame decodes (vp8_codec round-trip encoder)
    from pdf_parser_spark import vp8_codec

    payload = vp8_codec.encode_vp8_frame(
        1, 1, [{"ymode": vp8_codec.DC_PRED, "uvmode": 0}]
    )
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    rgba = W.decode_webp(b"RIFF" + len(riff).to_bytes(4, "little") + riff)
    assert rgba.shape == (16, 16, 4)
    assert np.all(rgba[:, :, 3] == 255)


# ------------------------------------------------------------ native parity


@needs_native
def test_decode_native_streams_pixel_parity():
    for name, img in _samples().items():
        blob = _enc_native(img)
        got = W.decode_webp(blob)
        assert np.array_equal(got, _dec_native(blob)), name
        if img[:, :, 3].min() == 255:  # opaque: exact original round-trip
            assert np.array_equal(got, img), name


@needs_native
def test_decode_native_translucent_parity():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(33, 47, 4), dtype=np.uint8)
    blob = _enc_native(img)
    # encoder may rewrite RGB under alpha=0 (exact=off): decoder parity
    assert np.array_equal(W.decode_webp(blob), _dec_native(blob))


@needs_native
def test_native_decodes_our_streams():
    for name, img in _samples().items():
        blob = W.encode_webp_lossless(img)
        assert np.array_equal(_dec_native(blob), img), name


@needs_native
def test_distance_map_matches_reference_derivation():
    spec = importlib.util.spec_from_file_location(
        "derive_webp_distances",
        Path(__file__).parent.parent / "scripts" / "derive_webp_distances.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["derive_webp_distances"] = mod
    spec.loader.exec_module(mod)
    assert mod.derive() == W._DIST_MAP


# ------------------------------------------------- alpha (ALPH) + animation


def _enc_native_lossy_rgba(img: np.ndarray, q: float) -> bytes:
    h, w, _ = img.shape
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGBA(
        img.tobytes(), w, h, w * 4, ctypes.c_float(q), ctypes.byref(out)
    )
    assert n
    return ctypes.string_at(out, n)


@needs_native
def test_alpha_chunk_native_parity():
    """Lossy-with-alpha files (VP8X + ALPH + VP8): the alpha plane is
    coded losslessly, so ours must equal libwebp's byte-for-byte.  The
    content set drives every ALPH mode libwebp emits: raw planes
    (incompressible alpha), VP8L-compressed planes, and the horizontal
    prediction filter; the diagonal gradient exercises the in-stream
    VP8L predictor transform (incl. the rightmost-column top-right
    rule)."""
    rng = np.random.default_rng(4)
    h, w = 40, 56
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    alphas = {
        "noise": rng.integers(0, 256, (h, w), dtype=np.uint8),
        "hgrad": (xx * 255 // (w - 1)).astype(np.uint8),
        "vgrad": (yy * 255 // (h - 1)).astype(np.uint8),
        "diag": ((xx + yy) * 255 // (w + h - 2)).astype(np.uint8),
        "steps": ((xx // 8 * 37 + yy // 8 * 11) % 256).astype(np.uint8),
    }
    for name, alpha in alphas.items():
        img = np.dstack(
            [rng.integers(0, 256, (h, w, 3), dtype=np.uint8), alpha]
        )
        for q in (30, 75, 95):
            blob = _enc_native_lossy_rgba(img, q)
            assert np.array_equal(
                W.decode_webp(blob)[:, :, 3], _dec_native(blob)[:, :, 3]
            ), (name, q)


def test_alpha_unfilter_methods():
    """The four ALPH prediction filters, checked against a scalar
    forward-filter round-trip."""
    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    h, w = plane.shape
    for method in range(4):
        delta = np.zeros_like(plane, dtype=np.int32)
        for y in range(h):
            for x in range(w):
                if method == 0:
                    pred = 0
                elif y == 0:
                    pred = 0 if x == 0 else int(plane[0, x - 1])
                elif method == 1:
                    pred = int(plane[y - 1, 0] if x == 0 else plane[y, x - 1])
                elif method == 2:
                    pred = int(plane[y - 1, x])
                elif method == 3:
                    left = int(plane[y - 1, 0] if x == 0 else plane[y, x - 1])
                    top = int(plane[y - 1, x])
                    tl = int(plane[y - 1, 0] if x == 0 else plane[y - 1, x - 1])
                    pred = min(255, max(0, left + top - tl))
                delta[y, x] = (int(plane[y, x]) - pred) % 256
        body = bytes([method << 2]) + delta.astype(np.uint8).tobytes()
        got = W.decode_alpha(body, w, h)
        assert np.array_equal(got, plane), method


def test_animation_roundtrip_compositing():
    """Self-built animations through the muxer: blending semantics,
    disposal, offsets, durations — no native demuxer exists in this
    container, so the muxer+spec is the oracle (as with encode_gif)."""
    rng = np.random.default_rng(12)
    f = rng.integers(0, 256, (3, 8, 12, 4), dtype=np.uint8)
    blob = W.encode_webp_anim(
        f, durations_ms=[40, 50, 60],
        offsets=[(0, 0), (4, 2), (8, 4)], canvas=(20, 12),
    )
    stack, durs = W.decode_webp_frames(blob)
    assert stack.shape == (3, 12, 20, 4) and durs == [40, 50, 60]
    assert np.array_equal(stack[0][:8, :12], f[0])
    assert np.array_equal(stack[1][2:10, 4:16], f[1])
    # untouched canvas corner stays background (opaque white default)
    assert np.array_equal(stack[0][10, 19], [255, 255, 255, 255])
    # frame 0's pixels persist under frame 1 where not overdrawn
    assert np.array_equal(stack[1][0, 0], f[0][0, 0])

    # alpha blending: a half-transparent frame over an opaque one
    base = np.full((1, 4, 4, 4), 200, dtype=np.uint8)
    base[..., 3] = 255
    over = np.full((1, 4, 4, 4), 100, dtype=np.uint8)
    over[..., 3] = 128
    blob = W.encode_webp_anim(
        np.concatenate([base, over]), no_blend=False, canvas=(4, 4)
    )
    stack, _ = W.decode_webp_frames(blob)
    # out = (100*128*255 + 200*255*(255-128)) / (128*255 + 255*127)
    got = stack[1][0, 0]
    assert got[3] == 255  # opaque base keeps canvas opaque
    assert abs(int(got[0]) - 150) <= 1  # ~alpha-weighted mix

    # dispose-to-background clears the frame rect for the NEXT frame
    blob = W.encode_webp_anim(
        f[:2], offsets=[(0, 0), (0, 0)], canvas=(12, 8),
        dispose_bg=True, bg_rgba=(0, 0, 0, 0),
    )
    stack, _ = W.decode_webp_frames(blob)
    assert np.array_equal(stack[0], f[0])  # frame 0 rendered pre-dispose


def test_vp8x_still_and_frames_api():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (10, 14, 4), dtype=np.uint8)
    blob = W.encode_webp_lossless(img)
    frames, durs = W.decode_webp_frames(blob)
    assert frames.shape == (1, 10, 14, 4) and durs == [0]
    assert np.array_equal(frames[0], img)


def test_decode_alpha_malformed():
    with pytest.raises(W.WebpError):
        W.decode_alpha(b"", 4, 4)
    with pytest.raises(W.WebpError):
        W.decode_alpha(bytes([0xC0]) + b"\x00" * 16, 4, 4)  # reserved bits
    with pytest.raises(W.WebpError):
        W.decode_alpha(bytes([0x02]) + b"\x00" * 16, 4, 4)  # bad compression
    with pytest.raises(W.WebpError):
        W.decode_alpha(bytes([0x00]) + b"\x00" * 3, 4, 4)  # short raw plane
