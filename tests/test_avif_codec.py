"""AVIF — from-scratch item-layer container + AV1 payload tests.

Correctness sources:
1. FOREIGN fixture (embedded, runs without any codec library): a
   libavif-written 48x32 AVIF whose container fields our from-scratch
   parser must read exactly; with a decoder present, its RGB output is
   pinned by SHA-256.
2. WRITER cross-check (skip-if-absent): libavif must read our
   from-scratch writer's file and produce byte-identical YUV planes.
3. ROUND TRIP: encode_avif → parse_avif → decode_avif equals the direct
   av1_codec decode under the same documented YUV→RGB transform.
"""

from __future__ import annotations

import base64
import ctypes as C
import hashlib

import numpy as np
import pytest

import pdf_parser_spark.av1_codec as A
import pdf_parser_spark.avif_codec as AV
from rav1e_util import encode_av1, have_rav1e, planes_420

_FOREIGN_B64 = (
    "AAAAIGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZk1BMUIAAADybWV0YQAAAAAAAAAoaGRscgAA"
    "AAAAAAAAcGljdAAAAAAAAAAAAAAAAGxpYmF2aWYAAAAADnBpdG0AAAAAAAEAAAAeaWxvYwAA"
    "AABEAAABAAEAAAABAAABGgAAAbEAAAAoaWluZgAAAAAAAQAAABppbmZlAgAAAAABAABhdjAx"
    "Q29sb3IAAAAAamlwcnAAAABLaXBjbwAAABRpc3BlAAAAAAAAADAAAAAgAAAAEHBpeGkAAAAA"
    "AwgICAAAAAxhdjFDgQAMAAAAABNjb2xybmNseAACAAIAAoAAAAAXaXBtYQAAAAAAAAABAAEE"
    "AQKDBAAAAbltZGF0EgAKBhgVL/8iEDKkAxAAAPHWjyaOmPwz//iAGFwR9R6wyjQVDhdVFXuV"
    "1aQSK5uvZTGsS4LmFZc420GyzOvUx8JLBg4YYYL/EdffPa0ddfw0kebZPxioRGwdQ/epnqdK"
    "4bUA+6Yyv92PaT0g0sHJgD0iCTEbZV4qgBP9QYf2fYjCZ1+HjMIOkGJsKqbNnzwTiuE5LPz+"
    "8rVHT/Wsy5Nxb2YK99xYk1F1UD2vH64RFvKS+wLd1R2DaMb6g7o/TG0zpp6qysMBPpkg7HSs"
    "un2S4RHAkNatqe9mYOO1XfT/2EUEykBH2UAU2ypRQMp3DNnTmc0cakCjWBRmIQ1AaZTxJ1VN"
    "lCHBMK9X+6FKsaCm8ETUaDqmYTh1HVzp2WSbIu1Q5NYQF1/z2ANl8SOcmGI1jKPxRTjIxxHc"
    "ykGiavmq4ML9xccMLNbIAdjrYv472CMdVcuHWf3H+z0wk65m+FaRHfWZKzPCqXEEFwCN6EuM"
    "R+/k+HsHJk/wcFB0yBj2sv/5Slq6483GfU2Wo6VdqO47lDZackG5LcyPQ44pOpDB5OxreuRR"
    "PudOkhxrbCv5bdcnQA=="
)
_FOREIGN = base64.b64decode("".join(_FOREIGN_B64))
_FOREIGN_RGB_SHA = "bcfdb1fa5e8d14cec6462d7291d5948ee67a1d5e7ad11f0711e1338b95abd120"

_HAVE_DECODER = A.native_decoder_name() is not None
needs_decoder = pytest.mark.skipif(not _HAVE_DECODER, reason="no AV1 decoder")
needs_rav1e = pytest.mark.skipif(not have_rav1e(), reason="librav1e absent")


def _libavif():
    try:
        av = C.CDLL("libavif.so.15")
    except OSError:
        return None
    av.avifDecoderCreate.restype = C.c_void_p
    av.avifImageCreateEmpty.restype = C.c_void_p
    av.avifDecoderReadMemory.argtypes = [
        C.c_void_p, C.c_void_p, C.c_char_p, C.c_size_t,
    ]
    return av


_LIBAVIF = _libavif()
needs_libavif = pytest.mark.skipif(_LIBAVIF is None, reason="libavif absent")


# ---------------------------------------------------------------------------
# pure container layer — no codec library
# ---------------------------------------------------------------------------


def test_foreign_fixture_parses():
    assert AV.is_avif(_FOREIGN)
    info = AV.parse_avif(_FOREIGN)
    assert info["item_type"] == "av01"
    assert (info["width"], info["height"]) == (48, 32)
    assert info["av1c"] is not None and not info["av1c"]["high_bitdepth"]
    assert info["seq"]["bit_depth"] == 8
    assert len(info["payload"]) > 0
    # the item is a self-contained temporal unit: frame OBUs parse
    types = [o.type_name for o in A.parse_obus(info["payload"])]
    assert "frame" in types or "frame_header" in types


def test_is_avif_rejects_non_avif():
    assert not AV.is_avif(b"")
    assert not AV.is_avif(b"\x89PNG\r\n\x1a\n" + b"x" * 32)
    # a video mp4 is ISO-BMFF but not avif-branded
    from pdf_parser_spark import mp4_demux

    raw = mp4_demux.encode_mp4_raw(np.zeros((1, 8, 8, 3), np.uint8))
    assert not AV.is_avif(raw)
    with pytest.raises(ValueError, match="avif brand"):
        AV.parse_avif(raw)


def test_parse_rejects_derived_and_truncated():
    # primary item retyped to 'grid' is now *supported* as a structure —
    # but this one is malformed (no dimg references), so it must fail
    # with the typed error naming the inconsistency
    grid = _FOREIGN.replace(b"av01Color", b"gridColor", 1)
    if grid != _FOREIGN:
        with pytest.raises(ValueError, match="dimg"):
            AV.parse_avif(grid)
    # extent overrun → typed error
    with pytest.raises(ValueError):
        AV.parse_avif(_FOREIGN[:-40])


def test_yuv_to_rgb_pinned():
    yuv = np.array([[[128, 128, 128], [255, 0, 0]],
                    [[0, 255, 255], [90, 200, 60]]], dtype=np.uint8)
    full = AV.yuv_to_rgb(yuv, True)
    studio = AV.yuv_to_rgb(yuv, False)
    # hand-checked: e.g. (Y255,U0,V0) full → R=255-1.402*128≈76, G clips
    # high (+0.344*128+0.714*128 above 255), B=255-1.772*128≈28
    assert full.tolist() == [
        [[128, 128, 128], [76, 255, 28]],
        [[178, 0, 225], [0, 114, 218]],
    ]
    assert studio.tolist() == [
        [[130, 130, 130], [74, 255, 20]],
        [[184, 0, 238], [0, 113, 231]],
    ]


# ---------------------------------------------------------------------------
# with reconstruction / native oracles
# ---------------------------------------------------------------------------


@needs_decoder
def test_foreign_fixture_decode_pinned():
    rgb = AV.decode_avif(_FOREIGN)
    assert rgb.shape == (32, 48, 3) and rgb.dtype == np.uint8
    assert hashlib.sha256(rgb.tobytes()).hexdigest() == _FOREIGN_RGB_SHA


@needs_decoder
@needs_rav1e
def test_writer_round_trip():
    stream = encode_av1(planes_420(64, 96, 1), quantizer=60)
    blob = AV.encode_avif(stream)
    assert AV.is_avif(blob)
    info = AV.parse_avif(blob)
    assert (info["width"], info["height"]) == (96, 64)
    direct = A.decode_av1(stream)[0]
    expect = AV.yuv_to_rgb(direct, info["seq"]["color_range_full"])
    assert np.array_equal(AV.decode_avif(blob), expect)


@needs_decoder
@needs_rav1e
@needs_libavif
def test_libavif_reads_our_writer():
    """The external oracle for the from-scratch container writer: libavif
    must accept the file and reconstruct byte-identical YUV planes."""
    stream = encode_av1(planes_420(64, 96, 1), quantizer=60)
    blob = AV.encode_avif(stream)
    dec = _LIBAVIF.avifDecoderCreate()
    img = _LIBAVIF.avifImageCreateEmpty()
    rc = _LIBAVIF.avifDecoderReadMemory(dec, img, blob, len(blob))
    assert rc == 0, f"libavif rejected our AVIF (result {rc})"
    u32 = C.cast(img, C.POINTER(C.c_uint32 * 24)).contents
    u64 = C.cast(img, C.POINTER(C.c_uint64 * 12)).contents
    assert (u32[0], u32[1], u32[2]) == (96, 64, 8)

    def plane(ptr, stride, ph, pw):
        buf = C.string_at(ptr, stride * ph)
        return np.frombuffer(buf, np.uint8).reshape(ph, stride)[:, :pw]

    ours = A.decode_av1(stream)[0]
    assert np.array_equal(plane(u64[3], u32[12], 64, 96), ours[:, :, 0])
    assert np.array_equal(plane(u64[4], u32[13], 32, 48), ours[::2, ::2, 1])
    assert np.array_equal(plane(u64[5], u32[14], 32, 48), ours[::2, ::2, 2])


@needs_decoder
@needs_libavif
def test_our_reader_matches_libavif_on_foreign_file():
    """Foreign-writer parity: both stacks decode libavif's own file to the
    same planes — pins the from-scratch iloc/ipco walk against a layout
    we did not write."""
    info = AV.parse_avif(_FOREIGN)
    ours = A.decode_av1(
        info["payload"],
        config_obus=info["av1c"]["config_obus"] if info["av1c"] else None,
    )[0]
    dec = _LIBAVIF.avifDecoderCreate()
    img = _LIBAVIF.avifImageCreateEmpty()
    assert _LIBAVIF.avifDecoderReadMemory(dec, img, _FOREIGN, len(_FOREIGN)) == 0
    u32 = C.cast(img, C.POINTER(C.c_uint32 * 24)).contents
    u64 = C.cast(img, C.POINTER(C.c_uint64 * 12)).contents

    def plane(ptr, stride, ph, pw):
        buf = C.string_at(ptr, stride * ph)
        return np.frombuffer(buf, np.uint8).reshape(ph, stride)[:, :pw]

    h, w = 32, 48
    assert np.array_equal(plane(u64[3], u32[12], h, w), ours[:, :, 0])
    assert np.array_equal(plane(u64[4], u32[13], h // 2, w // 2), ours[::2, ::2, 1])
    assert np.array_equal(plane(u64[5], u32[14], h // 2, w // 2), ours[::2, ::2, 2])


def test_avif_fuzz_never_crashes():
    rng = np.random.default_rng(13)
    for _ in range(60):
        mut = bytearray(_FOREIGN)
        for _ in range(rng.integers(1, 6)):
            mut[rng.integers(0, len(mut))] ^= 1 << rng.integers(0, 8)
        try:
            AV.decode_avif(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


_ALPHA_B64 = (
    "AAAAIGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZk1BMUIAAAGNbWV0YQAAAAAAAAAoaGRscgAA"
    "AAAAAAAAcGljdAAAAAAAAAAAAAAAAGxpYmF2aWYAAAAADnBpdG0AAAAAAAEAAAAsaWxvYwAA"
    "AABEAAACAAEAAAABAAACCAAAAJUAAgAAAAEAAAG1AAAAUwAAAEJpaW5mAAAAAAACAAAAGmlu"
    "ZmUCAAAAAAEAAGF2MDFDb2xvcgAAAAAaaW5mZQIAAAAAAgAAYXYwMUFscGhhAAAAABppcmVm"
    "AAAAAAAAAA5hdXhsAAIAAQABAAAAw2lwcnAAAACdaXBjbwAAABRpc3BlAAAAAAAAADAAAAAg"
    "AAAAEHBpeGkAAAAAAwgICAAAAAxhdjFDgQAMAAAAABNjb2xybmNseAACAAIAAoAAAAAOcGl4"
    "aQAAAAABCAAAAAxhdjFDgQAcAAAAADhhdXhDAAAAAHVybjptcGVnOm1wZWdCOmNpY3A6c3lz"
    "dGVtczphdXhpbGlhcnk6YWxwaGEAAAAAHmlwbWEAAAAAAAAAAgABBAECgwQAAgQBBYYHAAAA"
    "8G1kYXQSAAoGGBUv/yqAMkcQAKEMT/9fu60aGLnxsNJrlSnlOpx9on8XCfxBFz7RwpGHBSBT"
    "mDhNzEFGrjkntoggvBcME/fdOlt9l33YOfElQbKhFkf/+BIACgYYFS//IhAyiAEQAAB8QDuI"
    "nfyYFSkzcKfjJGOc9DlXz+48bzskCrQtv/AWIBTaz0+0C7+mT0s4//M7R4L3A+sX0NOs+zVT"
    "/VIG9cAp+rZ83vpV6/UT1KY8VX+zgAT0rOnd3OA68wuwJowzHpCcHY8Dw9CCEIDasWu7m4EA"
    "7rFRxhayOCARU4FZBKH4ihZ/8j4c"
)
_ALPHA = base64.b64decode("".join(_ALPHA_B64))
_ALPHA_SHA = "ea28c847a5413f7113bb95f2c2f94adf161ba1df507893a1910e49e514ea36e8"


def test_alpha_item_parses():
    """libavif-written alpha AVIF: the from-scratch walk must find the
    auxl-referenced alpha item and its own av1C — no codec library."""
    info = AV.parse_avif(_ALPHA)
    assert info["alpha_payload"] is not None and len(info["alpha_payload"]) > 0
    # the alpha stream is monochrome AV1; its sequence header travels in
    # the alpha item's av1C configOBUs OR inline in the item payload
    # (libavif leaves configOBUs empty and inlines it)
    seq = A.find_sequence_header(
        (info["alpha_config"] or b"") + info["alpha_payload"]
    )
    assert seq is not None and seq["mono_chrome"]


@needs_decoder
def test_alpha_decodes_rgba_pinned():
    rgba = AV.decode_avif(_ALPHA)
    assert rgba.shape == (32, 48, 4)
    assert hashlib.sha256(rgba.tobytes()).hexdigest() == _ALPHA_SHA
    # the encoded alpha ramp survives the (lossless-alpha) round trip
    expect = np.tile(np.linspace(0, 255, 48).astype(np.uint8), (32, 1))
    assert np.array_equal(rgba[:, :, 3], expect)
    # opaque files keep the 3-channel contract
    assert AV.decode_avif(_FOREIGN).shape[2] == 3


@needs_decoder
@needs_rav1e
def test_compose_grid_and_self_decode():
    """Multi-tile grid AVIF: the from-scratch writer assembles hidden
    av01 tiles behind a 'grid' item, and OUR decoder composes the tiles
    itself (per-tile AV1 decode), matching per-tile decodes exactly."""
    tile_streams = [
        encode_av1(planes_420(64, 64, 1, seed=i), quantizer=80)
        for i in range(4)
    ]
    tile_files = [AV.encode_avif(st) for st in tile_streams]
    grid = AV.compose_avif_grid(tile_files, rows=2, cols=2)
    info = AV.parse_avif(grid)
    assert info["item_type"] == "grid"
    assert info["grid"] == {"rows": 2, "cols": 2, "width": 128, "height": 128}
    assert len(info["tiles"]) == 4
    dec = AV.decode_avif(grid)
    parts = [AV.decode_avif(t) for t in tile_files]
    expect = np.vstack([np.hstack(parts[0:2]), np.hstack(parts[2:4])])
    assert np.array_equal(dec, expect)
    with pytest.raises(ValueError, match="rows\\*cols"):
        AV.compose_avif_grid(tile_files, rows=3, cols=2)


@needs_decoder
@needs_rav1e
@needs_libavif
def test_libavif_reads_our_grid():
    """Foreign-reader oracle for the grid writer: libavif must accept
    the composed file and reconstruct the same composition, plane for
    plane (64x64 tiles — MIAF's minimum, which libavif enforces)."""
    tile_streams = [
        encode_av1(planes_420(64, 64, 1, seed=i), quantizer=80)
        for i in range(4)
    ]
    grid = AV.compose_avif_grid(
        [AV.encode_avif(st) for st in tile_streams], rows=2, cols=2
    )
    dec = _LIBAVIF.avifDecoderCreate()
    img = _LIBAVIF.avifImageCreateEmpty()
    assert _LIBAVIF.avifDecoderReadMemory(dec, img, grid, len(grid)) == 0
    u32 = C.cast(img, C.POINTER(C.c_uint32 * 24)).contents
    u64 = C.cast(img, C.POINTER(C.c_uint64 * 12)).contents
    assert (u32[0], u32[1]) == (128, 128)

    def plane(ptr, stride, ph, pw):
        buf = C.string_at(ptr, stride * ph)
        return np.frombuffer(buf, np.uint8).reshape(ph, stride)[:, :pw]

    tiles_yuv = [A.decode_av1(st)[0] for st in tile_streams]
    comp = np.vstack(
        [np.hstack(tiles_yuv[0:2]), np.hstack(tiles_yuv[2:4])]
    )
    assert np.array_equal(plane(u64[3], u32[12], 128, 128), comp[:, :, 0])
    assert np.array_equal(plane(u64[4], u32[13], 64, 64), comp[::2, ::2, 1])
    assert np.array_equal(plane(u64[5], u32[14], 64, 64), comp[::2, ::2, 2])
