"""From-scratch baseline JPEG codec (pdf_parser_spark/jpeg_codec.py).

The encoder exists so the decoder is verifiable end-to-end in a container
with no imaging library: encode → decode → PSNR against the source array,
plus spec-conformance checks (zigzag/dequant ordering, restart markers,
refusal of progressive/12-bit streams) built from ITU-T T.81 itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parser_spark import jpeg_codec


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    if b.ndim == 3 and a.ndim == 2:
        b = b[:, :, 0]
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _hard_image(h=61, w=53, seed=7) -> np.ndarray:
    """8x8 blocks of random color + noise: exercises every AC category."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8), 3)).astype(float)
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- round trip


@pytest.mark.parametrize(
    "subsample,min_psnr", [(False, 35.0), (True, 32.0)]
)
def test_color_round_trip(subsample, min_psnr):
    img = _hard_image()
    data = jpeg_codec.encode_jpeg(img, quality=90, subsample=subsample)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = jpeg_codec.decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) >= min_psnr


def test_grayscale_round_trip():
    g = _hard_image()[:, :, 0]
    out = jpeg_codec.decode_jpeg(jpeg_codec.encode_jpeg(g, quality=85))
    assert out.shape == (*g.shape, 1)
    assert _psnr(g, out) >= 35.0


def test_q100_444_is_near_lossless_on_noise():
    """Regression for the zigzag-vs-natural dequant ordering bug: pure noise
    has energy in EVERY coefficient, so any coefficient/table misordering
    collapses PSNR to ~13 dB. At quality 100 + 4:4:4 the only loss is
    rounding, so the round trip must stay above 50 dB."""
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    out = jpeg_codec.decode_jpeg(
        jpeg_codec.encode_jpeg(noise, quality=100, subsample=False))
    assert _psnr(noise, out) >= 50.0


def test_constant_image_exact():
    c = np.full((16, 24, 3), 130, np.uint8)
    out = jpeg_codec.decode_jpeg(jpeg_codec.encode_jpeg(c, quality=75))
    assert np.array_equal(out, c)


@pytest.mark.parametrize("shape", [(1, 1, 3), (8, 8, 3), (9, 17, 3), (16, 16),
                                   (61, 53, 3), (7, 3)])
def test_odd_sizes(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for ss in (True, False):
        out = jpeg_codec.decode_jpeg(jpeg_codec.encode_jpeg(img, subsample=ss))
        assert out.shape[:2] == shape[:2]


def test_deterministic_bytes():
    img = _hard_image(24, 40)
    assert (jpeg_codec.encode_jpeg(img, quality=80)
            == jpeg_codec.encode_jpeg(img, quality=80))


def test_quality_monotone_size():
    img = _hard_image(48, 48)
    sizes = [len(jpeg_codec.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


# ---------------------------------------------------------------- restarts


@pytest.mark.parametrize("subsample", [True, False])
def test_restart_markers_round_trip(subsample):
    img = _hard_image(40, 72, seed=3)
    data = jpeg_codec.encode_jpeg(img, quality=90, subsample=subsample,
                                  restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    n_rst = sum(data.count(bytes((0xFF, 0xD0 + i))) for i in range(8))
    assert n_rst >= 1
    plain = jpeg_codec.decode_jpeg(
        jpeg_codec.encode_jpeg(img, quality=90, subsample=subsample))
    with_rst = jpeg_codec.decode_jpeg(data)
    # restarts change the byte stream, not the pixels
    assert np.array_equal(plain, with_rst)


def test_missing_restart_marker_raises():
    img = _hard_image(40, 72, seed=3)
    data = jpeg_codec.encode_jpeg(img, quality=90, restart_interval=1)
    first_rst = min(data.find(bytes((0xFF, 0xD0 + i)))
                    for i in range(8)
                    if data.find(bytes((0xFF, 0xD0 + i))) != -1)
    # strip one RST: the decoder must notice desynchronization, not
    # silently produce shifted blocks
    broken = data[:first_rst] + data[first_rst + 2:]
    with pytest.raises(ValueError):
        jpeg_codec.decode_jpeg(broken)


# ---------------------------------------------------------------- refusal


def test_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_codec.decode_jpeg(b"\x89PNG not a jpeg")


def test_rejects_malformed_progressive_scan_header():
    """Progressive is DECODED now (see test_progressive_*); a baseline
    stream merely relabeled SOF2 carries an Ss=0/Se=63 scan header that is
    illegal for progressive (T.81 B.2.3) and must refuse, not mis-decode."""
    data = bytearray(jpeg_codec.encode_jpeg(_hard_image(16, 16)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="scan header"):
        jpeg_codec.decode_jpeg(bytes(data))


def test_rejects_12_bit_precision():
    data = bytearray(jpeg_codec.encode_jpeg(_hard_image(16, 16)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 4] = 12  # precision byte inside SOF0
    with pytest.raises(ValueError, match="precision"):
        jpeg_codec.decode_jpeg(bytes(data))


def test_rejects_truncated_stream():
    data = jpeg_codec.encode_jpeg(_hard_image(32, 32), quality=95)
    with pytest.raises(ValueError):
        jpeg_codec.decode_jpeg(data[: len(data) // 2])


def test_rejects_bad_array():
    with pytest.raises(ValueError):
        jpeg_codec.encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        jpeg_codec.encode_jpeg(np.zeros((0, 4, 3), np.uint8))


# ---------------------------------------------------------------- headers


def test_dqt_is_written_in_zigzag_order():
    """T.81 B.2.4.1: DQT elements are in zigzag order on the wire. Verify
    the luma table round-trips through the header parse."""
    data = jpeg_codec.encode_jpeg(_hard_image(8, 8), quality=85)
    idx = data.find(b"\xff\xdb")
    (_seglen,) = struct.unpack(">H", data[idx + 2: idx + 4])
    wire = np.frombuffer(data[idx + 5: idx + 5 + 64], np.uint8)
    luma_q, _ = jpeg_codec._quality_tables(85)
    assert np.array_equal(wire, luma_q[jpeg_codec._ZIGZAG])


def test_sof_dimensions_match_input():
    img = _hard_image(37, 81)
    data = jpeg_codec.encode_jpeg(img)
    idx = data.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", data[idx + 5: idx + 9])
    assert (h, w) == (37, 81)


def test_progressive_round_trip_exact_vs_baseline():
    """A fully-refined progressive file (DC Al=1→0, AC bands Al=1→0)
    carries the SAME quantized coefficients as the baseline encoding, so
    the two decodes must be pixel-identical — this pins every progressive
    decode path (DC first/refine, AC first with EOBn runs, AC refinement
    correction bits) to the already-trusted baseline implementation."""
    rng = np.random.default_rng(11)
    shapes = [((48, 64, 3), True), ((40, 56, 3), False),
              ((33, 41, 1), False), ((17, 23, 3), True)]
    for shape, sub in shapes:
        img = rng.integers(0, 255, shape).astype(np.uint8)
        base = jpeg_codec.decode_jpeg(
            jpeg_codec.encode_jpeg(img, quality=85, subsample=sub))
        prog_bytes = jpeg_codec.encode_jpeg_progressive(
            img, quality=85, subsample=sub)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        prog = jpeg_codec.decode_jpeg(prog_bytes)
        assert np.array_equal(base, prog), (shape, sub)


def test_progressive_eob_runs_and_flat_content():
    """Smooth/flat images produce long EOBn runs (r > 0) and all-EOB AC
    scans — the band-run bookkeeping both directions must agree on."""
    flat = np.full((64, 64, 3), 130, np.uint8)
    grad = np.tile(
        np.linspace(0, 255, 64).astype(np.uint8)[None, :, None], (64, 1, 3))
    for img in (flat, grad):
        a = jpeg_codec.decode_jpeg(jpeg_codec.encode_jpeg(img, quality=60))
        b = jpeg_codec.decode_jpeg(
            jpeg_codec.encode_jpeg_progressive(img, quality=60))
        assert np.array_equal(a, b)


def test_progressive_truncation_fails_loudly():
    data = jpeg_codec.encode_jpeg_progressive(_hard_image(32, 32))
    with pytest.raises(ValueError):
        jpeg_codec.decode_jpeg(data[: len(data) // 3])
