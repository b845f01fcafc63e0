"""Raster OCR engine: rasterize → segment → classify → order, pixels only.

The writer grid makes OCR round-trips byte-identical; the template font's
pairwise Hamming distance makes per-glyph noise provably recoverable.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark import pdf_codec, raster
from pdf_parser_spark.fixtures import statement_text


def _multi_doc_text() -> str:
    return "\n".join(statement_text(i) for i in (0, 16, 26))


# ---------------------------------------------------------------------------
# font properties (the guarantees segmentation and classification rely on)
# ---------------------------------------------------------------------------


def test_glyph_font_invariants():
    glyphs = list(raster.GLYPHS.values())
    assert len(glyphs) == len(raster._CHARSET)
    for g in glyphs:
        assert g.shape == (raster.GLYPH_H, raster.GLYPH_W)
        assert g.any(axis=0).all() and g.any(axis=1).all()  # no blank row/col
        assert not raster._has_isolated_pixel(g)  # despeckle-proof
    for i in range(0, len(glyphs), 17):  # sampled pairs (full check at import)
        for j in range(i + 1, len(glyphs)):
            assert (glyphs[i] ^ glyphs[j]).sum() >= raster.MIN_GLYPH_DISTANCE


def test_despeckle_removes_isolated_keeps_glyphs():
    img = raster.rasterize_boxes([("A", 60, 60, 65, 67.5)])
    lone = img.copy()
    lone[5, 5] = True      # isolated speck far from any ink
    out = raster.despeckle(lone)
    assert not out[5, 5]
    assert (out == img).all()  # every glyph pixel has a neighbor → survives


# ---------------------------------------------------------------------------
# byte-identical round trips (writer grid)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("writer", [pdf_codec.write_pdf, pdf_codec.write_pdf_type0])
def test_ocr_roundtrip_byte_identical(writer):
    text = _multi_doc_text()
    imgs = raster.rasterize_pdf(writer(text))
    assert raster.images_to_text(imgs) == text


def test_ocr_roundtrip_multipage_with_blank_lines():
    text = "\n".join(
        ["top line", "", "", "after two blanks"]
        + [f"filler row {i}" for i in range(70)]
    )
    imgs = raster.rasterize_pdf(pdf_codec.write_pdf(text))
    assert len(imgs) == 2
    assert raster.images_to_text(imgs) == text


def test_word_dicts_ordered_by_top_then_left():
    """F5 — the image_to_data-shaped output the reference sorts on."""
    imgs = raster.rasterize_pdf(pdf_codec.write_pdf("alpha beta\ngamma"))
    words = raster.ocr_image(imgs[0])
    assert [w["text"] for w in words] == ["alpha", "beta", "gamma"]
    keys = [(w["top"], w["left"]) for w in words]
    assert keys == sorted(keys)
    assert all(set(w) == {"text", "left", "top", "conf"} for w in words)
    assert all(w["conf"] == 1.0 for w in words)  # clean raster: exact match


# ---------------------------------------------------------------------------
# noise tolerance
# ---------------------------------------------------------------------------


def test_in_glyph_noise_provably_recovered():
    """<= (MIN_GLYPH_DISTANCE-1)//2 flips inside EVERY glyph cell: nearest-
    template classification must still be exact (the distance argument)."""
    text = _multi_doc_text().split("\n")[:30]
    text = "\n".join(text)
    pdf = pdf_codec.write_pdf(text)
    chars = pdf_codec.decode_pdf_chars(pdf)
    img = raster.rasterize_boxes([(c[1], c[2], c[3], c[4], c[5]) for c in chars])
    rng = np.random.RandomState(42)
    noisy = img.copy()
    H = img.shape[0]
    k = (raster.MIN_GLYPH_DISTANCE - 1) // 2 - 1  # strictly recoverable
    for _page, _ch, x0, y0, _x1, _y1 in chars:
        x, y = int(round(x0)), int(round(y0))
        r1 = H - 1 - y
        for _ in range(k):
            noisy[rng.randint(r1 - 6, r1 + 1), rng.randint(x, x + 5)] ^= True
    assert raster.images_to_text([noisy]) == raster.images_to_text([img]) == text


def test_salt_and_pepper_noise_recovered():
    """0.1% uniform salt-and-pepper over the full page: despeckle + band
    refinement + shift-tolerant classification recover the exact text."""
    text = _multi_doc_text()
    imgs = raster.rasterize_pdf(pdf_codec.write_pdf(text))
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        noisy = [img ^ (rng.rand(*img.shape) < 0.001) for img in imgs]
        assert raster.images_to_text(noisy) == text, f"seed {seed}"


# ---------------------------------------------------------------------------
# engine integration (ocr_fallback drives raster OCR for %PDF- payloads)
# ---------------------------------------------------------------------------


def test_builtin_engine_matches_text_layer_parse():
    from pdf_parser_spark import extraction_core as core
    from pdf_parser_spark.operators.ocr_fallback import _builtin_raster_ocr

    text = statement_text(6)
    ocr_text = _builtin_raster_ocr(pdf_codec.write_pdf_type0(text))
    assert ocr_text == text
    assert core.parse_amex_text(ocr_text) == core.parse_amex_text(text)
