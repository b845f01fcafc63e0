"""pdfminer-style layout analysis tests — synthesize→extract round-trips."""

from __future__ import annotations

import pytest

from pdf_parser_spark import fixtures
from pdf_parser_spark.pdf_layout import (
    decode_pdf_chars,
    detect_columns,
    extract_layout_text,
    group_chars_to_lines,
    group_lines_to_blocks,
    reading_order,
    synthesize_char_boxes,
)


def test_single_column_round_trip_fixture_corpus():
    for doc_id in range(0, 120):
        text = fixtures.statement_text(doc_id)
        chars = synthesize_char_boxes(text)
        out, spans = extract_layout_text(chars)
        assert out == text, f"doc {doc_id} layout round-trip failed"


def test_two_column_round_trip():
    text = "\n".join(f"line number {i} of the column test" for i in range(20))
    chars = synthesize_char_boxes(text, two_column=True)
    out, _ = extract_layout_text(chars)
    assert out == text


def test_multi_space_and_indent_preserved():
    text = "col1  col2   col3\n  indented line\nplain line"
    out, _ = extract_layout_text(synthesize_char_boxes(text))
    assert out == text


def test_blank_lines_reconstructed():
    text = "first\n\n\nfourth line here"
    out, _ = extract_layout_text(synthesize_char_boxes(text))
    assert out == text


def test_multi_page_round_trip():
    text = "\n".join(f"row {i:04d} content" for i in range(150))  # 3 pages
    chars = synthesize_char_boxes(text)
    assert max(c[0] for c in chars) == 2
    out, _ = extract_layout_text(chars)
    assert out == text


def test_reading_order_two_columns():
    text = "\n".join(f"L{i}" for i in range(10))
    chars = synthesize_char_boxes(text, two_column=True)
    lines = reading_order(group_chars_to_lines(chars))
    assert [ln.text for ln in lines] == [f"L{i}" for i in range(10)]
    assert detect_columns(lines)  # split detected on page 0


def test_table_region_detection():
    text = (
        "DATE        DESCRIPTION        AMOUNT\n"
        "01/05/2024  COFFEE             4.50\n"
        "01/06/2024  BOOKS              12.00"
    )
    lines = reading_order(group_chars_to_lines(synthesize_char_boxes(text)))
    blocks = group_lines_to_blocks(lines)
    assert any(b.region == "table" for b in blocks)


def test_prose_not_table():
    text = (
        "This is an ordinary paragraph of text\n"
        "with no aligned columns at all in it\n"
        "just flowing prose across the lines"
    )
    lines = reading_order(group_chars_to_lines(synthesize_char_boxes(text)))
    blocks = group_lines_to_blocks(lines)
    assert all(b.region == "text" for b in blocks)


def test_block_spans_metadata():
    text = fixtures.statement_text(0)
    out, spans = extract_layout_text(synthesize_char_boxes(text))
    assert spans
    assert all(s["region"] in ("text", "table") for s in spans)
    assert all(s["n_lines"] >= 1 for s in spans)


def test_decode_pdf_chars_engine_chain():
    # undecodable input exhausts the engine chain (pdfplumber → PyMuPDF →
    # builtin codec) and surfaces as NotImplementedError for the extract
    # stage's parse_failed accounting
    with pytest.raises(NotImplementedError):
        decode_pdf_chars(b"%PDF-1.4 no objects at all")
    # real bytes decode through the builtin engine
    from pdf_parser_spark.pdf_codec import write_pdf

    boxes = decode_pdf_chars(write_pdf("hello real pdf"))
    assert boxes and extract_layout_text(boxes)[0] == "hello real pdf"


def test_empty_chars():
    assert extract_layout_text([]) == ("", [])


def _importable(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(not _importable("pdfplumber"), reason="pdfplumber not installed")
def test_pdfplumber_engine_branch():
    """Exercise the PREFERRED engine when present (absent in this container,
    so this is a marker against branch rot in richer environments): the
    pdfplumber decode of a builtin-written PDF must layout to the same text
    as the builtin codec's decode."""
    from pdf_parser_spark.pdf_codec import write_pdf
    from pdf_parser_spark.pdf_layout import _decode_pdfplumber

    pdf = write_pdf("engine parity line")
    boxes = _decode_pdfplumber(pdf)
    assert extract_layout_text(boxes)[0] == "engine parity line"


@pytest.mark.skipif(not _importable("fitz"), reason="PyMuPDF not installed")
def test_pymupdf_engine_branch():
    from pdf_parser_spark.pdf_codec import write_pdf
    from pdf_parser_spark.pdf_layout import _decode_pymupdf

    pdf = write_pdf("engine parity line")
    boxes = _decode_pymupdf(pdf)
    assert extract_layout_text(boxes)[0] == "engine parity line"


@pytest.mark.skipif(
    not (_importable("pytesseract") and _importable("pdf2image")),
    reason="pytesseract/pdf2image not installed",
)
def test_tesseract_ocr_branch():
    """The reference's exact OCR stack, when importable: raster a
    builtin-written PDF and assert the recognized words come back."""
    from pdf_parser_spark.operators.ocr_fallback import _tesseract_ocr
    from pdf_parser_spark.pdf_codec import write_pdf

    text = _tesseract_ocr(write_pdf("HELLO OCR"))
    assert "HELLO" in text.upper()
