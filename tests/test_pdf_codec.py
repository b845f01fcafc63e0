"""From-scratch PDF codec: writer↔decoder round trip, operator coverage,
engine-chain dispatch, and the real-%PDF- fixture path."""

from __future__ import annotations

import zlib

import pytest

from pdf_parser_spark import pdf_codec, pdf_layout
from pdf_parser_spark.fixtures import page_row, statement_text


# ---------------------------------------------------------------------------
# writer → decoder → layout round trip (byte identity)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 3, 6, 16, 26, 36, 46])
def test_statement_roundtrip_byte_identical(doc_id):
    text = statement_text(doc_id)
    pdf = pdf_codec.write_pdf(text)
    assert pdf.startswith(b"%PDF-") and pdf.rstrip().endswith(b"%%EOF")
    assert pdf_codec.extract_text(pdf) == text


def test_multipage_roundtrip():
    text = "\n".join(f"row {i} of a long (multi) page\\statement" for i in range(150))
    pdf = pdf_codec.write_pdf(text)
    chars = pdf_codec.decode_pdf_chars(pdf)
    assert {c[0] for c in chars} == {0, 1, 2}  # 150 lines / 60 per page
    assert pdf_codec.extract_text(pdf) == text


def test_blank_lines_and_escapes_roundtrip():
    text = "first (parens) and \\slashes\\\n\n\nafter three blanks\ttab stays"
    # tabs are not expressible on the grid writer: normalize like fixtures do
    text = text.replace("\t", " ")
    assert pdf_codec.extract_text(pdf_codec.write_pdf(text)) == text


def test_uncompressed_stream_roundtrip():
    text = statement_text(1)
    pdf = pdf_codec.write_pdf(text, compress=False)
    assert b"/FlateDecode" not in pdf
    assert pdf_codec.extract_text(pdf) == text


def test_latin1_and_unicode_fallback():
    # Latin-1 chars survive via octal escapes; astral chars degrade to '?'
    text = "caf\xe9 r\xe9sum\xe9 ¥100"
    assert pdf_codec.extract_text(pdf_codec.write_pdf(text)) == text
    assert pdf_codec.extract_text(pdf_codec.write_pdf("emoji \U0001f600")) == "emoji ?"


# ---------------------------------------------------------------------------
# decoder generality: a hand-built "foreign" PDF using Td/TD/T*/'/TJ and an
# embedded /Widths array — operators our writer never emits
# ---------------------------------------------------------------------------


def _foreign_pdf() -> bytes:
    content = b"""BT
/F1 10 Tf
14 TL
0 780 Td
(first line) Tj
0 -14 Td
(second via Td) Tj
T*
(third via T-star) Tj
(fourth via quote) '
T*
[(fif) 10 (th via TJ)] TJ
ET"""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/FirstChar 32 /LastChar 122 /Widths [" +
            b" ".join(b"600" for _ in range(91)) + b"] >>"
        ),
        4: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 800 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    }
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref = len(buf)
    buf += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    return bytes(buf)


def test_foreign_pdf_text_operators():
    text = pdf_codec.extract_text(_foreign_pdf())
    lines = text.split("\n")
    assert lines[0] == "first line"
    assert lines[1] == "second via Td"
    assert lines[2] == "third via T-star"
    assert lines[3] == "fourth via quote"
    assert lines[4].startswith("fif") and lines[4].endswith("th via TJ")


def test_out_of_scope_inputs_raise():
    with pytest.raises(ValueError):
        pdf_codec.decode_pdf_chars(b"not a pdf at all")
    fake_encrypted = b"%PDF-1.4\ntrailer << /Encrypt 9 0 R >>"
    with pytest.raises(ValueError):
        pdf_codec.decode_pdf_chars(fake_encrypted)


# ---------------------------------------------------------------------------
# engine chain + fixture integration
# ---------------------------------------------------------------------------


def test_engine_chain_reaches_builtin():
    """pdfplumber/PyMuPDF are absent here: the chain must land on the
    builtin codec and still decode real %PDF- bytes."""
    text = statement_text(6)
    chars = pdf_layout.decode_pdf_chars(pdf_codec.write_pdf(text))
    assert pdf_layout.extract_layout_text(chars)[0] == text


def test_fixture_pdf_rows_carry_real_pdf_bytes():
    row = page_row(6)
    assert row["url"].endswith(".pdf")
    assert bytes(row["html"][:5]) == b"%PDF-"
    # the full extraction invariant for the real-PDF slice
    chars = pdf_layout.decode_pdf_chars(bytes(row["html"]))
    assert pdf_layout.extract_layout_text(chars)[0] == row["text"]
    # the text-bytes PDF slice is unchanged
    row5 = page_row(5)
    assert row5["url"].endswith(".pdf")
    assert bytes(row5["html"][:5]) != b"%PDF-"


def test_flate_streams_actually_compressed():
    pdf = pdf_codec.write_pdf(statement_text(0))
    assert b"/FlateDecode" in pdf
    # decoder really inflates: corrupting the stream must fail loudly
    i = pdf.find(b"stream\n") + len(b"stream\n")
    corrupted = pdf[:i] + b"\x00\x00" + pdf[i + 2 :]
    with pytest.raises(zlib.error):
        pdf_codec.decode_pdf_chars(corrupted)
