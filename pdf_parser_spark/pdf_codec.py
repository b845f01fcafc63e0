"""Minimal from-scratch PDF text codec (pure stdlib, deterministic).

The reference's core loop opens real PDF bytes and extracts per-char boxes
through pdfplumber/PyMuPDF (/root/reference/universal_parser.py:19-23,
strategies/base_parser.py:7-12). Neither library ships in this container, so
this module implements the public-knowledge subset needed to make the
`%PDF-` path REAL instead of environment-gated:

- ``write_pdf(text)`` — a tiny PDF writer (xref table, catalog/pages tree,
  Courier text objects, FlateDecode content streams) that lays text on the
  same deterministic grid as ``pdf_layout.synthesize_char_boxes`` (6pt
  advance, 12pt leading, 60 lines/page), so written→decoded→layout
  round-trips byte-identically.
- ``decode_pdf_chars(pdf_bytes)`` — a real mini PDF parser: scans indirect
  objects, resolves the page tree from the trailer, FlateDecodes content
  streams with stdlib zlib, and interprets the text operators
  (BT/ET, Tf, Td, TD, TL, Tm, T*, Tj, TJ, ', ") with per-glyph advances
  from standard-font metrics (or an embedded /Widths array), emitting the
  ``(page, ch, x0, y0, x1, y1)`` char boxes the layout pass consumes.

Everything here follows the published PDF 1.x format (ISO 32000 subset):
object syntax, name/string/array/dict lexing, stream extents via /Length,
text-state matrices. No reference code is involved — the reference delegates
this entirely to third-party libraries.

Scope (documented, asserted by tests): simple fonts with 1-byte codes
(Latin-1 text) AND Type0 composite fonts with Identity-H/V encodings —
2-byte CIDs, CIDFontType2 descendants with /DW + /W widths, ToUnicode CMap
decode (bfchar + both bfrange forms) — which covers the common shape real
statement generators emit (``write_pdf_type0`` produces it for tests).
FlateDecode or raw streams, with or without PNG predictors
(/DecodeParms /Predictor 10-15); BOTH classic xref tables AND the modern
PDF 1.5 layout — /Type /ObjStm object streams are expanded (most real-web
PDFs pack their catalog/page tree this way) and cross-reference streams
are tolerated (the decoder does not need any xref — it scans objects
directly, which also survives mildly corrupt files; ``write_pdf_objstm``
emits the modern layout for round-trip tests). Type0 fonts with
embedded-CMap encodings and encrypted files remain out of scope and raise
ValueError so the extract stage records parse_failed honestly.
"""

from __future__ import annotations

import re
import zlib

# Writer grid — identical to pdf_layout's synthesis constants.
FONT_SIZE = 10.0
CHAR_W = 6.0          # Courier: 600/1000 em * 10pt
LINE_H = 12.0
PAGE_TOP = 780.0
LINES_PER_PAGE = 60
PAGE_W, PAGE_H = 800, 792

# Standard-14 metric subset: Courier is fixed-pitch 600; the fallback for
# other base fonts without /Widths is 500 (the common average — only used
# for foreign PDFs, never by our writer/decoder round trip).
_FIXED_WIDTHS = {"Courier": 600, "Courier-Bold": 600, "Courier-Oblique": 600,
                 "Courier-BoldOblique": 600}
_DEFAULT_WIDTH = 500


# ===========================================================================
# writer
# ===========================================================================


def _escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for ch in s:
        o = ord(ch)
        if ch in "()\\":
            out += b"\\" + ch.encode("latin-1")
        elif 32 <= o <= 126:
            out += ch.encode("latin-1")
        elif o <= 255:
            out += b"\\%03o" % o
        else:
            out += b"?"  # non-Latin-1: simple fonts cannot encode it
    return bytes(out)


def write_pdf(text: str, compress: bool = True) -> bytes:
    """text → real PDF bytes, one Tj per line on the deterministic grid."""
    src_lines = text.split("\n")
    pages = [
        src_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(src_lines), LINES_PER_PAGE)
    ] or [[]]

    objects: dict[int, bytes] = {}
    font_num = 3
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )
    page_nums: list[int] = []
    next_num = 4
    for page_lines in pages:
        ops = [b"BT", b"/F1 %.1f Tf" % FONT_SIZE]
        for row, line in enumerate(page_lines):
            if not line:
                continue  # blank lines carry no glyphs; layout re-infers them
            y = PAGE_TOP - row * LINE_H
            ops.append(b"1 0 0 1 0 %.1f Tm" % y)
            ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        content_num = next_num
        objects[content_num] = (
            b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
            + content
            + b"\nendstream"
        )
        page_num = next_num + 1
        objects[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, font_num, content_num)
        )
        page_nums.append(page_num)
        next_num += 2

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    return _assemble_pdf(objects)


def _assemble_pdf(objects: dict[int, bytes]) -> bytes:
    """Serialize numbered object bodies into a full file (header, xref, trailer)."""
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_pos = len(buf)
    max_num = max(objects)
    buf += b"xref\n0 %d\n" % (max_num + 1)
    buf += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_pos)
    )
    return bytes(buf)


def _png_predict_up(data: bytes, columns: int) -> bytes:
    """Apply the PNG Up row filter (type 2) — the inverse of
    _png_unpredict's Up branch; used by the ObjStm/XRef writer so the
    reader's predictor path is exercised by a genuine round trip."""
    out = bytearray()
    prev = bytes(columns)
    for i in range(0, len(data), columns):
        row = data[i : i + columns]
        out += bytes([2]) + bytes(
            (row[j] - prev[j]) & 0xFF for j in range(len(row))
        )
        prev = row
    return bytes(out)


def write_pdf_objstm(text: str) -> bytes:
    """text → PDF 1.5 bytes in the MODERN layout real-web PDFs use: the
    catalog, page tree, page dicts and font are packed into a compressed
    ``/Type /ObjStm`` object stream (with a PNG-Up ``/Predictor 12``,
    exercising the DecodeParms path), content streams stay direct, and the
    file ends in a cross-reference STREAM (``/Type /XRef``, ``/W [1 4 2]``,
    type-2 entries pointing into the ObjStm) instead of a classic xref
    table + trailer. Geometry and text layout are identical to write_pdf,
    so written→decoded→layout round-trips byte-identically through the
    object-stream expansion path (ISO 32000-1 §7.5.7/§7.5.8)."""
    src_lines = text.split("\n")
    pages = [
        src_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(src_lines), LINES_PER_PAGE)
    ] or [[]]

    direct: dict[int, bytes] = {}  # content streams: stay their own objects
    packed: dict[int, bytes] = {3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"}
    page_nums: list[int] = []
    next_num = 4
    for page_lines in pages:
        ops = [b"BT", b"/F1 %.1f Tf" % FONT_SIZE]
        for row, line in enumerate(page_lines):
            if not line:
                continue
            y = PAGE_TOP - row * LINE_H
            ops.append(b"1 0 0 1 0 %.1f Tm" % y)
            ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        content = zlib.compress(b"\n".join(ops))
        content_num = next_num
        direct[content_num] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
            + content
            + b"\nendstream"
        )
        page_num = next_num + 1
        packed[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, content_num)
        )
        page_nums.append(page_num)
        next_num += 2
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    packed[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    packed[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))

    # -- the object stream: "num offset" header pairs, then the bodies
    objstm_num, xref_num = next_num, next_num + 1
    nums = sorted(packed)
    offs, acc = [], 0
    for n in nums:
        offs.append(acc)
        acc += len(packed[n]) + 1  # "\n" joiner
    header = b" ".join(b"%d %d" % (n, o) for n, o in zip(nums, offs)) + b"\n"
    stm = header + b"\n".join(packed[n] for n in nums)
    cols = 16
    if len(stm) % cols:
        stm += b"\n" * (cols - len(stm) % cols)  # row-align for the predictor
    raw = zlib.compress(_png_predict_up(stm, cols))
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns %d >> >>\nstream\n"
        % (len(nums), len(header), len(raw), cols)
        + raw
        + b"\nendstream"
    )

    # -- file assembly + cross-reference stream (no classic trailer)
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(direct):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + direct[num] + b"\nendobj\n"
    offsets[objstm_num] = len(buf)
    buf += b"%d 0 obj\n" % objstm_num + objstm_body + b"\nendobj\n"

    xref_pos = len(buf)
    size = xref_num + 1
    entries = []
    for num in range(size):
        if num == 0:
            entries.append((0, 0, 65535))
        elif num in offsets:
            entries.append((1, offsets[num], 0))
        elif num in packed:
            entries.append((2, objstm_num, nums.index(num)))
        elif num == xref_num:
            entries.append((1, xref_pos, 0))
        else:
            entries.append((0, 0, 0))
    rows = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in entries
    )
    xref_raw = zlib.compress(_png_predict_up(rows, 7))
    buf += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /Root 1 0 R /W [1 4 2]"
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>"
        b" /Length %d >>\nstream\n" % (xref_num, size, len(xref_raw))
        + xref_raw
        + b"\nendstream\nendobj\n"
    )
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(buf)


def write_pdf_type0(text: str, compress: bool = True) -> bytes:
    """text → PDF bytes using a Type0 (composite) font with Identity-H codes.

    Covers the composite-font shape real statement generators emit, which
    the simple-font writer cannot: a /Type0 font whose /Encoding is
    Identity-H, a CIDFontType2 descendant with /CIDToGIDMap /Identity and a
    /W width array, 2-byte character codes in the content streams, and a
    /ToUnicode CMap mapping CIDs back to text. CIDs are assigned by first
    appearance in the document (NOT Unicode code points), so decoding
    genuinely exercises the CMap — an identity shortcut would scramble the
    text. Geometry matches the simple writer's grid (every CID width 600 →
    6pt advance at 10pt), so layout round-trips identically.
    """
    src_lines = text.split("\n")
    pages = [
        src_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(src_lines), LINES_PER_PAGE)
    ] or [[]]

    # glyph table: CID = order of first appearance (0 = notdef, unused)
    cid_of: dict[str, int] = {}
    for line in src_lines:
        for ch in line:
            if ch not in cid_of:
                cid_of[ch] = len(cid_of) + 1

    # ToUnicode CMap (public CMap syntax: bfchar blocks of <=100 entries)
    bf_entries = [
        b"<%04x> <%s>" % (cid, ch.encode("utf-16-be").hex().encode("ascii"))
        for ch, cid in sorted(cid_of.items(), key=lambda kv: kv[1])
    ]
    blocks = []
    for i in range(0, len(bf_entries), 100):
        chunk = bf_entries[i : i + 100]
        blocks.append(
            b"%d beginbfchar\n" % len(chunk)
            + b"\n".join(chunk)
            + b"\nendbfchar"
        )
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        + b"\n".join(blocks)
        + b"\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    )

    objects: dict[int, bytes] = {}
    font_num, desc_num, tounicode_num = 3, 4, 5
    objects[tounicode_num] = (
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
    )
    n_cids = len(cid_of) + 1
    objects[desc_num] = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftMono "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 1000 /W [1 %d 600] /CIDToGIDMap /Identity >>"
        % max(n_cids - 1, 1)
    )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /GraftMono "
        b"/Encoding /Identity-H /DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>"
        % (desc_num, tounicode_num)
    )

    page_nums: list[int] = []
    next_num = 6
    for page_lines in pages:
        ops = [b"BT", b"/F1 %.1f Tf" % FONT_SIZE]
        for row, line in enumerate(page_lines):
            if not line:
                continue
            y = PAGE_TOP - row * LINE_H
            ops.append(b"1 0 0 1 0 %.1f Tm" % y)
            codes = b"".join(b"%04x" % cid_of[ch] for ch in line)
            ops.append(b"<" + codes + b"> Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        content_num = next_num
        objects[content_num] = (
            b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
            + content
            + b"\nendstream"
        )
        page_num = next_num + 1
        objects[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, font_num, content_num)
        )
        page_nums.append(page_num)
        next_num += 2

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    return _assemble_pdf(objects)


# ===========================================================================
# object / token parsing
# ===========================================================================

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# Lexer scan patterns — the character classes mirror _WS/_DELIM exactly;
# regex matches replace byte-at-a-time Python loops in the token hot path.
_WS_COMMENT_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_NUM_RE = re.compile(rb"[+\-.0-9]+")
_REGULAR_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")


class _Lexer:
    """Token stream over PDF syntax (shared by object and content parsing)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        m = _WS_COMMENT_RE.match(self.data, self.pos)
        if m:
            self.pos = m.end()

    def next_token(self):
        """→ ('num', float) | ('name', str) | ('str', bytes) | ('op', str)
        | ('dict_open'/'dict_close'/'arr_open'/'arr_close', None) | None."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x2F:  # /Name
            self.pos += 1
            raw = _REGULAR_RE.match(d, self.pos).group()
            self.pos += len(raw)
            name = re.sub(
                rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
            )
            return ("name", name.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("str", self._read_literal_string())
        if d.startswith(b"<<", self.pos):
            self.pos += 2
            return ("dict_open", None)
        if c == 0x3C:  # < hex string
            return ("str", self._read_hex_string())
        if d.startswith(b">>", self.pos):
            self.pos += 2
            return ("dict_close", None)
        if c == 0x5B:
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:
            self.pos += 1
            return ("arr_close", None)
        if c in b"+-.0123456789":
            raw = _NUM_RE.match(d, self.pos).group()
            self.pos += len(raw)
            try:
                return ("num", float(raw))
            except ValueError:
                return ("num", 0.0)
        # operator / keyword
        start = self.pos
        self.pos = _REGULAR_RE.match(d, self.pos).end()
        if self.pos == start:  # stray delimiter ({ } etc.) — consume it
            self.pos += 1
            return ("op", chr(c))
        return ("op", d[start : self.pos].decode("latin-1"))

    def _read_literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    self.pos += 1
                elif e in b"01234567":  # up to 3 octal digits
                    oct_digits = bytearray()
                    while self.pos < n and len(oct_digits) < 3 and d[self.pos] in b"01234567":
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _read_hex_string(self) -> bytes:
        d = self.data
        end = d.find(b">", self.pos)
        if end == -1:
            end = len(d)
        hex_digits = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos + 1 : end])
        if len(hex_digits) % 2:
            hex_digits += b"0"
        self.pos = end + 1
        return bytes.fromhex(hex_digits.decode("ascii"))


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(lex: _Lexer, tok=None):
    """One PDF value (dict/array/name/number/string/ref/bool/null)."""
    if tok is None:
        tok = lex.next_token()
    if tok is None:
        return None
    kind, val = tok
    if kind == "dict_open":
        d = {}
        while True:
            k = lex.next_token()
            if k is None or k[0] == "dict_close":
                return d
            if k[0] != "name":
                continue  # malformed key: skip
            d[k[1]] = _parse_value(lex)
    if kind == "arr_open":
        arr = []
        while True:
            t = lex.next_token()
            if t is None or t[0] == "arr_close":
                return arr
            arr.append(_parse_value(lex, t))
    if kind == "num":
        # look ahead for "<gen> R" (indirect reference)
        save = lex.pos
        t2 = lex.next_token()
        if t2 and t2[0] == "num":
            t3 = lex.next_token()
            if t3 == ("op", "R"):
                return _Ref(int(val))
        lex.pos = save
        return val
    if kind == "op":
        if val == "true":
            return True
        if val == "false":
            return False
        if val == "null":
            return None
        return ("__op__", val)
    return val  # name / str


class _Document:
    """Object store + reference resolution for one PDF file."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF: missing %PDF- header")
        if b"/Encrypt" in data:
            raise ValueError("encrypted PDFs are out of scope")
        self.data = data
        self.objects: dict[int, tuple] = {}  # num -> (value, stream|None)
        self._scan_objects()

    def _scan_objects(self) -> None:
        data = self.data
        # an `N 0 obj` byte pattern occurring INSIDE a stream body is data,
        # not an object header — matches falling inside the extent of a
        # previously parsed stream are skipped so they can't clobber a real
        # object with the same number
        skip_until = 0
        for m in _OBJ_RE.finditer(data):
            if m.start() < skip_until:
                continue
            num = int(m.group(1))
            lex = _Lexer(data, m.end())
            value = _parse_value(lex)
            stream = None
            lex._skip_ws()
            if data.startswith(b"stream", lex.pos):
                start = lex.pos + len(b"stream")
                if data.startswith(b"\r\n", start):
                    start += 2
                elif data.startswith(b"\n", start) or data.startswith(b"\r", start):
                    start += 1
                length = None
                if isinstance(value, dict):
                    length = value.get("Length")
                exact = False
                if isinstance(length, (int, float)):
                    end = start + int(length)
                    exact = data[end : end + 20].lstrip(bytes(_WS)).startswith(
                        b"endstream"
                    )
                if not exact:  # indirect/missing/wrong /Length: locate marker
                    end = data.find(b"endstream", start)
                    if end == -1:
                        end = len(data)
                stream = data[start:end]
                if not exact:
                    # only trim the EOL that precedes the marker — never
                    # trim an exact-/Length extent (binary streams may END
                    # in 0x0a/0x0d bytes that belong to the data)
                    stream = stream.rstrip(b"\r\n")
                skip_until = end
            self.objects[num] = (value, stream)
        self._expand_object_streams()

    def _expand_object_streams(self) -> None:
        """PDF 1.5 object streams (ISO 32000-1 §7.5.7): most real-web PDFs
        pack their non-stream objects (catalog, page tree, fonts) into
        compressed ``/Type /ObjStm`` containers — the direct ``N 0 obj``
        scan sees only the container. Expand each one: decode its stream,
        read the /N (objnum, offset) integer pairs, parse each object at
        /First + offset. Objects found by the direct scan win a number
        collision (without generation-aware xref chasing there is no
        ordering between a direct object and a packed one; collisions only
        arise in incrementally-updated files). Runs to a fixpoint so an
        ObjStm whose /Filter or /N is itself packed still expands."""
        expanded: set[int] = set()
        for _ in range(8):  # fixpoint bound: nesting deeper than this is
            added = 0       # not a real document, it is a bomb
            for num in list(self.objects):
                value, stream = self.objects[num]
                if (
                    num in expanded
                    or not isinstance(value, dict)
                    or value.get("Type") != "ObjStm"
                    or stream is None
                ):
                    continue
                try:
                    filt = self.resolve(value.get("Filter"))
                    parms = self.resolve(value.get("DecodeParms"))
                    if isinstance(parms, list):
                        parms = [self.resolve(p) for p in parms]
                    body = _apply_filters(stream, filt, parms)
                    n = int(self.resolve(value.get("N")) or 0)
                    first = int(self.resolve(value.get("First")) or 0)
                except (ValueError, TypeError, zlib.error):
                    expanded.add(num)  # undecodable: skip, don't loop
                    continue
                lex = _Lexer(body, 0)
                pairs = []
                ok = True
                for _i in range(n):
                    t1, t2 = lex.next_token(), lex.next_token()
                    if not (t1 and t2 and t1[0] == "num" and t2[0] == "num"):
                        ok = False
                        break
                    pairs.append((int(t1[1]), int(t2[1])))
                if ok:
                    for onum, ooff in pairs:
                        if onum in self.objects:
                            continue  # direct scan wins (see docstring)
                        val = _parse_value(_Lexer(body, first + ooff))
                        # spec: objects inside an object stream carry no
                        # stream of their own
                        self.objects[onum] = (val, None)
                        added += 1
                expanded.add(num)
            if not added:
                break

    def resolve(self, v):
        seen = set()
        while isinstance(v, _Ref):
            if v.num in seen or v.num not in self.objects:
                return None
            seen.add(v.num)
            v = self.objects[v.num][0]
        return v

    def stream_of(self, ref) -> bytes | None:
        v = ref
        while isinstance(v, _Ref):
            if v.num not in self.objects:
                return None
            value, stream = self.objects[v.num]
            if stream is not None:
                filt = parms = None
                if isinstance(value, dict):
                    filt = self.resolve(value.get("Filter"))
                    parms = self.resolve(value.get("DecodeParms"))
                    if isinstance(parms, list):
                        parms = [self.resolve(p) for p in parms]
                return _apply_filters(stream, filt, parms)
            v = value
        return None

    def root(self) -> dict | None:
        m = None
        for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", self.data):
            pass
        if m:
            return self.resolve(_Ref(int(m.group(1))))
        # fallback: any /Type /Catalog object
        for num, (value, _s) in self.objects.items():
            if isinstance(value, dict) and value.get("Type") == "Catalog":
                return value
        return None

    def pages(self) -> list[dict]:
        """Page dicts in document order (walk the /Kids tree)."""
        root = self.root()
        out: list[dict] = []
        if root:
            node = self.resolve(root.get("Pages"))
            self._walk_pages(node, out, depth=0)
        if not out:  # damaged tree: fall back to object-order /Type /Page
            for num in sorted(self.objects):
                value = self.objects[num][0]
                if isinstance(value, dict) and value.get("Type") == "Page":
                    out.append(value)
        return out

    def _walk_pages(self, node, out: list[dict], depth: int) -> None:
        if not isinstance(node, dict) or depth > 64:
            return
        if node.get("Type") == "Page":
            out.append(node)
            return
        for kid in self.resolve(node.get("Kids")) or []:
            self._walk_pages(self.resolve(kid), out, depth + 1)


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Undo PNG row predictors (ISO 32000-1 §7.4.4.4 delegates to the PNG
    spec): each row is prefixed by a filter-type byte. Used by FlateDecode
    streams carrying /DecodeParms /Predictor >= 10 — the layout most
    writers emit for cross-reference and object streams."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(rowlen)
    pos = 0
    while pos + 1 <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor row filter {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _apply_filters(stream: bytes, filt, parms=None) -> bytes:
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    parm_list = parms if isinstance(parms, list) else [parms] * len(filters)
    out = stream
    for i, f in enumerate(filters):
        name = f if isinstance(f, str) else None
        if name == "FlateDecode":
            out = zlib.decompress(out)
            p = parm_list[i] if i < len(parm_list) else None
            if isinstance(p, dict):
                pred = int(p.get("Predictor", 1) or 1)
                if pred >= 10:
                    out = _png_unpredict(
                        out,
                        int(p.get("Columns", 1) or 1),
                        int(p.get("Colors", 1) or 1),
                        int(p.get("BitsPerComponent", 8) or 8),
                    )
                elif pred == 2:
                    raise ValueError("TIFF predictor 2 is out of scope")
        elif name is None:
            continue
        else:
            raise ValueError(f"unsupported stream filter {name}")
    return out


# ===========================================================================
# content-stream text interpreter
# ===========================================================================


def _utf16be_hex_to_str(hexdigits: bytes) -> str:
    raw = bytes.fromhex(hexdigits.decode("ascii"))
    if len(raw) % 2:
        raw = raw[:-1]
    return raw.decode("utf-16-be", errors="replace")


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """ToUnicode CMap → {cid: text} (bfchar + both bfrange forms).

    Public CMap syntax (ISO 32000 §9.10.3): `bfchar` pairs <src> <dst>;
    `bfrange` rows either <lo> <hi> <dstBase> (consecutive UTF-16 values,
    last code unit incremented) or <lo> <hi> [<dst0> <dst1> ...]."""
    out: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            out[int(src, 16)] = _utf16be_hex_to_str(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])",
            m.group(1),
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if hi_i - lo_i > 0xFFFF:  # malformed: refuse absurd expansion
                continue
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for k, dhex in enumerate(dsts[: hi_i - lo_i + 1]):
                    out[lo_i + k] = _utf16be_hex_to_str(dhex)
            else:
                base_raw = bytearray.fromhex(dst[1:-1].decode("ascii"))
                if len(base_raw) % 2:
                    continue
                base_last = int.from_bytes(base_raw[-2:], "big")
                prefix = bytes(base_raw[:-2])
                for k in range(hi_i - lo_i + 1):
                    unit = (base_last + k).to_bytes(2, "big")
                    out[lo_i + k] = (prefix + unit).decode(
                        "utf-16-be", errors="replace"
                    )
    return out


def _parse_cid_widths(doc: _Document, w: list) -> dict[int, float]:
    """CIDFont /W array → {cid: width}; rows are `c [w...]` or `c1 c2 w`."""
    out: dict[int, float] = {}
    i = 0
    while i < len(w):
        first = doc.resolve(w[i])
        if not isinstance(first, (int, float)):
            break
        nxt = doc.resolve(w[i + 1]) if i + 1 < len(w) else None
        if isinstance(nxt, list):
            for k, x in enumerate(nxt):
                x = doc.resolve(x)
                if isinstance(x, (int, float)):
                    out[int(first) + k] = float(x)
            i += 2
        elif i + 2 < len(w):
            last, width = nxt, doc.resolve(w[i + 2])
            if isinstance(last, (int, float)) and isinstance(width, (int, float)):
                span = min(int(last), int(first) + 0xFFFF)  # bound malformed rows
                for c in range(int(first), span + 1):
                    out[c] = float(width)
            i += 3
        else:
            break
    return out


class _Font:
    def __init__(self, doc: _Document, font_dict: dict | None):
        self.widths: list[float] | None = None
        self.first_char = 0
        self.fixed = _DEFAULT_WIDTH
        self.type0 = False
        self.to_unicode: dict[int, str] | None = None
        self.cid_widths: dict[int, float] | None = None
        self.default_width = 1000.0
        self._simple_table: list[tuple] | None = None  # lazy decode_adv cache
        if isinstance(font_dict, dict):
            if font_dict.get("Subtype") == "Type0":
                self._init_type0(doc, font_dict)
                return
            base = font_dict.get("BaseFont")
            if isinstance(base, str):
                base = base.split("+")[-1]  # strip subset tag
                self.fixed = _FIXED_WIDTHS.get(base, _DEFAULT_WIDTH)
            w = doc.resolve(font_dict.get("Widths"))
            fc = doc.resolve(font_dict.get("FirstChar"))
            if isinstance(w, list) and isinstance(fc, (int, float)):
                self.widths = [float(doc.resolve(x) or 0) for x in w]
                self.first_char = int(fc)

    def _init_type0(self, doc: _Document, font_dict: dict) -> None:
        """Composite font: Identity-H 2-byte codes, CID widths, ToUnicode.

        Identity-H/V with a CIDFontType2 descendant covers most real
        statement generators (the common Identity-H + /CIDToGIDMap
        /Identity shape); embedded-CMap encodings stay out of scope and
        raise so the extract stage records parse_failed honestly."""
        enc = doc.resolve(font_dict.get("Encoding"))
        if enc not in ("Identity-H", "Identity-V"):
            raise ValueError(
                f"Type0 font with non-Identity encoding {enc!r} is out of scope"
            )
        self.type0 = True
        desc = doc.resolve(font_dict.get("DescendantFonts")) or []
        d0 = doc.resolve(desc[0]) if desc else None
        if isinstance(d0, dict):
            dw = doc.resolve(d0.get("DW"))
            if isinstance(dw, (int, float)):
                self.default_width = float(dw)
            w = doc.resolve(d0.get("W"))
            if isinstance(w, list):
                self.cid_widths = _parse_cid_widths(doc, w)
        tu = font_dict.get("ToUnicode")
        cmap = doc.stream_of(tu) if isinstance(tu, _Ref) else None
        if cmap:
            self.to_unicode = _parse_tounicode(cmap)

    def decode(self, raw: bytes):
        """Show-string bytes → (code, text, apply_word_spacing) triples.

        Simple fonts: one byte per code, text = Latin-1 char, word spacing
        applies to byte 32. Identity-H: big-endian 2-byte CIDs mapped
        through ToUnicode (fallback: the CID as a code point — the best
        guess without an embedded CMap); word spacing NEVER applies to
        multi-byte codes (ISO 32000 §9.3.3)."""
        if not self.type0:
            return [(b, chr(b), b == 0x20) for b in raw]
        out = []
        for i in range(0, len(raw) - 1, 2):
            cid = (raw[i] << 8) | raw[i + 1]
            text = (self.to_unicode or {}).get(cid)
            if text is None:
                text = chr(cid) if 0 < cid < 0x110000 else ""
            out.append((cid, text, False))
        return out

    def decode_adv(self, raw: bytes):
        """Show-string bytes → (text, apply_word_spacing, w_em) triples.

        Same values `decode` + `width(code)/1000.0` would yield, glyph for
        glyph (the per-byte table just hoists the pure `width(b)/1000.0`
        computation out of the per-glyph loop for simple fonts — identical
        float, computed once per font instead of once per occurrence).
        This is the content-stream hot path: one entry per glyph in the
        corpus, so for simple fonts it's a single 256-way list index."""
        if not self.type0:
            table = self._simple_table
            if table is None:
                table = self._simple_table = [
                    (chr(b), b == 0x20, self.width(b) / 1000.0)
                    for b in range(256)
                ]
            return [table[b] for b in raw]
        return [
            (text, ws, self.width(code) / 1000.0)
            for code, text, ws in self.decode(raw)
        ]

    def width(self, code: int) -> float:
        """Glyph width in 1/1000 em."""
        if self.type0:
            if self.cid_widths is not None and code in self.cid_widths:
                return self.cid_widths[code]
            return self.default_width
        if self.widths is not None:
            i = code - self.first_char
            if 0 <= i < len(self.widths) and self.widths[i] > 0:
                return self.widths[i]
        return float(self.fixed)


def _mat_mul(a, b):
    """3x3 affine (stored as 6-tuple a b c d e f) product: a then b."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _page_chars(doc: _Document, page: dict, page_no: int) -> list[tuple]:
    contents = page.get("Contents")
    streams: list[bytes] = []
    resolved = doc.resolve(contents) if isinstance(contents, _Ref) else contents
    if isinstance(contents, _Ref) and doc.stream_of(contents) is not None:
        streams.append(doc.stream_of(contents))
    elif isinstance(resolved, list):
        for ref in resolved:
            s = doc.stream_of(ref)
            if s is not None:
                streams.append(s)
    if not streams:
        return []
    content = b"\n".join(streams)

    # resources → fonts
    res = doc.resolve(page.get("Resources")) or {}
    font_res = doc.resolve(res.get("Font")) or {}
    fonts = {name: _Font(doc, doc.resolve(fd)) for name, fd in font_res.items()}

    boxes: list[tuple] = []
    lex = _Lexer(content)
    stack: list = []
    ctm = _ID
    ctm_stack: list = []
    tm = _ID          # text matrix
    tlm = _ID         # text line matrix
    font: _Font | None = None
    size = 0.0
    leading = 0.0
    char_spacing = 0.0
    word_spacing = 0.0

    def show(raw: bytes) -> None:
        nonlocal tm
        if font is None:
            return
        # Hot loop: inline the two products a full _mat_mul pair per glyph
        # would compute. Only m[4]/m[5] of tm·ctm are consumed (same
        # expressions, same evaluation order ⇒ identical rounding), and
        # T(advance)·tm only rewrites tm[4]/tm[5] (again the same terms
        # _mat_mul produces for that row). ~2× fewer flops and no tuple
        # churn per char — this loop runs once per glyph in the corpus.
        t0, t1, t2, t3, t4, t5 = tm
        c0, c1, c2, c3, c4, c5 = ctm
        for text, is_space_byte, w_em in font.decode_adv(raw):
            advance = (
                w_em * size + char_spacing + (word_spacing if is_space_byte else 0.0)
            )
            x0 = t4 * c0 + t5 * c2 + c4
            y0 = t4 * c1 + t5 * c3 + c5
            if text and text != " ":
                boxes.append(
                    (page_no, text, x0, y0, x0 + w_em * size, y0 + size * 0.75)
                )
            t4 = advance * t0 + 0.0 * t2 + t4
            t5 = advance * t1 + 0.0 * t3 + t5
        tm = (t0, t1, t2, t3, t4, t5)

    def pop_nums(n: int) -> list[float]:
        if len(stack) >= n:
            vals = [t[1] if t[0] == "num" else 0.0 for t in stack[-n:]]
            del stack[-n:]
            return vals
        stack.clear()
        return [0.0] * n

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind in ("num", "name", "str"):
            stack.append((kind, val))
            continue
        if kind == "arr_open":
            arr = []
            while True:
                t = lex.next_token()
                if t is None or t[0] == "arr_close":
                    break
                arr.append(t)
            stack.append(("arr", arr))
            continue
        if kind in ("dict_open",):
            # inline dicts (e.g. BDC properties): parse and discard
            _parse_value(lex, tok)
            stack.append(("dict", None))
            continue
        if kind != "op":
            continue
        op = val
        if op == "BT":
            tm = tlm = _ID
        elif op == "ET":
            pass
        elif op == "Tf":
            if len(stack) >= 2:
                fname = stack[-2][1] if stack[-2][0] == "name" else None
                size = stack[-1][1] if stack[-1][0] == "num" else 0.0
                font = fonts.get(fname) or (next(iter(fonts.values())) if fonts else None)
                del stack[-2:]
        elif op == "Td":
            tx, ty = pop_nums(2)
            tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
            tm = tlm
        elif op == "TD":
            tx, ty = pop_nums(2)
            leading = -ty
            tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
            tm = tlm
        elif op == "Tm":
            a, b, c, d, e, f = pop_nums(6)
            tlm = (a, b, c, d, e, f)
            tm = tlm
        elif op == "T*":
            tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
            tm = tlm
        elif op == "TL":
            (leading,) = pop_nums(1)
        elif op == "Tc":
            (char_spacing,) = pop_nums(1)
        elif op == "Tw":
            (word_spacing,) = pop_nums(1)
        elif op == "Tj":
            if stack and stack[-1][0] == "str":
                show(stack.pop()[1])
        elif op == "'":
            tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
            tm = tlm
            if stack and stack[-1][0] == "str":
                show(stack.pop()[1])
        elif op == '"':
            if len(stack) >= 3:
                word_spacing = stack[-3][1] if stack[-3][0] == "num" else word_spacing
                char_spacing = stack[-2][1] if stack[-2][0] == "num" else char_spacing
                raw = stack[-1][1] if stack[-1][0] == "str" else b""
                del stack[-3:]
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                show(raw)
        elif op == "TJ":
            if stack and stack[-1][0] == "arr":
                for t in stack.pop()[1]:
                    if t[0] == "str":
                        show(t[1])
                    elif t[0] == "num" and font is not None:
                        # kerning adjustment: -val/1000 * size text-space units
                        tm = _mat_mul((1, 0, 0, 1, -t[1] / 1000.0 * size, 0), tm)
        elif op == "cm":
            a, b, c, d, e, f = pop_nums(6)
            ctm = _mat_mul((a, b, c, d, e, f), ctm)
        elif op == "q":
            ctm_stack.append(ctm)
        elif op == "Q":
            if ctm_stack:
                ctm = ctm_stack.pop()
        else:
            stack.clear()  # unknown operator consumes its operands
    return boxes


def decode_pdf_chars(pdf_bytes: bytes) -> list[tuple]:
    """Real PDF bytes → ``(page, ch, x0, y0, x1, y1)`` char boxes.

    A structurally-empty file (no page objects) raises — that is a decode
    failure. A valid PDF whose pages carry no text operators returns ``[]``:
    that is the image-only case the OCR fallback (A4) routes on.
    """
    doc = _Document(pdf_bytes)
    pages = doc.pages()
    if not pages:
        raise ValueError("no page objects found")
    boxes: list[tuple] = []
    for page_no, page in enumerate(pages):
        boxes.extend(_page_chars(doc, page, page_no))
    return boxes


def extract_text(pdf_bytes: bytes) -> str:
    """Convenience: full decode + layout pass → extracted text."""
    from pdf_parser_spark import pdf_layout

    return pdf_layout.extract_layout_text(decode_pdf_chars(pdf_bytes))[0]
