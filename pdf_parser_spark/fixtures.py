"""Deterministic synthetic web-pages corpus (FIXTURES.md F1/F2).

Everything is a pure function of ``doc_id`` — no RNG state, no wall clock —
so any worker can regenerate any slice independently (this is what lets the
bench corpus be built distributed, inside Spark, without shipping data).

Invariants the tests assert:
- `extract_main_text(html)` == `text` byte-for-byte for every HTML row
  (the north rule's per-url byte-identity, exercised end to end), and
- `extract_layout_text(synthesize_char_boxes(text))[0]` == `text` for every
  PDF-path row (url ends '.pdf'; its `html` column carries the raw payload
  bytes, per FIXTURES.md F1).
- the corpus hits every strategy-dispatch branch (amex / tabular / ocr /
  no-match) and every scalar function in SURVEY.md §2.8.

Skew: host0 owns ~30% of urls (FIXTURES.md F1) to exercise the salting path.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

_VENDORS = [
    "ACME COFFEE #42 SEATTLE WA",
    "AMAZON MKTPLACE amzn.com/bill",
    "DELTA AIR LINES ATLANTA",
    "UBER TRIP HELP.UBER.COM",
    "WHOLEFDS MKT 10259 SEATTLE",
    "SHELL OIL 5744 PORTLAND OR",
    "NETFLIX.COM 866-579-7172",
    "COMCAST CABLE COMM 800-COMCAST",
    "user@example.com https://pay.example.com ref 123",
    "SQ *BLUE BOTTLE COFFEE Oakland",
]

_LANGS = ["en", "es", "de", "zh"]
_SOURCE_TYPES = ["bank", "card", "loan"]

BASE_DATE = datetime(2024, 1, 1)


def _fmt_amount(cents: int, parens: bool, comma: bool, star: bool) -> str:
    v = cents / 100.0
    s = f"{v:,.2f}" if comma else f"{v:.2f}"
    if parens:
        return f"$({s})"
    return f"${s}" + ("*" if star else "")


def _txn_line(doc_id: int, i: int) -> str:
    d = BASE_DATE + timedelta(days=(doc_id * 3 + i * 2) % 70)
    date = d.strftime("%m/%d/%Y") if (doc_id + i) % 4 else d.strftime("%m/%d/%y")
    vendor = _VENDORS[(doc_id * 7 + i) % len(_VENDORS)]
    cents = 50 + (doc_id * 3717 + i * 1313) % 499950
    parens = (doc_id + i) % 5 == 1
    comma = cents >= 100000
    star = (doc_id + i) % 7 == 3
    return f"{date} {vendor} {_fmt_amount(cents, parens, comma, star)}"


def transfer_seed(doc_id: int) -> tuple[str, int] | None:
    """Deterministic cross-document transfer pair seeding.

    Docs (2k, 2k+1) with k%3==0 share one 'PAYMENT RECEIVED - THANK YOU'
    amount: positive leg in the even doc, parenthesized (negative) leg in the
    odd doc, 2 days apart — pairs under C1 when the docs land as
    bank (even, doc_id%3==0) and card (odd, doc_id%3==1).
    """
    k = doc_id // 2
    if k % 3 != 0:
        return None
    cents = 25000 + (k % 50) * 100
    d = BASE_DATE + timedelta(days=(k * 5) % 60 + (doc_id % 2) * 2)
    date = d.strftime("%m/%d/%Y")
    if doc_id % 2 == 0:
        return f"{date} TRANSFER PAYMENT RECEIVED - THANK YOU ${cents/100.0:.2f}", cents
    return f"{date} PAYMENT RECEIVED - THANK YOU $({cents/100.0:.2f})", cents


def statement_text(doc_id: int) -> str:
    """F2 payload grammar: deterministic AMEX-dialect statement text.

    doc_id % 10 == 7 → tabular-header doc (B2 match, 0 rows)
    doc_id % 10 == 8 → 'scanned image' doc (B3 match, 0 rows)
    doc_id % 10 == 9 → no-match doc (0 rows)
    otherwise        → AMEX-multiline doc (B1 match)
    """
    mode = doc_id % 10
    if mode == 7:
        return (
            "STATEMENT OF ACCOUNT\n"
            "DATE        DESCRIPTION                 AMOUNT\n"
            f"2024-01-{(doc_id % 27) + 1:02d}  GENERIC VENDOR {doc_id}         {doc_id % 90}.00\n"
            "END OF STATEMENT"
        )
    if mode == 8:
        # a "scanned" doc: the text layer carries only the banner plus the
        # scan's visible statement lines — pass 1 dispatches to the row-less
        # OCR strategy (B3), the two-pass fallback recovers the transactions
        lines = [
            f"This document is a scanned image of statement {doc_id}.",
            "Optical character recognition required.",
        ]
        for i in range(2 + doc_id % 3):
            lines.append(_txn_line(doc_id, i))
        lines.append("No text layer is present.")  # lost by the lossy scan
        return "\n".join(lines)
    if mode == 9:
        return (
            f"Annual privacy notice for account holder {doc_id}.\n"
            "Please retain this notice for your records.\n"
            "No transaction information is included herein."
        )

    lines: list[str] = []
    acct5 = 10000 + (doc_id * 991) % 90000
    lines.append(f"Account Ending 1-{acct5}")
    closing = BASE_DATE + timedelta(days=70 + doc_id % 20)
    lines.append(f"Closing Date {closing.strftime('%m/%d/%Y')}")
    # B1 features 2/3 present for most docs; vary to hit score branches
    if doc_id % 5 != 2:
        lines.append(f"Total Fees for this Period ${(doc_id % 40) + 0.34:.2f}")
    if doc_id % 5 != 3:
        lines.append("Interest Charged")

    seed = transfer_seed(doc_id)
    if seed:
        lines.append(seed[0])

    n_txn = 3 + (doc_id % 18)
    for i in range(n_txn):
        lines.append(_txn_line(doc_id, i))
        if (doc_id + i) % 6 == 2:
            lines.append("  ADDITIONAL DETAIL LINE FOR MERCHANT")
    # noise rows that must be dropped (B6)
    lines.append("New Balance $999.99")
    if doc_id % 3 == 0:
        lines.append(
            f"02/01/2024 INTEREST CHARGE ON PURCHASES ${8.88 + (doc_id % 5):.2f}"
        )
    lines.append("Membership Rewards points summary p. 2/7")
    return "\n".join(lines)


_BOILER_NAV = (
    '<nav class="topnav"><a href="/">Home</a> <a href="/stmt">Statements</a> '
    '<a href="/help">Help</a> <a href="/logout">Logout</a></nav>'
)
_BOILER_FOOTER = (
    '<footer><div class="copyright">© 2024 Example Bank. '
    '<a href="/tos">Terms</a> <a href="/privacy">Privacy</a></div></footer>'
)
_BOILER_SIDEBAR = (
    '<div id="sidebar"><ul><li><a href="/offers">Special offers for you</a></li>'
    '<li><a href="/cards">Compare cards</a></li></ul></div>'
)


def wrap_html(text: str, doc_id: int) -> bytes:
    """Statement text → HTML page bytes, with boilerplate on most docs.

    The <pre> payload is the main content; nav/sidebar/footer are boilerplate
    the extractor must strip. extract_main_text(wrap_html(t, d)) == t.
    """
    pre = f"<pre>{_escape(text)}</pre>"
    if doc_id % 4 == 0:
        body = pre  # minimal page, no boilerplate
    else:
        body = f"{_BOILER_NAV}{_BOILER_SIDEBAR}<main><article>{pre}</article></main>{_BOILER_FOOTER}"
    return (
        f"<html><head><title>Statement {doc_id}</title>"
        f"<script>var t={doc_id};</script></head><body>{body}</body></html>"
    ).encode("utf-8")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def page_row(doc_id: int, n_hosts: int = 50) -> dict:
    """One row of the F1 `pages` table, a pure function of doc_id.

    PDF-path subset: doc_id%10==5 carries raw text bytes (the synthesized
    char-box path), doc_id%10==6 carries REAL `%PDF-` bytes written by the
    from-scratch pdf_codec writer — so the full byte→object→FlateDecode→
    text-operator→char-box decode chain runs inside the extraction UDF and
    is held to the same byte-identity invariant as everything else.
    """
    host = 0 if doc_id % 10 < 3 else (doc_id % n_hosts)  # host0 ≈ 30% (skew)
    mode = doc_id % 10
    is_pdf = mode in (5, 6)
    text = statement_text(doc_id)
    url = f"https://host{host}.example/stmt/{doc_id}" + (".pdf" if is_pdf else "")
    if mode == 6:
        from pdf_parser_spark.pdf_codec import (
            write_pdf,
            write_pdf_objstm,
            write_pdf_type0,
        )

        # rotate simple / Type0 / object-stream layouts so the
        # extraction-identity contract exercises ALL THREE decode paths:
        # classic xref + simple fonts, 2-byte Identity-H CIDs + ToUnicode
        # CMap, and the modern PDF 1.5 shape (ObjStm-packed catalog/pages,
        # PNG-predictored streams, cross-reference stream)
        writer = (write_pdf, write_pdf_type0, write_pdf_objstm)[
            (doc_id // 10) % 3
        ]
        payload = writer(text)
    elif mode == 5:
        payload = text.encode("utf-8")
    else:
        payload = wrap_html(text, doc_id)
    return {
        "url": url,
        "warc_ts": BASE_DATE + timedelta(minutes=doc_id),
        "html": payload,
        "text": text,
        "lang": _LANGS[doc_id % 4],
        "source_type_hint": _SOURCE_TYPES[doc_id % 3],
    }


def pages_pandas(n_docs: int, n_hosts: int = 50, start: int = 0) -> pd.DataFrame:
    """A slice [start, start+n_docs) of the pages corpus as pandas."""
    return pd.DataFrame([page_row(i, n_hosts) for i in range(start, start + n_docs)])


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "source_type_hint string"
)


def pages_spark(spark, n_docs: int, n_hosts: int = 50, partitions: int = 32):
    """Distributed corpus synthesis: ids → mapInPandas(page_row) — no driver data.

    Builds the corpus inside executors from the deterministic generator, the
    way a 10^12-row table would be materialized (spark.range is evenly
    range-partitioned; rows are generated where they are consumed).
    """
    ids = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([page_row(int(i), n_hosts) for i in pdf["id"]])

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
