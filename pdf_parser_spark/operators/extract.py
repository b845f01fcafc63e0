"""A2-A4/B4/E1 — the extraction stage: pages → extracted text + transactions.

One `mapInPandas` pass over the pages table does everything per document
(route by payload kind, extract main text, dispatch parser strategy, parse
transaction blocks, compute per-doc metrics) and emits ONE row per document
with the transactions nested as an array<struct>. Downstream stages explode
it. This mirrors the reference lifecycle (SURVEY.md §3.1: bytes → text →
strategy → rows) but vectorized: the Python work is amortized over Arrow
batches, imports happen once per executor, and there is NO shuffle in this
stage — extraction is embarrassingly parallel over input partitions, which is
what makes the N→4N scaling criterion achievable (the stage's scaling is
bounded only by input-split balance, handled by xxhash64(url) repartition
upstream for skewed hosts).

Reference lineage: text-layer scan universal_parser.py:19-23, strategy
dispatch universal_parser.py:26-37, block parse strategies/amex_multiline.py,
two-pass OCR fallback (pyc) main.parse_pdf.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark import extraction_core as core
from pdf_parser_spark import html_extract, pdf_layout

# One row per input document; txns nested, exploded downstream.
# Span-struct caveat: the HTML path fills real char offsets (start/end into
# extracted_text, n_chars = block size); the PDF layout path reuses the
# struct as a GEOMETRIC region record (start=end=0, n_chars = the region's
# LINE count, tag = region kind) — consumers computing offsets must scope
# themselves to payload_kind='html' (the r20 span audit does exactly that).
EXTRACT_SCHEMA = (
    "url string, lang string, source_type_hint string, payload_kind string, strategy string, "
    "source_account string, closing_date string, extracted_text string, "
    "bytes_in long, chars_out long, n_blocks int, n_txns int, parse_failed boolean, "
    "txns array<struct<txn_index:int, date:string, dateKey:string, memo:string, "
    "amount:double, source:string>>, "
    "spans array<struct<block:int, start:int, end:int, tag:string, n_chars:int, "
    "link_density:double>>"
)


def _payload_kind(url: str, payload: bytes | None) -> str:
    """Magic bytes first, url suffix second: a PDF served at a non-.pdf
    url (query-string download endpoints, 'a.pdf?sig=x') must not be
    regex-parsed as HTML — that path returns mangled text with
    parse_failed=False, a silent mis-extraction. The suffix keeps routing
    fixture-convention .pdf payloads (raw text bytes, no magic) into the
    synthesized-char-box layout path."""
    if payload is not None and bytes(payload[:5]) == b"%PDF-":
        return "pdf"
    return "pdf" if url.endswith(".pdf") else "html"


_FAIL_KEYS = dict(
    strategy="", source_account="", closing_date="", extracted_text="",
    chars_out=0, n_blocks=0, n_txns=0, parse_failed=True, txns=[], spans=[],
)


def _extract_one(url: str, html: bytes, keep_text: bool) -> dict:
    """One document through the full extraction; NEVER raises.

    Any per-document failure — engine chain exhausted, pathological
    markup tripping the layout pass, undecodable payload — returns a
    parse_failed=True record instead of propagating: at corpus scale one
    poisoned document must land in the failure funnel (extraction_metrics
    parse_failures), not kill the job after four task retries.
    """
    bytes_in = len(html) if html is not None else 0
    try:
        return _extract_one_inner(url, html, keep_text, bytes_in)
    except Exception:
        return {"url": url, "payload_kind": _payload_kind(url, html),
                "bytes_in": bytes_in, **_FAIL_KEYS}


def _extract_one_inner(url: str, html: bytes, keep_text: bool,
                       bytes_in: int) -> dict:
    kind = _payload_kind(url, html)
    parse_failed = False
    spans: list[dict] = []
    page_texts: list[str] | None = None
    if kind == "pdf":
        # pdfminer-style layout pass; real `%PDF-` payloads decode through
        # the engine chain (pdfplumber → PyMuPDF → built-in pdf_codec), the
        # fixture convention carries raw text bytes for .pdf urls
        try:
            if html is not None and bytes(html[:5]) == b"%PDF-":
                chars = pdf_layout.decode_pdf_chars(bytes(html))
            else:
                chars = pdf_layout.synthesize_char_boxes(
                    (html or b"").decode("utf-8", errors="replace")
                )
            text, layout_spans, page_texts = pdf_layout.extract_layout_text(
                chars, return_pages=True
            )
            spans = [
                {
                    "block": i,
                    "start": 0,
                    "end": 0,
                    "tag": s["region"],
                    "n_chars": s["n_lines"],
                    "link_density": 0.0,
                }
                for i, s in enumerate(layout_spans)
            ]
        except NotImplementedError:
            text, spans, parse_failed = "", [], True
    else:
        text, spans = html_extract.extract_main_text(bytes(html) if html is not None else b"")

    strategy = core.dispatch_strategy(text) if text else ""
    rows, meta = core.extract_transactions_from_text(text, page_texts)
    closing = core.extract_closing_date(text) if text else None
    txns = [
        {
            "txn_index": i,
            "date": r["date"],
            "dateKey": core.parse_date_key(r["date"]),
            "memo": r["memo"],
            "amount": r["amount"],
            "source": r["source"],
        }
        for i, r in enumerate(rows)
    ]
    return {
        "url": url,
        "payload_kind": kind,
        "strategy": strategy,
        "source_account": meta.get("source_account") or "",
        "closing_date": closing or "",
        "extracted_text": text if keep_text else "",
        "bytes_in": bytes_in,
        "chars_out": len(text),
        "n_blocks": len(spans),
        "n_txns": len(txns),
        "parse_failed": parse_failed,
        "txns": txns,
        "spans": spans,
    }


def extract_documents(pages: DataFrame, keep_text: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) → one extraction row per doc.

    Column pruning matters at 100 TB: only url/html/lang are consumed, so the
    select() ahead of mapInPandas lets Parquet skip the heavy `text` column.
    """
    cols = ["url", "html", "lang", "source_type_hint"]
    have_hint = "source_type_hint" in pages.columns
    # fresh-crawl pages (e.g. the WARC source) arrive without a lang label
    have_lang = "lang" in pages.columns
    pruned = pages.select(*[c for c in cols if c in pages.columns])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            hints = pdf["source_type_hint"] if have_hint else [None] * len(pdf)
            langs = pdf["lang"] if have_lang else [None] * len(pdf)
            for url, html, lang, hint in zip(pdf["url"], pdf["html"], langs, hints):
                rec = _extract_one(url, html, keep_text)
                rec["lang"] = lang
                rec["source_type_hint"] = hint
                out.append(rec)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, schema=EXTRACT_SCHEMA)


def extracted_transactions(extracted: DataFrame, uid: str = "batch") -> DataFrame:
    """Explode nested txns → one row per transaction (flagship F3 shape).

    txn_id is deterministic f"{url}#{txn_index}" (FIXTURES.md F3 — replaces
    the reference's uuid4/Firestore auto-ids so results are reproducible).
    sourceType derives from the source-type hint cycle when present upstream;
    here it is assigned by the caller via join or left to 'bank' default as
    the reference does (main.py:230 src_type_default).
    """
    t = (
        extracted.select(
            "url",
            "lang",
            "source_type_hint",
            F.explode("txns").alias("t"),
        )
        .select(
            F.concat_ws("#", "url", F.col("t.txn_index").cast("string")).alias("txn_id"),
            "url",
            "lang",
            "source_type_hint",
            F.col("t.date").alias("date"),
            F.col("t.dateKey").alias("dateKey"),
            F.col("t.memo").alias("memo"),
            F.col("t.amount").alias("amount"),
            F.col("t.source").alias("source"),
        )
        .withColumn("uploadId", F.col("url"))
        .withColumn("uid", F.lit(uid))
    )
    return t


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """A8 — per-partition lineage/metrics rows (north star: docs/sec,
    parse-failure rate, bytes in/out). Partition id is the lineage unit
    (mirrors the per-upload metadata row, ref main.py:235-245)."""
    return (
        extracted.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("chars_out").alias("chars_out"),
            F.sum("n_txns").alias("txns"),
            F.sum(F.col("parse_failed").cast("int")).alias("parse_failures"),
            F.sum((F.col("n_txns") == 0).cast("int")).alias("empty_docs"),
        )
    )
