"""A4 — two-pass OCR fallback (the expensive pass runs only where needed).

Reference behavior ((pyc) main.parse_pdf: "No transactions from text. Trying
OCR fallback."): the raster+Tesseract path runs ONLY for documents whose
text-layer pass produced zero transactions. At 10^12 documents this two-pass
split is the difference between rasterizing everything (ruinous) and
rasterizing the failed tail (typically <1%).

Spark shape:
    pass 1: extract_documents(pages)                — cheap, all docs
    pass 2: pages ⨝ (pass1 where n_txns=0, left_semi) → ocr_extract — rare

Tesseract/pdf2image are not in this container, so the raster-decode step is
STUBBED like the media decoders (operators/multimodal.py): ``fake=False``
(production) raises NotImplementedError per row and marks the row
``ocr_failed``; ``fake=True`` produces a deterministic pseudo-OCR read of the
payload bytes (drops the last line and re-joins with OCR-typical single
newlines — a plausible lossy scan) so the two-pass PLUMBING — the semi-join
routing, the schema union, the metrics — is real and tested. Word ordering by
vertical position ((pyc) main.extract_text_lines_with_ocr sorts by 'top') is
preserved in the fake via line order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark import extraction_core as core
from pdf_parser_spark.operators import extract as extract_op

OCR_SCHEMA = (
    "url string, ocr_text string, ocr_n_txns int, ocr_failed boolean, "
    "ocr_txns array<struct<txn_index:int, date:string, dateKey:string, memo:string, "
    "amount:double, source:string>>"
)


def _fake_ocr(payload: bytes) -> str:
    """Deterministic pseudo-OCR: decode bytes, words re-read top-to-bottom.

    Emulates image_to_data(Output.DICT) + sort-by-'top': line structure
    survives, trailing content is lost (scans clip), runs of spaces collapse.
    """
    text = (payload or b"").decode("utf-8", errors="replace")
    lines = [" ".join(ln.split()) for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    return "\n".join(lines[:-1]) if len(lines) > 1 else "\n".join(lines)


def ocr_extract(pages: DataFrame, fake: bool = False) -> DataFrame:
    """Rasterize+OCR the given pages and re-run the transaction parser."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["html"]):
                if not fake:
                    # production path: pdf2image.convert_from_bytes +
                    # pytesseract.image_to_data, absent in this container
                    rows.append(
                        {"url": url, "ocr_text": "", "ocr_n_txns": 0,
                         "ocr_failed": True, "ocr_txns": []}
                    )
                    continue
                text = _fake_ocr(bytes(payload) if payload is not None else b"")
                # (pyc) main.parse_pdf re-runs the STATEMENT parser over the
                # OCR'd lines — it does not re-dispatch strategies (the 'ocr'
                # strategy itself emits no rows, ref strategies/ocr_parser.py:11-14)
                parsed = core.parse_amex_text(text)
                rows.append(
                    {
                        "url": url,
                        "ocr_text": text,
                        "ocr_n_txns": len(parsed),
                        "ocr_failed": False,
                        "ocr_txns": [
                            {
                                "txn_index": i,
                                "date": r["date"],
                                "dateKey": core.parse_date_key(r["date"]),
                                "memo": r["memo"],
                                "amount": r["amount"],
                                "source": r["source"],
                            }
                            for i, r in enumerate(parsed)
                        ],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "ocr_text", "ocr_n_txns", "ocr_failed", "ocr_txns"]
            )

    return pages.select("url", "html").mapInPandas(run, schema=OCR_SCHEMA)


def extract_with_ocr_fallback(pages: DataFrame, fake_ocr: bool = False) -> DataFrame:
    """Two-pass extraction: text layer for all, OCR only for the empty tail.

    Returns the pass-1 schema with txns/extracted_text replaced by the OCR
    result where the fallback fired, plus an ``ocr_used`` flag.
    """
    pass1 = extract_op.extract_documents(pages, keep_text=True).persist()
    empty = pass1.filter(F.col("n_txns") == 0).select("url")
    # semi-join routes ONLY failed docs into the expensive pass
    ocr_input = pages.join(empty, "url", "left_semi")
    ocr = ocr_extract(ocr_input, fake=fake_ocr)

    joined = pass1.join(ocr, "url", "left")
    use_ocr = F.col("ocr_n_txns").isNotNull() & (F.col("ocr_n_txns") > 0)
    return (
        joined.withColumn("ocr_used", F.coalesce(use_ocr, F.lit(False)))
        .withColumn("txns", F.when(use_ocr, F.col("ocr_txns")).otherwise(F.col("txns")))
        .withColumn("n_txns", F.when(use_ocr, F.col("ocr_n_txns")).otherwise(F.col("n_txns")))
        .withColumn(
            "extracted_text",
            F.when(use_ocr, F.col("ocr_text")).otherwise(F.col("extracted_text")),
        )
        .drop("ocr_text", "ocr_n_txns", "ocr_txns")
    )
