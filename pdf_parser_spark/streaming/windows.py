"""Watermarked event-time windowed aggregation over the transaction stream.

The reference has no windowed aggregates (SURVEY.md §2.10 — its only temporal
semantics is the ±5-day pairing window), but a web-scale ingest pipeline
needs the standard Structured Streaming shape: event-time tumbling windows +
watermark for late data. This module provides the canonical stage the
lineage/metrics tables consume: per-window ingest counts and amount totals,
closing windows `delay` after their end so late events (S3) still land.

Late/duplicate semantics: events later than the watermark are dropped by
Spark; in-watermark late events update their window's aggregate in place
(append mode emits a window only once it is final — exactly the per-window
commit the lineage table wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_txn_stats(
    txn_stream: DataFrame,
    window: str = "1 hour",
    delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """txn stream → per-(window, sourceType) counts/totals, watermarked.

    Works identically on a batch DataFrame (no watermark effect) and a
    stream (append-mode finality) — the classic Spark unified-API property,
    asserted by the tests.
    """
    return (
        txn_stream.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "sourceType")
        .agg(
            F.count("*").alias("n_txns"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.round(F.sum(F.abs(F.col("amount"))), 2).alias("total_abs"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "sourceType",
            "n_txns",
            "total_amount",
            "total_abs",
        )
    )
