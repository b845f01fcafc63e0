"""End-to-end pipeline assembly (SURVEY.md §3.1 lifecycle, set-based).

pages → extract (mapInPandas, no shuffle)
      → transactions (explode)
      → normalize (sourceType, C2 banded semi-probe, G10 display amount)
      → classify (broadcast memory joins + native keyword cascade)
      → pairing (C1 banded self-join, mutual-best)
      → journal (H1 explode)

Scale notes baked in:
- Input is repartitioned by xxhash64(url) when requested — extraction cost is
  per-document, and Common-Crawl hosts are Zipfian; hashing by url (NOT host)
  spreads hot hosts across all partitions (north rule skew handling).
- Every stage after extraction is relational; shuffles happen only at the
  C2/C1 banded joins and the final aggregate, all on bounded-fanout keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import classify as classify_op
from pdf_parser_spark.operators import extract as extract_op
from pdf_parser_spark.operators import journal as journal_op
from pdf_parser_spark.operators import normalize as normalize_op
from pdf_parser_spark.operators import pairing as pairing_op


def distribute_pages(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """Skew-proof distribution: repartition by xxhash64(url).

    Extraction work is keyed by url hash, never by host (BASELINE.json north
    rule) — host0 owning 30% of the corpus still spreads uniformly.
    """
    if partitions:
        return pages.repartition(partitions, F.xxhash64("url"))
    return pages.repartition(F.xxhash64("url"))


def transactions_pipeline(
    pages: DataFrame,
    user_memory: DataFrame | None = None,
    global_memory: DataFrame | None = None,
    repartition: int | None = None,
    keep_text: bool = False,
    cache: bool = True,
) -> DataFrame:
    """pages → fully-decorated transactions table (FIXTURES.md F3 shape).

    Two materialization barriers (cache=True): after the explode (the C2/C1
    self-joins reference the transactions table on BOTH sides — without a
    barrier Catalyst re-executes the pandas-UDF extraction once per DAG
    branch, ~6× the Python cost), and after classification (the pairing
    self-join re-reads its input twice). In the resumable production job the
    same barriers are per-bucket table commits (plans/checkpoint.py); persist
    is their in-memory, spill-to-disk analog for single-job runs.

    Storage level is SERIALIZED memory-and-disk, not the deserialized
    default: the barriers hold wide string-heavy rows (memo/url/source), and
    deserialized JVM string objects inflate 3-5× — at millions of rows per
    executor that turns both caches into old-gen heap pressure and GC churn
    (measured: repeat full-pipeline runs at 600k docs degraded 112→193s
    deserialized vs staying ~flat serialized). Serialized blocks trade a
    little per-read CPU for a bounded, compact footprint — the right side of
    that trade at 100 TB, where cache working sets must stay predictable.
    """
    from pyspark import StorageLevel

    if repartition:
        pages = distribute_pages(pages, repartition)
    extracted = extract_op.extract_documents(pages, keep_text=keep_text)
    txns = extract_op.extracted_transactions(extracted)
    if cache:
        txns = txns.persist(StorageLevel.MEMORY_AND_DISK)
    txns = normalize_op.normalize(txns)
    txns = classify_op.classify(txns, user_memory, global_memory)
    if cache:
        txns = txns.persist(StorageLevel.MEMORY_AND_DISK)
    txns = pairing_op.pair_transfers(txns)
    return txns


def journal_pipeline(txns: DataFrame) -> DataFrame:
    """transactions → journal lines (H1)."""
    return journal_op.journal_entries(txns)


def flagship_summary(txns: DataFrame) -> DataFrame:
    """The flagship analytic query: per-source rollup of extracted spend.

    Equivalent of the reference's upload summary + transaction listing
    (main.py:235-245): volume, net spend, pairing and classification rates.
    """
    return (
        txns.groupBy("source", "sourceType")
        .agg(
            F.count("*").alias("n_txns"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
            F.round(F.sum("displayAmount"), 2).alias("total_display"),
            F.sum(F.col("pairId").isNotNull().cast("int")).alias("n_paired"),
            F.sum((F.col("classificationSource") == "ai").cast("int")).alias("n_ai"),
        )
        .orderBy("source", "sourceType")
    )
