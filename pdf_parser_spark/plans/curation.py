"""Corpus curation: the canonical web-scale training-data pipeline.

Composes the training-data operators into the standard curation sequence a
100 TB crawl corpus goes through before tokenization:

    documents → text stats + quality gate (native expressions, codegen)
              → language filter (Arrow-batched lang-ID)
              → exact dedup (md5 hash-groupBy, keep min doc_id)
              → near-dup removal (MinHash+LSH banding, verified Jaccard)
              → curated table + per-language summary

Scale shape: every stage is either a narrow projection/filter or an
equi-join-shaped shuffle. The near-dup stage shuffles O(n·bands) band keys
(never all-pairs); the drop rule is applied with a left-anti join against
the loser-id set, so the big table is shuffled exactly once per dedup stage
on its key.

Near-dup drop rule (documented approximation): for every verified pair
(a < b), the LARGER doc_id is dropped. This is one pass of union-by-min —
duplicates of a cluster all lose to the cluster's minimum unless chained
pairs escape the LSH bands (rare at the thresholds used; exact transitive
clustering would need iterative connected components, which the batch
re-run converges toward). Deterministic and order-free either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import dedupe as dedupe_op
from pdf_parser_spark.operators import textstats as textstats_op


def quality_gate(docs: DataFrame, min_quality: float = 0.5,
                 text_col: str = "text") -> DataFrame:
    """Stats + composite quality score, filtered to quality >= min_quality."""
    stats = textstats_op.with_text_stats(docs, text_col)
    stats = stats.withColumn("quality", textstats_op.quality_score_col())
    return stats.filter(F.col("quality") >= min_quality)


def language_filter(docs: DataFrame, allowed: tuple[str, ...] = ("en",),
                    text_col: str = "text") -> DataFrame:
    """Keep docs whose *predicted* language is in `allowed` (label-free)."""
    return textstats_op.with_lang_id(docs, text_col).filter(
        F.col("lang_pred").isin(list(allowed))
    )


def drop_exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Keep one survivor (min id) per normalized-text fingerprint."""
    keepers = dedupe_op.exact_duplicates(docs, id_col, text_col).select(
        F.col("keeper_id").alias("_keep_id")
    )
    return docs.join(
        keepers, docs[id_col] == keepers["_keep_id"], "left_semi"
    )


def drop_near_duplicates(docs: DataFrame, threshold: float = 0.85,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Drop the larger id of every verified near-dup pair (union-by-min pass)."""
    pairs = dedupe_op.near_duplicates_minhash(docs, threshold, id_col, text_col)
    losers = pairs.select(F.col("b_id").alias("_lose_id")).distinct()
    return docs.join(losers, docs[id_col] == losers["_lose_id"], "left_anti")


def curate(docs: DataFrame, min_quality: float = 0.5,
           allowed_langs: tuple[str, ...] = ("en",),
           neardup_threshold: float = 0.85,
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full curation chain; returns the curated documents with stat columns."""
    d = quality_gate(docs, min_quality, text_col)
    d = language_filter(d, allowed_langs, text_col)
    d = drop_exact_duplicates(d, id_col, text_col)
    d = drop_near_duplicates(d, neardup_threshold, id_col, text_col)
    return d


def curation_summary(curated: DataFrame) -> DataFrame:
    """Per-language rollup of the curated corpus (tokens, quality, docs)."""
    return (
        curated.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )
