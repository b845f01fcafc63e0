"""Fixed-size token chunking with overlap — the training-data shard step.

LLM pipelines split long documents into ~context-window-sized chunks with a
small overlap so no span is ever cut without context. The rule here is the
standard sliding window: chunk *i* covers tokens
``[i·stride, i·stride + chunk_tokens)`` with ``stride = chunk_tokens −
overlap``, for every start strictly inside the document. Deterministic —
chunk boundaries depend only on the token sequence, never on partitioning.

Scale shape: one native projection building the start-index array
(`sequence`), one `posexplode` — a Generate with bounded fan-out
(≈ n_tokens / stride per doc), no shuffle at all. Chunk text is sliced from
the token array JVM-side (`slice` + `array_join`); no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): `chunk_idx`, `n_chunk_tokens`, `chunk_text`.

    Tokens are whitespace-split words; empty documents produce no rows. The
    final chunk may be shorter than ``chunk_tokens`` (it still starts at a
    stride boundary < n_tokens, so every token is covered at least once).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    tokens = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda t: t != ""
    )
    n = F.size(tokens)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int")),
    ).otherwise(F.array().cast("array<int>"))

    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_i"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_i") * stride + 1, chunk_tokens)
    return base.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
