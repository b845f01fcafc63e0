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

    Chunk count is ceil(max(n - overlap, 1) / stride): a window stops
    being emitted once the PREVIOUS chunk already reached the document's
    end — the naive floor((n-1)/stride)+1 count emits a final chunk that
    is a strict subset of its predecessor whenever (n-1) % stride <
    overlap (~overlap/stride of all docs, 25% at the defaults), silently
    duplicating training text the rest of the pipeline works to dedupe.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    tokens = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda t: t != ""
    )
    n = F.size(tokens)
    # last start index: 0 when one chunk covers the doc (n <= chunk_tokens),
    # else floor((n - overlap - 1) / stride) — int-ranged, double div exact
    last = F.when(
        n > F.lit(chunk_tokens),
        F.floor((n - F.lit(overlap) - 1) / stride).cast("int"),
    ).otherwise(F.lit(0))
    starts = F.when(n > 0, F.sequence(F.lit(0), last)).otherwise(
        F.array().cast("array<int>")
    )

    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens.alias("_toks"),
        F.explode(starts).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return base.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int,
    order_col: str,
    id_col: str = "doc_id",
    len_col: str = "n_chunk_tokens",
    num_buckets: int = 32,
) -> DataFrame:
    """GPT-style concat-and-cut sequence packing → one row per
    (chunk, pack) assignment.

    Pretraining loaders consume FIXED-length sequences; the standard
    packing concatenates the corpus in a canonical order (pass
    ``order_col`` = e.g. indexing.deterministic_shuffle's shuffle_idx)
    into one token stream and cuts it every ``seq_len`` tokens — chunks
    may straddle a cut, so a chunk can land in several packs. For each
    assignment the output carries:

      pack_id         which sequence (0-based)
      offset_in_pack  where the slice starts inside the pack
      slice_start     0-based first token of the slice within the chunk
      slice_len       tokens contributed to this pack

    Every pack except the last holds exactly seq_len tokens (asserted in
    the pytest suite), the slices of one pack tile it exactly, and the
    whole mapping is a pure function of (ids, lengths, order) —
    partition-layout invariant — PROVIDED (order_col, id_col) totally
    orders the rows. With ties (e.g. many chunks per doc ordered only by
    a per-doc key) the prefix sum breaks them arbitrarily and pack
    assignments change between runs; callers must supply a unique
    tiebreaker (deliver.py builds `ord`; r24 uses chunk_uid).

    Scale shape: the only exchange is the order-aligned bucket window
    inside indexing.with_global_prefix_sum (never a SinglePartition
    window); the pack fan-out is a native sequence+explode Generate with
    per-row fan-out 1 + len/seq_len. Zero-length chunks contribute no
    tokens and are dropped.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from pdf_parser_spark.operators.indexing import with_global_prefix_sum

    base = chunks.filter(F.col(len_col) > 0)
    pos = with_global_prefix_sum(
        base, len_col, key=order_col, tiebreaker=id_col,
        num_buckets=num_buckets, out_col="_start", sum_type="long",
    )
    L = F.lit(seq_len).cast("long")
    start = F.col("_start").cast("long")
    length = F.col(len_col).cast("long")
    end = start + length
    # INTEGER division: floor(long / long) routes through a double and
    # loses exactness past 2^53 — exactly the corpus-token offsets the
    # prefix sum keeps as longs on purpose; `div` stays in long arithmetic
    p0 = F.expr(f"_start div {int(seq_len)}").cast("long")
    p1 = F.expr(f"(_start + {len_col} - 1) div {int(seq_len)}").cast("long")
    exploded = pos.select(
        "*", F.explode(F.sequence(p0, p1)).alias("pack_id")
    )
    pack_start = F.col("pack_id") * L
    slice_start = F.greatest(F.lit(0).cast("long"), pack_start - start)
    slice_end = F.least(length, pack_start + L - start)
    return (
        exploded.withColumn("offset_in_pack", F.greatest(F.lit(0).cast("long"), start - pack_start))
        .withColumn("slice_start", slice_start)
        .withColumn("slice_len", slice_end - slice_start)
        .drop("_start")
    )
