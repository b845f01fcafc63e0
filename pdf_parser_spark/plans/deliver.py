"""End-to-end delivery: raw documents → curated corpus → packed
sequences → loader-ready shard files.

The last mile plans/pretrain.py stops short of: its `chunks` output
still needs packing into fixed-length sequences and writing as
deterministic, resumable shard files before a trainer can map ranks to
byte ranges. This plan chains the three audited pieces:

    pretrain_corpus (curate → gate → dedup → decontam → ppl → shuffle
                     → chunk)                          plans/pretrain.py
  → pack_sequences  (concat-and-cut at seq_len; order-aligned prefix
                     sum, no single-task window)       operators/chunking.py
  → pack assembly   (per-pack slice stitch — groups bounded by seq_len
                     tokens, so the collect_list is constant-sized)
  → export_shards   (one file per shard, manifest w/ checksums, exact
                     crash resume)                     sources/shards.py

Determinism end to end: every stage is a pure function of (rows,
params, seed), so a re-run — or a resume after a crash during the shard
write — produces byte-identical shard files.

The pack order key is ``shuffle_idx * 2^20 + chunk_idx``; documents
above 2^20 chunks would collide (at the default 50-token stride that is
a ~50M-token document — reject loudly rather than silently misorder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import chunking as chunking_op
from pdf_parser_spark.plans import pretrain
from pdf_parser_spark.sources import shards as shards_op

_CHUNK_LIMIT = 1 << 20


def assemble_packs(packed: DataFrame) -> DataFrame:
    """(chunk, pack) assignments → one row per pack: (pack_id,
    pack_text, n_tokens). Slices stitch in offset order; each group
    holds at most seq_len tokens by construction, so the per-pack
    collect_list is constant-sized regardless of corpus size."""
    toks = F.split(F.col("chunk_text"), " ")
    piece = F.array_join(
        F.slice(
            toks,
            F.col("slice_start").cast("int") + 1,
            F.col("slice_len").cast("int"),
        ),
        " ",
    )
    return packed.groupBy("pack_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("offset_in_pack"), piece.alias("p")))
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("pack_text"),
        F.sum("slice_len").alias("n_tokens"),
    )


def deliver_training_data(
    docs: DataFrame,
    shard_root: str,
    eval_docs: DataFrame | None = None,
    seq_len: int = 128,
    rows_per_shard: int = 512,
    num_buckets: int = 16,
    **pretrain_kwargs,
) -> dict:
    """Run the full chain and write shards under ``shard_root``.

    Returns {"funnel": DataFrame, "kept": the post-filter documents
    (for downstream stats/reporting), "packs": the assembled pack table
    (checkpointed), "shards": export summary dict}. Safe to re-run after
    any crash: the pipeline is deterministic and export_shards never
    rewrites a committed shard."""
    out = pretrain.pretrain_corpus(docs, eval_docs=eval_docs, **pretrain_kwargs)
    chunks = out["chunks"]

    # the over-limit guard rides inside the ord expression (raise_error in
    # the taken branch), so it costs nothing — a separate isEmpty() probe
    # would re-run the whole chunk fan-out just to check
    with_ord = chunks.withColumn(
        "ord",
        F.when(
            F.col("chunk_idx") >= _CHUNK_LIMIT,
            F.raise_error(
                F.lit(
                    "document with >= 2^20 chunks: the pack order key "
                    "would collide — split the document upstream"
                )
            ).cast("long"),
        ).otherwise(
            F.col("shuffle_idx").cast("long") * F.lit(_CHUNK_LIMIT)
            + F.col("chunk_idx")
        ),
    )
    packed = chunking_op.pack_sequences(
        with_ord, seq_len=seq_len, order_col="ord", id_col="ord",
        num_buckets=num_buckets,
    )
    packs = assemble_packs(packed).localCheckpoint()  # two consumers below

    summary = shards_op.export_shards(
        packs, shard_root, order_key="pack_id", tiebreaker="pack_id",
        rows_per_shard=rows_per_shard, token_col="n_tokens",
        num_buckets=num_buckets,
    )
    return {
        "funnel": out["funnel"],
        "kept": out["kept"],
        "packs": packs,
        "shards": summary,
    }
