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

Near-dup drop rule: transitive by default — iterative min-label connected
components over the verified pair graph (one survivor per duplicate
CLUSTER, even for chained duplicates A~B, B~C with A≁C), falling back to
the cheap one-pass union-by-min (`transitive=False`) where a single
band-join pass is preferred. The component iteration runs only over the
pair graph (docs that appear in at least one verified pair — a small
fraction of the corpus), converges in O(cluster diameter) joins, and is
lineage-truncated per iteration. Deterministic and order-free either way.
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


def neardup_components(pairs: DataFrame, max_iters: int = 15) -> DataFrame:
    """Connected components over a (a_id, b_id) pair graph → (doc_id, component).

    Delegates to operators/linkgraph.connected_components (large-star/
    small-star contraction, O(log n) rounds, localCheckpoint per round);
    the component label is the MINIMUM doc_id — a deterministic canonical
    survivor. Operates only on vertices that appear in a pair (a small
    fraction of the corpus). strict=True: an unconverged refinement would
    silently KEEP extra near-duplicates downstream, so exhaustion raises
    instead of warning.
    """
    from pdf_parser_spark.operators import linkgraph

    comp = linkgraph.connected_components(
        pairs, src="a_id", dst="b_id", max_iters=max_iters, strict=True
    )
    return comp.select(F.col("node").alias("doc_id"), "component")


def drop_near_duplicates(docs: DataFrame, threshold: float = 0.85,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         transitive: bool = True) -> DataFrame:
    """Remove near-duplicates, keeping one survivor per duplicate cluster.

    transitive=True (default): connected components over the verified pair
    graph; the survivor is the minimum id of each component, so chained
    duplicates (A~B, B~C, A≁C) keep exactly ONE of {A,B,C}. transitive=False
    is the cheap one-pass union-by-min (drop the larger id of every pair) —
    identical result on clusters whose every member pairs with the minimum,
    but a chain fragment can survive it.
    """
    # Persist the band table: the candidate self-join references it on BOTH
    # sides, and each evaluation re-runs the MinHash-signature pandas UDF
    # over the full input. Serialized cache = one signature pass, two cheap
    # scans. (doc_id, band, band_hash) is ~24 bytes/row × bands — orders
    # of magnitude smaller than the corpus it indexes. Banding follows the
    # verify threshold (dedupe.lsh_plan), same as near_duplicates_minhash —
    # a fixed 16×4 here leaked ~11% of true pairs at threshold 0.6.
    from pyspark import StorageLevel

    n_bands = dedupe_op.lsh_plan(threshold)["bands"]
    bands = dedupe_op.minhash_band_table(docs, id_col, text_col, n_bands).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = dedupe_op.minhash_candidate_pairs(bands)
    pairs = dedupe_op.verify_jaccard(cands, docs, threshold, id_col, text_col)
    if transitive:
        # The component iteration derives its edge list from pairs twice
        # (forward + reversed union) — persist so the verify UDF runs once.
        # neardup_components is eager (per-round counts), so both caches can
        # be dropped as soon as it returns its localCheckpoint'd labels.
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        comp = neardup_components(pairs)
        losers = comp.filter(F.col("doc_id") != F.col("component")).select(
            F.col("doc_id").alias("_lose_id")
        )
        pairs.unpersist()
        bands.unpersist()
    else:
        # lazy path: pairs is consumed once; bands stays cached for the two
        # lazy self-join scans (LRU-evicted / cleared with the session).
        losers = pairs.select(F.col("b_id").alias("_lose_id")).distinct()
    return docs.join(losers, docs[id_col] == losers["_lose_id"], "left_anti")


def curate(docs: DataFrame, min_quality: float = 0.5,
           allowed_langs: tuple[str, ...] = ("en",),
           neardup_threshold: float = 0.85,
           id_col: str = "doc_id", text_col: str = "text",
           cache: bool = True) -> DataFrame:
    """Full curation chain; returns the curated documents with stat columns.

    Two serialized persist barriers (cache=True): after the language filter
    (the Arrow-batched lang-ID UDF is the chain's expensive narrow stage,
    and everything downstream references its output repeatedly) and after
    exact dedup (the near-dup stage references ITS output four times — band
    table, both verify sides, final anti-join; without the barrier each
    reference replays the semi-join shuffle). Same rationale and storage
    level as plans/pipeline.transactions_pipeline: serialized blocks keep
    the cached working set compact and GC-stable. In the resumable
    production job these barriers are the per-bucket table commits
    (plans/checkpoint.py); persist is their single-job analog.
    """
    from pyspark import StorageLevel

    d = quality_gate(docs, min_quality, text_col)
    d = language_filter(d, allowed_langs, text_col)
    if cache:
        d = d.persist(StorageLevel.MEMORY_AND_DISK)
    d = drop_exact_duplicates(d, id_col, text_col)
    if cache:
        d = d.persist(StorageLevel.MEMORY_AND_DISK)
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
