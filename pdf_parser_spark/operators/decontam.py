"""Benchmark decontamination — flag training docs that overlap an eval set.

Before a web corpus is used for training, documents sharing long word
n-grams with evaluation benchmarks must be flagged/removed, or downstream
eval numbers are meaningless (the standard n-gram-collision rule: GPT-3
appendix C, Dodge et al. 2021 C4 analysis — public methodology). The rule
here: a document is contaminated in proportion to the fraction of its
DISTINCT k-word-grams that appear anywhere in the eval set.

Scale shape (10^12 docs vs ~10^4-10^6 eval grams):
- The eval side is tiny by construction (benchmarks are small): its
  distinct-gram table is broadcast — the corpus is NEVER shuffled by gram.
- The corpus side explodes distinct k-grams (a Generate, row-local),
  broadcast-inner-joins the eval grams, and aggregates matches per doc_id —
  the only exchange is the per-doc match count, keyed by doc_id (uniform).
- Per-doc totals (`n_grams`) are computed row-locally from the gram array
  (size of array_distinct) — they never touch the join.
- Gram construction materializes the words array into a bound column before
  slicing (an element_at/slice over an unmaterialized split() inside a
  lambda re-evaluates the split per element — O(words²) regex work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words_col(text_col: str):
    # THE shared tokenizer (textstats.words_expr) — a tokenization fix
    # there must reach decontamination grams too
    from pdf_parser_spark.operators.textstats import words_expr

    return words_expr(F.col(text_col))


def with_kgrams(docs: DataFrame, k: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, _grams) — DISTINCT k-word-grams per document, row-local.

    Gram construction is the CPU-heavy stage of every caller, so the input
    is parallelism-guarded (operators/parallelism): a single-row-group
    parquet scan must not serialize it on one core."""
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    tokenized = docs.select(
        F.col(id_col).alias("doc_id"), _words_col(text_col).alias("_w")
    )
    wcol = F.col("_w")
    grams = F.when(
        F.size(wcol) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(wcol) - (k - 1)),
            lambda i: F.array_join(F.slice(wcol, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tokenized.select("doc_id", F.array_distinct(grams).alias("_grams"))


def contamination(docs: DataFrame, eval_docs: DataFrame, k: int = 5,
                  threshold: float = 0.2, text_col: str = "text",
                  id_col: str = "doc_id",
                  bloom_bits: int | None = None) -> DataFrame:
    """Per-document contamination vs the eval set's k-gram inventory.

    Returns (doc_id, n_grams, n_matched, contamination_frac,
    is_contaminated). ``n_grams`` counts the doc's distinct k-grams;
    ``n_matched`` those also present in ANY eval document;
    ``is_contaminated`` applies the fraction threshold.

    Two physical shapes for the gram membership test:
    - bloom_bits=None (default): the eval gram inventory broadcasts as a
      hash table — right whenever the eval set is benchmark-sized (the
      common case: a few million grams).
    - bloom_bits=N: the HUGE-eval-set path (an eval inventory of 10^9
      grams overflows a broadcast hash table): a Bloom bitmap over the
      eval grams is built with the tree-reduced distributed OR
      (operators/bloom, ~10 bits/gram for 1% FPR), corpus grams that are
      definitely-not-in drop BEFORE any join, and only possible hits
      (true matches + FPR stragglers) go through the exact — now
      shuffle-shaped — gram join. Result-identical (the filter is
      conservative and the exact join decides); pytest asserts parity
      with a deliberately tiny, collision-heavy bitmap.
    """
    corpus = with_kgrams(docs, k, text_col, id_col)
    eval_grams = (
        with_kgrams(eval_docs, k, text_col, id_col)
        .select(F.explode("_grams").alias("gram"))
        .distinct()
    )
    if bloom_bits is not None:
        from pdf_parser_spark.operators import bloom

        # the bloom path needs the gram stream in two shapes (the probe
        # filter feeds the exact join; totals are per-doc) — persist the
        # gram arrays so the distinct-k-gram construction, the chain's
        # dominant CPU stage, runs once instead of twice
        corpus = corpus.persist()
        exploded = corpus.select("doc_id", F.explode("_grams").alias("gram"))
        exploded = bloom.with_bloom_probe(exploded, "gram", bloom.build_bloom(
            eval_grams, "gram", n_bits=bloom_bits
        )).filter(F.col("_bloom_maybe")).drop("_bloom_maybe")
        matched = (
            exploded.join(eval_grams, "gram")  # exact; no broadcast hint
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matched"))
        )
        totals = corpus.select(
            "doc_id", F.size("_grams").cast("long").alias("n_grams")
        )
        out = totals.join(matched, "doc_id", "left").select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
        )
        # release the per-doc gram-array cache HERE instead of leaking it
        # into the session (the caller never sees `corpus`). The checkpoint
        # stores 4 scalars per doc — no heavier than the doc-keyed exchange
        # the aggregate above already paid — mirroring bigram_pmi/bm25.
        out = out.localCheckpoint()
        corpus.unpersist()
    else:
        # ONE gram pass: hits are decorated by a broadcast LEFT join and
        # counted in the same doc-keyed aggregate as the totals (partial
        # aggregation collapses the gram stream map-side — the exchange
        # carries ~one row per doc). The old two-branch shape evaluated
        # the distinct-k-gram construction twice per corpus document.
        exploded = corpus.select("doc_id", F.explode("_grams").alias("gram"))
        scored = exploded.join(
            F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left"
        )
        agg = scored.groupBy("doc_id").agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_matched"),
        )
        # docs with zero grams (shorter than k words) never explode a row
        base = docs.select(F.col(id_col).alias("doc_id"))
        out = base.join(agg, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
        )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_grams",
        "n_matched",
        F.round(frac, 4).alias("contamination_frac"),
        (F.round(frac, 4) >= threshold).alias("is_contaminated"),
    )
