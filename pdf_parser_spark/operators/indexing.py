"""Scalable global row numbering — contiguous ids in a total order.

The naive formulation, ``row_number() OVER (ORDER BY …)`` with no
partition, forces every row through ONE task (Spark emits a
SinglePartition Window — the classic bottleneck; at 10^12 rows it simply
never finishes). This module produces the identical result with an
order-aligned bucketing scheme:

1. sample approximate quantiles of the leading sort key (driver gets ≤
   ``num_buckets`` doubles — a sketch aggregation, no shuffle);
2. assign each row a bucket with a LITERAL boundary-array expression
   (`size(filter(bounds, b -> key > b))`) — pure codegen, and because the
   bucket is a deterministic *function of the key*, every job that
   computes it agrees by construction (nothing to persist, no
   partition-id nondeterminism);
3. per-bucket ``row_number`` — the single hash exchange of the data;
4. per-bucket counts → prefix-sum offsets (≤ num_buckets tiny rows to the
   driver) → broadcast join back on the bucket id.

Correctness needs only that the bucketing is order-aligned (key in a
higher-ranked bucket ⇒ ranks before every lower bucket) and that tied
keys share a bucket — both hold for any boundary set, so the approximate
quantiles affect balance, never the result. The output equals the
single-partition window's, row for row, at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    key: str,
    tiebreaker: str,
    ascending: bool = True,
    num_buckets: int = 32,
    out_col: str = "global_idx",
) -> DataFrame:
    """Adds ``out_col``: the 1-based rank of each row in the total order
    ``(key asc|desc, tiebreaker asc)``.

    ``key`` must be numeric (boundaries come from `approxQuantile`); null
    keys rank where Spark's window defaults put them (asc ⇒ first,
    desc ⇒ last), preserving the row-for-row window parity;
    ``tiebreaker`` must make the order total (a unique id). Heavily-skewed
    keys (one value dominating) collapse into one bucket — the window then
    degrades toward the single-task sort for that value only.
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(key, probs, 0.001)))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    kcol = F.col(key).cast("double")
    # null keys: approxQuantile ignores them and the filter lambda would
    # drop every bound (null predicate), landing them in bucket 0 — wrong
    # for desc. Route them where Spark's window defaults put them:
    # asc ⇒ NULLS FIRST ⇒ bucket 0 (which asc already yields); desc ⇒
    # NULLS LAST ⇒ the final bucket, explicitly.
    if ascending:
        bucket = F.size(F.filter(barr, lambda b: kcol > b))
        key_order = F.col(key).asc()
    else:
        bucket = F.when(kcol.isNull(), F.lit(len(bounds))).otherwise(
            F.size(F.filter(barr, lambda b: kcol < b))
        )
        key_order = F.col(key).desc()

    with_b = df.withColumn("_bucket", bucket)

    w = Window.partitionBy("_bucket").orderBy(key_order, F.col(tiebreaker).asc())
    local = with_b.withColumn("_local", F.row_number().over(w))

    # ≤ num_buckets rows — tiny by construction
    counts = sorted(
        (r["_bucket"], r["n"])
        for r in with_b.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        if n >= (1 << 31):
            # row_number() is 32-bit: a bucket past 2^31-1 rows wraps the
            # local rank before the long cast — wrong indices, silently.
            # The per-bucket counts are already on the driver, so guard
            # here instead: resize num_buckets so buckets stay bounded.
            raise ValueError(
                f"bucket {b} holds {n} rows >= 2^31 (row_number is 32-bit):"
                f" raise num_buckets (~{acc + n} total rows need"
                f" >= {(acc + n) // (1 << 31) + 1} buckets minimum)"
            )
        offsets.append((b, acc))
        acc += n
    off_df = df.sparkSession.createDataFrame(offsets, "_bucket int, _offset long")

    return (
        local.join(F.broadcast(off_df), "_bucket")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("long"))
        .drop("_bucket", "_local", "_offset")
    )


def with_global_prefix_sum(
    df: DataFrame,
    weight_col: str,
    key: str,
    tiebreaker: str,
    ascending: bool = True,
    num_buckets: int = 32,
    out_col: str = "prefix_sum",
    sum_type: str = "double",
) -> DataFrame:
    """Adds ``out_col``: the EXCLUSIVE global prefix sum of ``weight_col``
    in the total order ``(key asc|desc, tiebreaker asc)`` — the sum of the
    weights of all strictly-preceding rows (first row gets 0).

    Same order-aligned bucket scheme as with_global_index — the naive
    ``sum() OVER (ORDER BY …)`` with no partition is a SinglePartition
    window: per-bucket running-sum window (the one hash exchange),
    per-bucket weight totals prefix-folded on the driver (≤ num_buckets
    tiny rows), broadcast-joined back. Row-for-row equal to the global
    window at any cluster size. ``key`` must be numeric and non-null;
    ``weight_col`` numeric, summed as ``sum_type`` — pass "long" for
    integer weights whose running totals must stay EXACT (token
    positions: a double sum loses integer precision past 2^53, which a
    10^12-doc corpus's token count can exceed).
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(key, probs, 0.001)))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    kcol = F.col(key).cast("double")
    # same null routing as with_global_index (the sibling had this fixed
    # and this copy had silently diverged): desc ⇒ NULLS LAST ⇒ the final
    # bucket; asc ⇒ bucket 0, which the filter already yields
    if ascending:
        bucket = F.size(F.filter(barr, lambda b: kcol > b))
        key_order = F.col(key).asc()
    else:
        bucket = F.when(kcol.isNull(), F.lit(len(bounds))).otherwise(
            F.size(F.filter(barr, lambda b: kcol < b))
        )
        key_order = F.col(key).desc()

    with_b = df.withColumn("_bucket", bucket)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(key_order, F.col(tiebreaker).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wsum = F.col(weight_col).cast(sum_type)
    local = with_b.withColumn("_incl", F.sum(wsum).over(w))

    totals = sorted(
        (r["_bucket"], r["t"])
        for r in with_b.groupBy("_bucket")
        .agg(F.sum(wsum).alias("t"))
        .collect()
    )
    integral = sum_type in ("long", "int", "bigint")
    zero = 0 if integral else 0.0
    offsets, acc = [], zero
    for b, t in totals:
        offsets.append((b, acc))
        acc += (t or zero)
    off_df = df.sparkSession.createDataFrame(
        offsets, f"_bucket int, _woff {'bigint' if integral else 'double'}"
    )

    return (
        local.join(F.broadcast(off_df), "_bucket")
        # coalesce the row's own weight: the window sum skips NULL weights
        # (so _incl already equals the preceding sum for such a row), but
        # subtracting a NULL wsum would null the whole exclusive sum —
        # violating the single-window-parity contract, whose row gets the
        # preceding rows' total
        .withColumn(
            out_col,
            F.col("_woff") + F.col("_incl")
            - F.coalesce(wsum, F.lit(0).cast(sum_type)),
        )
        .drop("_bucket", "_incl", "_woff")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_buckets: int = 32,
    out_col: str = "shuffle_idx",
) -> DataFrame:
    """Deterministic global corpus shuffle with contiguous 1-based
    positions — the training-data ordering step.

    Pretraining loaders need the corpus in a reproducible pseudorandom
    order (epoch order must not depend on file layout, partition count, or
    task scheduling). Rank key = the 52-bit integer folded from
    md5(seed:id) (pdf_parser_spark.operators.sampling.uniform_hash_col's
    integer form): a pure function of (seed, id), so the permutation is
    identical on any cluster and re-derivable per row.

    Scale shape: the key is a zero-exchange projection and the ranking
    reuses with_global_index's order-aligned bucket scheme — per-bucket
    row_number + prefix-sum offsets, never a single-partition window. The
    key is near-uniform on [0, 2^52), so buckets are balanced by
    construction (no skew caveat).
    """
    from pdf_parser_spark.operators.sampling import uniform_hash_col

    key = uniform_hash_col(id_col, seed) * F.lit(float(1 << 52)) - F.lit(1.0)
    with_key = df.withColumn("_shuffle_key", key)
    out = with_global_index(
        with_key,
        key="_shuffle_key",
        tiebreaker=id_col,
        ascending=True,
        num_buckets=num_buckets,
        out_col=out_col,
    )
    return out.drop("_shuffle_key")


def postings(docs: DataFrame, top_k: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Capped inverted-index postings: per term, its document frequency and
    the top_k documents by term frequency (ties → smaller doc id).

    The standard search-index build reduced to relational form (public
    shape: Lucene/ES postings with impact-ordered truncation): explode
    tokens → (term, doc, tf) hash aggregate with map-side partials →
    per-term top-k. Returns (term, df_docs, rank, doc_id, tf).

    Scale shape: the (term, doc) aggregate is the only full-corpus
    exchange; df and the top-k both reuse its output keyed by term (one
    more |vocab×docs|→|vocab| exchange), and the rank window carries a
    WindowGroupLimit so each partition keeps only top_k candidates per
    term before the shuffle. Zipfian terms spread first across the
    (term, doc) composite key, which salting can't improve on.
    """
    from pdf_parser_spark.operators.textstats import words_expr

    words = words_expr(F.col(text_col))
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_docs = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
    return top.join(df_docs, "term").select(
        "term", "df_docs", "rank", "doc_id", "tf"
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Robertson &
    Zaragoza 2009; the Lucene/ES practical-scoring idf variant) —
    returns (rank, doc_id, score, n_matched), scores descending, ties by
    doc id.

    Scale shape: the token stream is filtered to the QUERY terms before
    anything aggregates, so the (term, doc) exchange carries only
    matching occurrences — the corpus-wide vocabulary never shuffles.
    Document length is computed only for candidate docs (those matching
    at least one term) via a semi join back to the corpus. Corpus N and
    avgdl are two scalars (one tiny aggregate). The final top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    from pdf_parser_spark.operators.textstats import words_expr

    words = words_expr(F.col(text_col))
    # persist the tokenized corpus: it feeds THREE consumers (the N/avgdl
    # scalars, the query-term hits, the candidate doc lengths) — without
    # the pin each one re-runs the full tokenization over every document.
    # materialize=True (default) checkpoints the <= k result rows and
    # releases the cache before returning; pass False to inspect the lazy
    # plan (plan-contract tests), owning the cache until evaluation.
    base = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("_words")
    ).persist()

    # two corpus scalars: N and average doc length
    stats = base.agg(
        F.count(F.lit(1)).alias("N"),
        F.avg(F.size("_words")).alias("avgdl"),
    ).first()
    n_docs, avgdl = float(stats["N"]), float(stats["avgdl"] or 0.0)

    hits = (
        base.select("doc_id", F.explode("_words").alias("term"))
        .filter(F.col("term").isin(terms))   # before the exchange
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_docs = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))

    dl = base.join(
        hits.select("doc_id").distinct(), "doc_id", "left_semi"
    ).select("doc_id", F.size("_words").alias("dl"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl if avgdl else 1.0)
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom

    scored = (
        hits.join(F.broadcast(df_docs), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", F.round("score", 6).alias("score"), "n_matched"
    )
    if not materialize:
        base.unpersist()  # caller owns evaluation; plan recomputes base
        return ranked
    result = ranked.localCheckpoint()
    base.unpersist()
    return result
