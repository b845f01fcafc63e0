"""Unigram language-model quality scoring — perplexity-style web-text gate.

CCNet-style corpus curation scores each document with a language model and
filters/buckets on perplexity (Wenzek et al. 2020 — public methodology).
The full KenLM is out of scope; the standard cheap stand-in with the same
pipeline shape is a unigram model: estimate add-one-smoothed token
probabilities from the corpus itself, then score each document by its mean
token log-probability (and report the perplexity form exp(-mean)).

Scale shape (10^12 docs):
- Model estimation is one token-keyed hash aggregation (map-side partials;
  word keys are Zipfian but partial aggregation absorbs the skew — the hot
  key arrives at the reducer once per map partition, not once per token).
- The fitted model is a VOCABULARY-sized table, not a corpus-sized one;
  scoring joins it back with a broadcast hash join, so the corpus is never
  shuffled by word. At web scale the vocabulary is capped to the top-V
  terms (`vocab_size`) and the tail scores as OOV with the smoothing floor
  1/(N+V) — exactly what add-one assigns an unseen word.
- Per-doc aggregation is the only corpus exchange, keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # THE shared tokenizer (textstats.words_expr) — LM scores must
    # tokenize like the rest of the pipeline
    from pdf_parser_spark.operators.textstats import words_expr

    words = words_expr(F.col(text_col))
    return docs.select(F.col(id_col).alias("doc_id"), words.alias("_w")).select(
        "doc_id", F.explode("_w").alias("word")
    )


def unigram_model(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  vocab_size: int | None = None) -> DataFrame:
    """(word, count, logp) — add-one-smoothed unigram log-probabilities.

    logp(w) = ln((c_w + 1) / (N + V)) with N = total tokens, V = distinct
    words (V of the FULL vocabulary even when the returned table is capped,
    so probabilities stay consistent as vocab_size varies).
    """
    tok = _tokens(docs, text_col, id_col)
    counts = tok.groupBy("word").agg(F.count("*").alias("count"))
    totals = counts.agg(
        F.sum("count").alias("_n"), F.count("*").alias("_v")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "word",
        "count",
        F.log((F.col("count") + 1) / (F.col("_n") + F.col("_v"))).alias("logp"),
    )
    if vocab_size is not None:
        model = model.orderBy(F.col("count").desc(), "word").limit(vocab_size)
    return model


def unigram_scores(docs: DataFrame, model: DataFrame | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   oov_logp: float | None = None) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, ppl) — mean token log-prob per doc.

    Empty documents score avg_logprob = 0, ppl = 1 (the empty product).
    When ``model`` is None it is fitted on ``docs`` itself (self-scoring:
    every token is in-vocabulary, so no OOV branch is needed). With a
    capped external model pass ``oov_logp`` (the smoothing floor
    ln(1/(N+V))) so out-of-vocabulary tokens are penalized instead of
    silently dropped from the mean.
    """
    self_fit = model is None
    if self_fit:
        model = unigram_model(docs, text_col, id_col)
    elif oov_logp is None:
        # all-OOV docs must not win: with logp NULL for every token, the
        # NULL-skipping avg coalesced to 0 scored pure gibberish at ppl 1 —
        # the best possible value. Default the OOV floor just below the
        # capped model's rarest word (~ the add-one floor ln(1/(N+V)):
        # min logp is ln((c_min+1)/(N+V)) with c_min >= 1).
        oov_logp = float(model.agg(F.min("logp")).first()[0]) - 0.6931471805599453
    tok = _tokens(docs, text_col, id_col)
    logp = F.col("logp")
    if oov_logp is not None:
        logp = F.coalesce(logp, F.lit(float(oov_logp)))
    # broadcast only a CAPPED external model: the self-fit model is the
    # full corpus vocabulary — billions of rows at 10^12 docs, far past
    # any broadcast limit; AQE picks the join for that side
    side = model.select("word", "logp")
    if not self_fit:
        side = F.broadcast(side)
    scored = (
        tok.join(side, "word", "left")
        .withColumn("logp", logp)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("logp").alias("_avg"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(scored, "doc_id", "left")
    avg = F.coalesce(F.col("_avg"), F.lit(0.0))
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.round(avg, 4).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def bigram_scores(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob2, ppl2) — mean ADJACENT-PAIR
    conditional log-prob per doc, the next step up from the unigram gate
    (CCNet's production filter is an n-gram LM; the bigram is the smallest
    model that scores word ORDER, so shuffled-word spam that fools the
    unigram gate scores badly here).

    Self-fit add-one model: P(b|a) = (c(a,b) + 1) / (c(a) + V) with V the
    distinct unigram vocabulary. Docs with < 2 tokens score 0 / ppl 1
    (the empty product).

    Scale shape: bigrams are row-local (two aligned slices zipped — one
    Generate); the model is one (a, b) hash aggregate with map-side
    partials decorated by the |vocab|-sized unigram counts; scoring joins
    the doc bigram stream to the model on (a, b) — an equi-join AQE
    broadcasts when the model is small and shuffles by the pair key when
    it is not (never a cross product, never Python).
    """
    from pdf_parser_spark.operators.textstats import words_expr

    words = words_expr(F.col(text_col))
    n = F.size("_w")
    pairs = F.arrays_zip(
        F.slice(F.col("_w"), 1, n - 1).alias("a"),
        F.expr("slice(_w, 2, size(_w) - 1)").alias("b"),
    )
    bi = (
        docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
        .filter(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    tok = _tokens(docs, text_col, id_col)
    uni = tok.groupBy(F.col("word").alias("a")).agg(F.count("*").alias("c_a"))
    # V as a one-row broadcast, not a driver-side count() — keeps the whole
    # operator lazy/plan-pure
    vdf = tok.agg(F.countDistinct("word").alias("_v"))
    model = (
        bi.groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .join(uni, "a")
        .crossJoin(F.broadcast(vdf))
        .select(
            "a", "b",
            F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.col("_v"))).alias("logp"),
        )
    )
    scored = (
        bi.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.avg("logp").alias("_avg"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    avg = F.coalesce(F.col("_avg"), F.lit(0.0))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(avg, 4).alias("avg_logprob2"),
        F.round(F.exp(-avg), 4).alias("ppl2"),
    )


def ppl_buckets(docs: DataFrame, n_buckets: int = 3,
                by: tuple[str, ...] = ("lang",), text_col: str = "text",
                id_col: str = "doc_id", approximate: bool = False,
                keep_score_cols: tuple[str, ...] = (),
                model: DataFrame | None = None,
                oov_logp: float | None = None) -> DataFrame:
    """CCNet-style perplexity bucketing: split each language's documents
    into equal head / middle / tail thirds by LM perplexity (Wenzek et al.
    2020 keep the head/middle for training — public methodology).

    Returns (doc_id, <by...>, ppl, bucket_id, bucket) with bucket_id in
    1..n_buckets (1 = lowest perplexity) and bucket named head/middle/tail
    when n_buckets == 3.

    Two modes:
    - exact (default): ntile over a per-group window ordered by
      (ppl, doc_id) — a total order, so the split is deterministic and
      SQL-oracle-checkable. The window partitions by language: few, huge
      partitions at 10^12 rows, so this mode is for bounded corpora.
    - approximate=True — the at-scale shape and what CCNet itself does
      (cutoffs from a sample): per-group percentile_approx cutoffs (a
      sketch aggregate, |groups| x (n_buckets-1) rows), broadcast back,
      bucket = 1 + #cutoffs below ppl. Zero windows; the corpus is never
      shuffled by group. Boundary rows may land one bucket off the exact
      split — the documented sketch trade.
    """
    # keep_score_cols: extra unigram_scores columns (e.g. n_tokens,
    # avg_logprob) carried through the bucketing — callers that need both
    # scores and buckets get them from ONE model fit instead of running
    # the token-aggregate twice (q47_lm_quality's shape)
    # model/oov_logp pass through to unigram_scores: the at-scale caller
    # fits ONE capped model offline (unigram_model(corpus, vocab_size=V))
    # and scores against it — self-fit here would broadcast the full
    # corpus vocabulary (see unigram_scores)
    scores = unigram_scores(docs, model=model, text_col=text_col,
                            id_col=id_col, oov_logp=oov_logp)
    keys = docs.select(F.col(id_col).alias("doc_id"), *by)
    joined = keys.join(
        scores.select("doc_id", "ppl", *keep_score_cols), "doc_id"
    )
    if approximate:
        # pin the scored table: the cutoff aggregate AND the bucket join
        # both consume it — without the barrier the whole tokenize + fit +
        # score chain runs twice (measured: the scoring subtrees appeared
        # twice in the executed plan), doubling the pipeline's dominant
        # CPU cost in exactly the mode documented as the at-scale shape
        joined = joined.localCheckpoint()
        probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
        cuts = joined.groupBy(*by).agg(
            F.percentile_approx("ppl", probs, 10_000).alias("_cuts")
        )
        bucket = (
            F.lit(1)
            + F.size(F.filter(F.col("_cuts"), lambda c: F.col("ppl") > c))
        ).cast("int")
        out = joined.join(F.broadcast(cuts), list(by)).withColumn(
            "bucket_id", bucket
        ).drop("_cuts")
    else:
        w = Window.partitionBy(*by).orderBy(
            F.col("ppl").asc(), F.col("doc_id").asc()
        )
        out = joined.withColumn("bucket_id", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        name = (
            F.when(F.col("bucket_id") == 1, "head")
            .when(F.col("bucket_id") == 2, "middle")
            .otherwise("tail")
        )
    else:
        name = F.concat(F.lit("b"), F.col("bucket_id").cast("string"))
    return out.select(
        "doc_id", *by, *keep_score_cols, "ppl", "bucket_id",
        name.alias("bucket"),
    )
