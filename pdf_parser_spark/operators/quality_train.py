"""Trained quality filtering + DSIR importance resampling, set-based.

Two standard pretraining-corpus curation steps beyond heuristic scoring
(textstats.quality_score_col) — both from public methodology:

- A TRAINED quality classifier (the C4/GPT-3-style filter: logistic
  regression over hashed bag-of-words, "does this page look like the
  curated corpus?"), implemented as pure relational algebra: features are
  a (doc_id, feat, val) exploded table, the per-doc margin is a broadcast
  join + groupBy(doc) sum, the gradient is a groupBy(feat) sum, and the
  driver holds only the (sparse) weight vector between iterations. No
  MLlib, no per-row Python — every iteration is two shuffles whose keys
  (doc_id, feat) are bounded-fanout, and the driver's share is O(nnz
  weights), independent of corpus size.

- DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
  public): fit hashed unigram distributions on a TARGET corpus and the
  RAW corpus, weight each raw document by its log likelihood ratio, and
  resample with probability ∝ weight. The ratio model is a broadcast
  table of n_features rows; scoring is one broadcast join + one doc-keyed
  aggregate; the resample composes with sampling.weighted_priority_sample
  (Duffield–Lund–Thorup priority sampling — deterministic, mergeable
  top-k, no global sort).

Feature hashing (the "hashing trick", Weinberger et al. 2009, public):
feat = pmod(xxhash64(word), n_features) — computed natively, so the
Python layer never sees a token.

Scale notes: the feature table is the only large intermediate — persist
it across training iterations (train_quality_classifier does). Weights
travel driver→executors as a broadcast JOIN TABLE, not a closure, so the
n_features ceiling is the broadcast limit (~10^7 rows), far above the
2^18 default. Gradient collect is sparse: only features present in the
corpus come back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators.sampling import weighted_priority_sample

DEFAULT_FEATURES = 1 << 18
_INTERCEPT = -1  # reserved feat id for the bias term (pmod output is >= 0)


def _words(text_col: str):
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )


def hashed_features(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_features: int = DEFAULT_FEATURES,
                    binary: bool = False) -> DataFrame:
    """(doc_id, feat, val) — hashed bag-of-words.

    val = count(word hashes to feat) / n_tokens(doc) (L1-normalized,
    default), or 1.0 for presence when ``binary=True`` — binarized
    features keep every feature on the same O(1) scale, which plain
    gradient descent needs to reach a discriminative weight in few
    iterations (an L1-normalized rare word sits at ~1/n_tokens, so its
    weight must grow ~n_tokens× larger for the same margin). Plus one
    intercept row (feat = -1, val = 1.0) per non-empty document, so a
    linear model over this table has a bias without special-casing.
    Empty documents produce no rows (they score sigmoid(0) = 0.5
    downstream).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(text_col)).alias("word")
    ).select(
        "doc_id",
        F.pmod(F.xxhash64("word"), F.lit(n_features)).cast("long").alias("feat"),
    )
    counts = tok.groupBy("doc_id", "feat").agg(
        F.count("*").cast("double").alias("_c")
    )
    totals = counts.groupBy("doc_id").agg(F.sum("_c").alias("_n"))
    val = F.lit(1.0) if binary else (F.col("_c") / F.col("_n"))
    feats = counts.join(totals, "doc_id").select("doc_id", "feat", val.alias("val"))
    intercept = totals.select(
        "doc_id",
        F.lit(_INTERCEPT).cast("long").alias("feat"),
        F.lit(1.0).alias("val"),
    )
    return feats.unionByName(intercept)


def score_documents(features: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, margin, prob) — margin = Σ w_feat · val, prob = σ(margin).

    ``weights`` is a (feat, weight) table, broadcast: scoring is one
    broadcast join + one doc-keyed partial-aggregable sum — no wide
    shuffle, no Python. Features absent from the weight table contribute
    0 (join miss → coalesce), so a sparse model scores exactly.
    """
    joined = features.join(
        F.broadcast(weights.select("feat", "weight")), "feat", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum(
                F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("val")
            ).alias("margin")
        )
        .select(
            "doc_id",
            "margin",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("prob"),
        )
    )


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Full-batch logistic regression by relational algebra → (feat, weight).

    Per iteration (all native, deterministic given the data):
      1. margins: broadcast-join current weights onto the feature table,
         groupBy(doc_id) sum                                 [shuffle 1]
      2. residuals: r_d = σ(margin_d) − y_d (projection, no exchange)
      3. gradient: g_f = Σ_d r_d · val_{d,f} / n_docs via groupBy(feat)
         over the features table joined to residuals         [shuffle 2]
      4. driver: w ← w − lr · (g + l2 · w), sparse dict update

    The features table is persisted here (re-read every iteration); the
    driver never holds anything larger than the nonzero weight vector.
    Labels are 0/1 doubles keyed by doc_id. Gradient descent over a
    convex loss with a fixed iteration count is a pure function of the
    input — single-node numpy parity is asserted in the pytest suite.
    """
    spark = features.sparkSession
    feats = features.persist()
    lab = labels.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("_y")
    )
    n_docs = lab.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: empty label table")

    w: dict[int, float] = {}
    schema = "feat long, weight double"
    for _ in range(iters):
        if w:
            wdf = spark.createDataFrame(sorted(w.items()), schema)
        else:
            wdf = spark.createDataFrame([], schema)
        margins = score_documents(feats, wdf)
        resid = margins.join(lab, "doc_id").select(
            "doc_id", (F.col("prob") - F.col("_y")).alias("_r")
        )
        grad_rows = (
            feats.join(resid, "doc_id")
            .groupBy("feat")
            .agg((F.sum(F.col("_r") * F.col("val")) / F.lit(float(n_docs))).alias("_g"))
            .collect()
        )
        for row in grad_rows:
            f = int(row["feat"])
            g = float(row["_g"]) + l2 * w.get(f, 0.0)
            nw = w.get(f, 0.0) - lr * g
            if nw == 0.0:
                w.pop(f, None)
            else:
                w[f] = nw
    feats.unpersist()
    return spark.createDataFrame(sorted(w.items()), schema)


def dsir_ngram_model(docs: DataFrame, text_col: str = "text",
                     n_features: int = DEFAULT_FEATURES,
                     alpha: float = 1.0) -> DataFrame:
    """(feat, logp) — add-α smoothed hashed unigram log-probabilities.

    logp(f) = ln((c_f + α) / (N + α·n_features)) — the full n_features
    bucket space is the smoothing denominator, so target and raw models
    with different support stay comparable. The table has at most
    n_features rows (broadcastable); buckets with zero count are NOT
    materialized — consumers fold the floor ln(α / (N + α·n_features))
    in via coalesce (dsir_log_ratios does).
    """
    tok = docs.select(F.explode(_words(text_col)).alias("word")).select(
        F.pmod(F.xxhash64("word"), F.lit(n_features)).cast("long").alias("feat")
    )
    counts = tok.groupBy("feat").agg(F.count("*").cast("double").alias("_c"))
    total = counts.agg(F.sum("_c").alias("_n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "feat",
        F.log(
            (F.col("_c") + F.lit(alpha))
            / (F.col("_n") + F.lit(alpha * n_features))
        ).alias("logp"),
    )


def _model_floor(docs: DataFrame, text_col: str,
                 n_features: int, alpha: float) -> float:
    """ln(α / (N + α·n_features)) — the zero-count bucket's smoothed logp.

    One scalar aggregate (sum of per-doc token counts, no explode)."""
    n = docs.agg(
        F.sum(F.size(_words(text_col))).alias("n")
    ).first()["n"] or 0
    return math.log(alpha) - math.log(float(n) + alpha * n_features)


def dsir_log_ratios(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_features: int = DEFAULT_FEATURES,
                    alpha: float = 1.0) -> DataFrame:
    """(doc_id, n_tokens, log_ratio) — DSIR importance log-weights.

    log_ratio(d) = Σ_tokens [ logp_target(feat) − logp_raw(feat) ], the
    hashed-unigram log likelihood ratio of Xie et al. 2023. Both models
    are broadcast (≤ n_features rows each); scoring the raw corpus is one
    projection + two broadcast joins + one doc-keyed aggregate — the raw
    corpus itself is never shuffled by anything wider than doc_id.
    """
    t_model = dsir_ngram_model(target, text_col, n_features, alpha)
    r_model = dsir_ngram_model(raw, text_col, n_features, alpha)
    # fold each model's zero-count floor in at join time
    t_floor = _model_floor(target, text_col, n_features, alpha)
    r_floor = _model_floor(raw, text_col, n_features, alpha)
    tok = raw.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(text_col)).alias("word")
    ).select(
        "doc_id",
        F.pmod(F.xxhash64("word"), F.lit(n_features)).cast("long").alias("feat"),
    )
    scored = (
        tok.join(F.broadcast(t_model.select("feat", F.col("logp").alias("_lt"))),
                 "feat", "left")
        .join(F.broadcast(r_model.select("feat", F.col("logp").alias("_lr"))),
              "feat", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("_lt"), F.lit(t_floor))
                - F.coalesce(F.col("_lr"), F.lit(r_floor))
            ).alias("log_ratio"),
        )
    )
    base = raw.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("log_ratio"), F.lit(0.0)).alias("log_ratio"),
    )


def dsir_resample(raw: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_features: int = DEFAULT_FEATURES,
                  alpha: float = 1.0, seed: int | None = None,
                  temperature: float = 1.0) -> DataFrame:
    """Keep the k raw docs importance-resampled toward the target corpus.

    weight(d) = exp(log_ratio(d) / (temperature · max(1, n_tokens(d))))
    — the PER-TOKEN likelihood ratio, so long documents do not dominate
    purely by length — fed to priority sampling (deterministic in
    (ids, weights, seed); TakeOrderedAndProject plan, no global sort).
    Returns (doc_id, n_tokens, log_ratio, weight) for the kept docs.
    """
    scored = dsir_log_ratios(raw, target, text_col, id_col, n_features, alpha)
    weighted = scored.withColumn(
        "weight",
        F.exp(
            F.col("log_ratio")
            / (F.lit(float(temperature)) * F.greatest(F.lit(1.0), F.col("n_tokens").cast("double")))
        ),
    )
    return weighted_priority_sample(
        weighted, "weight", k, id_col="doc_id", seed=seed
    ).drop("priority")
