"""Text-analysis operators for training-data pipelines over `documents`.

Language-ID, quality scoring, token counting, document fingerprinting — the
operations a web-scale corpus pipeline runs after extraction. Everything
except language-ID is pure native expressions (codegen, no Python); lang-ID
is an Arrow-batched pandas UDF over a constant stopword profile.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# tiny deterministic stopword profiles for the language-ID heuristic
# (public-knowledge approach: character/function-word profiles à la
# Cavnar-Trenkle n-gram classification, trimmed to function words)
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in is it that for on with as are this".split()),
    "es": frozenset("el la de que y en los se del las un por con una es".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui".split()),
    "zh": frozenset(),  # CJK detected by script, not words
}

_CJK_RE = re.compile(r"[一-鿿]")
_TOKEN_RE = re.compile(r"\s+")


def words_expr(text):
    """THE shared word tokenizer: lowercased, whitespace-split, empties
    dropped. Every operator documented as sharing tokenization
    (postings, BM25, PMI, repetition) builds on this one expression, so
    a tokenization fix lands everywhere at once."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
        lambda w: w != "",
    )


def token_count_col(text):
    """Whitespace token count; empty/blank text → 0."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality/statistics columns: tokens, chars, densities, fingerprint.

    All native expressions — DuckDB-oracle-expressible (md5 is identical in
    both engines, which is what makes the fingerprint checkable).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = token_count_col(F.col(text_col))
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digit_chars = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    # tokens are lowercased before the stopword test (sentence-initial
    # 'The'/'It' must count) — same normalization as lang_id/gopher_rules.
    # Native column expression, not an f-string into F.expr: interpolating
    # text_col broke for any name needing backticks and silently resolved
    # dotted names as struct fields
    n_stop = F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(
            F.filter(
                words_expr(F.col(text_col)), lambda w: w.isin(*STOPWORDS)
            )
        )
    )
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_text", n_chars)
        .withColumn(
            "mean_token_len",
            F.round(
                F.when(n_tokens > 0, F.length(F.regexp_replace(F.trim(text), r"\s", "")) / n_tokens).otherwise(F.lit(0.0)),
                4,
            ),
        )
        .withColumn("alpha_ratio", F.round(F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0)), 4))
        .withColumn("digit_ratio", F.round(F.when(n_chars > 0, digit_chars / n_chars).otherwise(F.lit(0.0)), 4))
        .withColumn("punct_ratio", F.round(F.when(n_chars > 0, punct_chars / n_chars).otherwise(F.lit(0.0)), 4))
        .withColumn("stopword_ratio", F.round(F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)), 4))
        .withColumn(
            "fingerprint", F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))
        )
    )


def quality_score_col():
    """Composite [0,1] quality score from the stat columns (heuristic:
    length band + alpha density + stopword presence — the standard cheap
    web-text quality gate shape)."""
    length_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    return F.round(
        0.4 * length_ok.cast("double")
        + 0.3 * F.least(F.col("alpha_ratio") * 1.25, F.lit(1.0))
        + 0.3 * F.least(F.col("stopword_ratio") * 5, F.lit(1.0)),
        4,
    )


# BPE-ish pre-tokenizer (GPT-2-style shape, simplified to a subset that has
# identical semantics in Java regex and RE2 — no lookahead, no \p classes —
# so the Spark plan and the DuckDB oracle count the same tokens):
# contraction suffixes | space?+letters | space?+digits | space?+other-runs
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_count_col(text):
    """Sub-word-ish token count via the shared pre-tokenizer regex (native)."""
    t = F.coalesce(text, F.lit(""))
    return F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken local document
# fingerprinting): k-gram rolling hashes, rightmost-min per sliding window.
#
# The gram hash is a degree-k polynomial over Unicode codepoints in Z/2^64
# (numpy uint64 wraparound — well-defined and identical on every executor),
# emitted as signed int64 for the Spark `array<long>` column. Chosen over
# crc32 because it vectorizes: the whole gram-hash array is k fused
# multiply-adds over the codepoint array, and the winnow pass is one
# sliding_window_view argmin — no per-character Python loop (the round-1
# hotspot: r07 was the slowest contract query). The scalar functions below
# are the golden reference; the numpy kernels are parity-tested against
# them in tests/test_trainingdata_ops.py.
# ---------------------------------------------------------------------------

import numpy as np

_POLY_B = 1000003  # odd multiplier (same family as minhash's constants)
_U64_MASK = (1 << 64) - 1


def _signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _poly_hash(codepoints) -> int:
    h = 0
    for c in codepoints:
        h = (h * _POLY_B + c) & _U64_MASK
    return _signed64(h)


def rolling_kgram_hashes(text: str | None, k: int = 8) -> list[int]:
    """Polynomial hash of each k-char gram of the lowercased,
    space-collapsed text; a shorter-than-k text hashes whole."""
    s = re.sub(r"\s+", " ", (text or "").lower()).strip()
    if len(s) < k:
        return [_poly_hash(map(ord, s))] if s else []
    cps = [ord(c) for c in s]
    return [_poly_hash(cps[i : i + k]) for i in range(len(s) - k + 1)]


def winnow(hashes: list[int], w: int = 4) -> list[int]:
    """Winnowing: rightmost-minimum per window of w hashes; each selected
    position is recorded once (the SWA'03 guarantee: at least one fingerprint
    per w consecutive grams, ~2/(w+1) density)."""
    if not hashes:
        return []
    if len(hashes) <= w:
        return [min(hashes)]
    out: list[int] = []
    last_pos = -1
    for i in range(len(hashes) - w + 1):
        window = hashes[i : i + w]
        m = min(window)
        pos = i + max(j for j, h in enumerate(window) if h == m)
        if pos != last_pos:
            out.append(hashes[pos])
            last_pos = pos
    return out


def winnowing_fingerprint(text: str | None, k: int = 8, w: int = 4) -> list[int]:
    return winnow(rolling_kgram_hashes(text, k), w)


def _kgram_hashes_np(text: str | None, k: int) -> "np.ndarray":
    """Vectorized twin of rolling_kgram_hashes: k uint64 multiply-adds."""
    s = re.sub(r"\s+", " ", (text or "").lower()).strip()
    if not s:
        return np.empty(0, dtype=np.int64)
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    b = np.uint64(_POLY_B)
    if len(cps) < k:
        h = np.uint64(0)
        for c in cps:
            h = h * b + c
        return np.array([h], dtype=np.uint64).view(np.int64)
    n = len(cps) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * b + cps[j : j + n]
    return h.view(np.int64)


def _winnow_np(hashes: "np.ndarray", w: int) -> "np.ndarray":
    """Vectorized twin of winnow: sliding-window rightmost argmin + dedupe."""
    n = len(hashes)
    if n == 0:
        return hashes
    if n <= w:
        return hashes.min(keepdims=True)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # argmin on the reversed window = FIRST min in reverse = RIGHTMOST min
    idx_rev = win[:, ::-1].argmin(axis=1)
    pos = np.arange(win.shape[0]) + (w - 1 - idx_rev)
    keep = np.empty(len(pos), dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]
    return hashes[pos[keep]]


def winnowing_fingerprint_np(text: str | None, k: int = 8, w: int = 4) -> "np.ndarray":
    return _winnow_np(_kgram_hashes_np(text, k), w)


def with_winnowing(docs: DataFrame, text_col: str = "text",
                   k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fingerprints array<long>, n_fingerprints) via pandas UDF
    running the vectorized numpy kernels (scalar-parity-tested)."""
    from pyspark.sql.types import ArrayType, LongType

    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    # deliberately UNPRUNED: this operator's contract is docs + fingerprint
    # columns, so the guard materializes whole rows; callers with wide
    # payload columns should project before calling (the dedupe builders
    # pre-select (id, text) because their outputs replace the input)
    docs = ensure_parallelism(docs)

    @F.pandas_udf(ArrayType(LongType()))
    def fp(text: pd.Series) -> pd.Series:
        return text.map(lambda t: winnowing_fingerprint_np(t, k, w))

    return docs.withColumn("fingerprints", fp(F.col(text_col))).withColumn(
        "n_fingerprints", F.size("fingerprints")
    )


def lang_id(text: str | None) -> str:
    """Heuristic language ID (pure function; shared by UDF and tests)."""
    if not text:
        return "und"
    if _CJK_RE.search(text):
        return "zh"
    tokens = [t.lower() for t in _TOKEN_RE.split(text.strip()) if t][:400]
    if not tokens:
        return "und"
    best, best_score = "und", 0
    for lang in ("en", "es", "de", "fr"):  # fixed order = deterministic ties
        score = sum(1 for t in tokens if t in LANG_PROFILES[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


@F.pandas_udf(StringType())
def lang_id_udf(text: pd.Series) -> pd.Series:
    return text.map(lang_id)


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # unpruned guard, same rationale as with_winnowing: output = docs + col
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    return ensure_parallelism(docs).withColumn(
        "lang_pred", lang_id_udf(F.col(text_col))
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level TF-IDF term ranking — the classic explode→agg shape.

    Tokenization is the trivial lowercase single-space split (oracle-equal
    in any SQL engine); per term: total occurrences (tf over the corpus),
    document frequency, idf = ln(D/df), score = tf·idf. Top-k by
    (rounded score desc, term asc) — fully deterministic ties.

    Scale shape: explode → ONE hash aggregation keyed by term computing
    both counts (count(*) and countDistinct(doc) — Spark expands the
    distinct via partial aggregation, no raw-row reshuffle), then a top-k
    sort of the tiny term table. Scores are rounded before ordering and
    output so double association order can't leak into the result.
    """
    terms = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(words_expr(F.col(text_col))).alias("term"),
    )
    n_docs = docs.count()  # one tiny job; the scalar D in idf
    agg = terms.groupBy("term").agg(
        F.count("*").alias("total_occurrences"),
        F.countDistinct("_doc").alias("doc_freq"),
    )
    score = F.round(
        F.col("total_occurrences")
        * F.log(F.lit(float(n_docs)) / F.col("doc_freq")),
        4,
    )
    return (
        agg.withColumn("tfidf", score)
        .orderBy(F.col("tfidf").desc(), F.col("term").asc())
        .limit(k)
    )


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document.

    Boilerplate-heavy and spam pages repeat themselves; these are the
    standard web-curation filters for that (Rae et al. 2021, §A1.1):

    - ``dup_line_frac``      — fraction of lines occurring more than once
    - ``dup_line_char_frac`` — fraction of characters in such lines
    - ``top_bigram_frac``    — fraction of word-bigrams taken by the most
      frequent bigram

    Scale shape: ZERO shuffles — the signals are per-document functions of
    the text, so they are computed row-local: sort the line/bigram arrays,
    count duplicated elements by adjacent equality, and take the longest
    equal run for the modal bigram — all codegen'd higher-order functions
    (array_sort / transform / aggregate). No explode, no hash aggregation,
    no join: the corpus is scanned exactly once and nothing leaves its
    partition. (A (doc_id, token) groupBy formulation computes the same
    values but shuffles ~one row per corpus word — at 10^12 documents that
    is the dominant shuffle of the whole curation chain, for a quantity the
    row already fully determines.) No UDFs anywhere.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )

    lines = F.filter(
        F.transform(F.split("_t", "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    words = words_expr(F.col("_t"))  # THE shared tokenizer
    # Materialize the words array into its own column BEFORE building
    # bigrams from it: an `element_at(words, i)` inside a lambda would
    # re-evaluate the whole split/lower/filter expression once per element
    # (Catalyst does not CSE through lambda bodies) — O(words²) regex work
    # per document. Against a bound attribute, element access is O(1).
    tokenized = base.select(
        "doc_id",
        F.array_sort(lines).alias("_sl"),
        words.alias("_w"),
    )
    wcol = F.col("_w")
    # bigrams = zip the array with its own tail; zip_with null-pads the
    # shorter side, so the trailing (last, NULL) pair concats to NULL and is
    # filtered out. Handles 0- and 1-word documents without a size gate.
    grams = F.filter(
        F.zip_with(
            wcol,
            F.slice(wcol, 2, F.greatest(F.size(wcol) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )

    zero_long = F.lit(0).cast("long")
    with_arrays = tokenized.select(
        "doc_id",
        "_sl",
        F.array_sort(grams).alias("_sg"),
    )

    # Sorted-adjacency duplicate scan: element i is part of a duplicated
    # line iff it equals its predecessor or successor. F.get is 0-based and
    # returns NULL out of bounds (never errors under ANSI, unlike
    # element_at(_, 0)); NULL comparisons fall through F.when to 0.
    sl = F.col("_sl")
    idxs = F.when(
        F.size(sl) > 0, F.sequence(F.lit(0), F.size(sl) - 1)
    ).otherwise(F.array().cast("array<int>"))

    def _line_elem(i):
        is_dup = (F.get(sl, i) == F.get(sl, i - 1)) | (
            F.get(sl, i) == F.get(sl, i + 1)
        )
        return F.struct(
            F.when(is_dup, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("d"),
            F.length(F.get(sl, i)).cast("long").alias("len"),
        )

    line_stats = F.aggregate(
        F.transform(idxs, _line_elem),
        F.struct(
            zero_long.alias("dup"), zero_long.alias("chars"), zero_long.alias("dupchars")
        ),
        lambda acc, e: F.struct(
            (acc["dup"] + e["d"]).alias("dup"),
            (acc["chars"] + e["len"]).alias("chars"),
            (acc["dupchars"] + e["d"] * e["len"]).alias("dupchars"),
        ),
    )

    # Modal bigram count = longest equal run in the sorted bigram array
    # (linear run-length fold; prev=NULL starts the first run at 1).
    def _run_merge(acc, x):
        newcur = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            newcur.alias("cur"),
            F.greatest(acc["best"], newcur).alias("best"),
            x.alias("prev"),
        )

    top_gram = F.aggregate(
        F.col("_sg"),
        F.struct(
            zero_long.alias("cur"),
            zero_long.alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        _run_merge,
        lambda acc: acc["best"],
    )

    stats = with_arrays.select(
        "doc_id",
        F.size(sl).cast("long").alias("n_lines"),
        line_stats.alias("_ls"),
        F.size("_sg").cast("long").alias("n_bigrams"),
        top_gram.alias("_top"),
    )
    return stats.select(
        "doc_id",
        "n_lines",
        F.round(
            F.when(F.col("n_lines") > 0, F.col("_ls.dup") / F.col("n_lines"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(F.col("_ls.chars") > 0, F.col("_ls.dupchars") / F.col("_ls.chars"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_char_frac"),
        "n_bigrams",
        F.round(
            F.when(F.col("n_bigrams") > 0, F.col("_top") / F.col("n_bigrams"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("top_bigram_frac"),
    )


def bigram_pmi(docs: DataFrame, top_k: int = 20, min_count: int = 5,
               text_col: str = "text", id_col: str = "doc_id",
               materialize: bool = True) -> DataFrame:
    """Top-k adjacent-word pairs by pointwise mutual information.

    PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p over the corpus's bigram
    and unigram totals (Church & Hanks 1990 — public methodology); the
    collocation-mining staple for tokenizer/vocab construction over web
    corpora. min_count drops the unstable low-frequency tail.

    Scale shape: bigrams are built row-local (one Generate), counted with
    map-side partials; the two unigram decorations join on single-word
    keys against a |vocab|-sized side (AQE broadcasts it); top-k is a
    TakeOrderedAndProject, never a full sort.

    ``materialize=True`` (default) checkpoints the ≤ top_k result so the
    vocab-sized cached intermediates can be released before returning.
    ``materialize=False`` returns the final projection un-checkpointed so
    its plan is inspectable (plan audits); the caches are released before
    returning either way, so evaluating that plan recomputes the two
    aggregations. Note the corpus totals are literals IN the plan — both
    paths run two counting jobs during construction regardless.
    """
    words = words_expr(F.col(text_col))
    toks = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    # uni and bi are each ONE corpus scan; both are persisted (vocab- and
    # unique-bigram-sized — far below the corpus) because the totals read
    # them eagerly and the final join reads them again. Totals derive from
    # the aggregated tables, never from a corpus rescan.
    uni = (
        toks.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    bi_all = (
        toks.select(
            F.explode(
                F.when(
                    F.size("_w") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_w") - 1),
                        lambda i: F.struct(
                            F.element_at("_w", i).alias("a"),
                            F.element_at("_w", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .persist()
    )
    bi = bi_all.filter(F.col("c_ab") >= min_count)
    n_uni = uni.agg(F.sum("c")).first()[0]
    n_bi = bi_all.agg(F.sum("c_ab")).first()[0]
    if not n_uni or not n_bi:
        # empty/whitespace corpus: no tokens → no collocations
        uni.unpersist()
        bi_all.unpersist()
        return docs.sparkSession.createDataFrame(
            [], "a string, b string, c_ab long, pmi double"
        )
    out = (
        bi.join(uni.select(F.col("w").alias("a"), F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("c").alias("c_b")), "b")
        .select(
            "a", "b", "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.lit(float(n_bi)))
                    / ((F.col("c_a") / F.lit(float(n_uni)))
                       * (F.col("c_b") / F.lit(float(n_uni))))
                ),
                4,
            ).alias("pmi"),
        )
    )
    ordered = out.orderBy(F.desc("pmi"), "a", "b").limit(top_k)
    if not materialize:
        # audit path: release the caches NOW (the returned lazy plan
        # recomputes them on evaluation — the caller wanted the plan, not
        # a leak of two vocab-sized cached tables into the session)
        uni.unpersist()
        bi_all.unpersist()
        return ordered
    # the result is ≤ top_k rows: checkpoint it so the vocab-sized
    # intermediates can be unpersisted HERE instead of leaking into the
    # session (they are invisible to the caller)
    result = ordered.localCheckpoint()
    uni.unpersist()
    bi_all.unpersist()
    return result


# Gopher's own stopword test list (Rae et al. 2021 §A1.1: "contains at
# least 2 of the following English words"), distinct from the lang-ID /
# ratio STOPWORDS above.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLET_PREFIXES = ("- ", "* ", "• ", "· ")


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher document-shape quality rules (Rae et al. 2021, §A1.1), one
    boolean per rule plus the conjunction — the published heuristic gate
    the trained classifier (quality_train) and composite score
    (quality_score_col) sit on top of.

    - ``ok_word_count``     — word count in [min_words, max_words]
    - ``ok_mean_word_len``  — mean word length in [3, 10]
    - ``ok_alpha_words``    — ≥80% of words contain an alphabetic char
    - ``ok_symbol_ratio``   — (# + …) per word ≤ 0.1
    - ``ok_bullet_lines``   — ≤90% of lines start with a bullet
    - ``ok_ellipsis_lines`` — ≤30% of lines end with an ellipsis
    - ``ok_stopwords``      — ≥2 of Gopher's 8 English stopwords
    - ``gopher_pass``       — every rule above

    The repetition side of Gopher's table (dup lines/paragraphs, modal
    n-gram share) lives in repetition_signals — both are per-document
    functions of the text, so like that operator this is ZERO shuffles:
    higher-order array expressions over one corpus scan, nothing leaves
    its partition, no UDF.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)

    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))

    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t)
        - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ell) / n_words).otherwise(
        F.lit(0.0)
    )

    def _is_bullet(l):
        cond = l.startswith(_BULLET_PREFIXES[0])
        for p in _BULLET_PREFIXES[1:]:
            cond = cond | l.startswith(p)
        return cond

    bullet = F.size(F.filter(lines, _is_bullet))
    bullet_frac = F.when(n_lines > 0, bullet / n_lines).otherwise(F.lit(0.0))

    ell_end = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    ell_frac = F.when(n_lines > 0, ell_end / n_lines).otherwise(F.lit(0.0))

    lowered = F.transform(words, lambda w: F.lower(w))
    n_stop = F.size(
        F.filter(lowered, lambda w: w.isin(*GOPHER_STOPWORDS))
    )

    out = docs.select(
        F.col(id_col).alias("doc_id"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("ok_word_count"),
        ((mean_wl >= 3.0) & (mean_wl <= 10.0)).alias("ok_mean_word_len"),
        (alpha_frac >= 0.8).alias("ok_alpha_words"),
        (symbol_ratio <= 0.1).alias("ok_symbol_ratio"),
        (bullet_frac <= 0.9).alias("ok_bullet_lines"),
        (ell_frac <= 0.3).alias("ok_ellipsis_lines"),
        (n_stop >= 2).alias("ok_stopwords"),
    )
    rule_cols = [c for c in out.columns if c.startswith("ok_")]
    conj = rule_cols[0]
    acc = F.col(conj)
    for c in rule_cols[1:]:
        acc = acc & F.col(c)
    return out.withColumn("gopher_pass", acc)


def dedup_lines(docs: DataFrame, text_col: str = "text",
                min_line_chars: int = 0) -> DataFrame:
    """Within-document line dedup: keep each distinct line's FIRST
    occurrence, preserving order — the FineWeb/RefinedWeb repetition
    cleanup for boilerplate lines a page repeats (cookie banners,
    share bars, list chrome; public methodology).

    Adds dedup_text (surviving lines joined by '\\n'), n_lines, and
    n_dup_lines. Lines shorter than ``min_line_chars`` after trim are
    never treated as duplicates (blank/one-char separators carry no
    repetition signal and removing them would reflow the document).

    Entirely row-local codegen: split → array_distinct (which keeps
    first occurrences in order) → join. No exchange, no Python — safe
    to fuse into any scan.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    if min_line_chars > 0:
        # tag short lines with their position so distinct() keeps them
        # all; the tag is a DOUBLE-NUL + digits SUFFIX stripped by an
        # anchored regex, so a line that legitimately contains a NUL is
        # never truncated (a single-NUL split would cut it), and a legit
        # line can only collide with a tag key by ending in \x00\x00<n>
        keyed = F.transform(
            lines,
            lambda ln, i: F.when(
                F.length(F.trim(ln)) < min_line_chars,
                F.concat(ln, F.lit("\x00\x00"), i.cast("string")),
            ).otherwise(ln),
        )
        kept = F.transform(
            F.array_distinct(keyed),
            lambda ln: F.regexp_replace(ln, "\x00\x00[0-9]+$", ""),
        )
    else:
        kept = F.array_distinct(lines)
    return (
        docs.withColumn("_lines", lines)
        .withColumn("dedup_text", F.array_join(kept, "\n"))
        .withColumn("n_lines", F.size("_lines").cast("long"))
        .withColumn(
            "n_dup_lines",
            (F.size("_lines") - F.size(kept)).cast("long"),
        )
        .drop("_lines")
    )


def compression_ratio(text: str | None, level: int = 6) -> float:
    """deflate(text) bytes / utf-8 bytes — the repetitiveness signal the
    published web-curation recipes threshold on (highly repetitive pages
    compress far below prose's ~0.4-0.6; random/encrypted blobs sit near
    1.0). Empty text maps to 1.0 (nothing to judge)."""
    import zlib

    raw = (text or "").encode("utf-8")
    if not raw:
        return 1.0
    return round(len(zlib.compress(raw, level)) / len(raw), 6)


def with_compression_ratio(docs: DataFrame, text_col: str = "text",
                           out_col: str = "compression_ratio",
                           level: int = 6) -> DataFrame:
    """Adds ``out_col`` per document.

    deflate has no native Spark expression, so this is the package's one
    deliberately-Python quality signal: a single Arrow-batched pass
    (pandas UDF), row-local, fusable into any scan — no shuffle, and the
    orthogonal repetition signals (repetition_signals, dup-passage
    stats) stay native. zlib is deterministic for a fixed level across
    platforms (same library, fixed strategy), so the column is stable
    across partitionings and cluster sizes.
    """
    from pyspark.sql.types import DoubleType

    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    @F.pandas_udf(DoubleType())
    def _ratio(text: pd.Series) -> pd.Series:
        return text.map(lambda t: compression_ratio(t, level))

    return ensure_parallelism(docs).withColumn(out_col, _ratio(F.col(text_col)))
