"""End-to-end pretraining-data plan tests (plans/pretrain.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.plans import pretrain

EVAL_TEXT = (
    "the benchmark question asks about the capital of france and the answer "
    "is paris which every model should know by heart"
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic corpus with planned fates: contaminated doc, exact dup,
    near dups, boilerplate-heavy pair, and plain survivors."""
    rows = []
    for i in range(40):
        # unique tokens at every other position: cross-doc shingle overlap
        # ~0 (every 3-word window contains a w{i}* token), while the
        # English stopwords keep lang_pred = "en"
        text = " ".join(
            f"the w{i}a{j} and w{i}b{j} of w{i}c{j}" for j in range(12)
        )
        rows.append((i, "en", text))
    rows.append((100, "en", EVAL_TEXT))                      # contaminated
    rows.append((101, "en", rows[0][2]))                     # exact dup of doc 0
    rows.append((102, "en", "zz " + rows[1][2]))             # near dup of doc 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def result(spark, corpus):
    eval_docs = spark.createDataFrame([(0, EVAL_TEXT)], "doc_id long, text string")
    return pretrain.pretrain_corpus(
        corpus,
        eval_docs=eval_docs,
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr"),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),  # keep all buckets: isolate dedup/decontam
        seed=9,
    )


def test_funnel_shape_and_monotonicity(result):
    rows = result["funnel"].collect()
    assert [r["stage"] for r in rows] == [
        "input", "curated", "passage_decontam", "ppl_kept", "chunks"
    ]
    funnel = {r["stage"]: r["n"] for r in rows}
    assert funnel["input"] == 43
    assert funnel["curated"] <= funnel["input"]
    assert funnel["passage_decontam"] <= funnel["curated"]
    assert funnel["ppl_kept"] <= funnel["passage_decontam"]
    assert funnel["chunks"] > 0


def test_planned_fates(result):
    kept_ids = {r["doc_id"] for r in result["kept"].select("doc_id").collect()}
    assert 100 not in kept_ids          # decontaminated (eval-set copy)
    assert 101 not in kept_ids          # exact duplicate loses to doc 0
    assert 102 not in kept_ids          # near duplicate loses to doc 1
    assert 0 in kept_ids and 1 in kept_ids


def test_chunks_cover_kept_docs_in_shuffle_order(result):
    kept_ids = {r["doc_id"] for r in result["kept"].select("doc_id").collect()}
    chunks = result["chunks"].collect()
    assert {r["doc_id"] for r in chunks} == {
        i for i in kept_ids
    }  # every kept doc has >= 1 chunk (no empty docs in fixture)
    assert all(r["shuffle_idx"] >= 1 for r in chunks)
    # shuffle_idx is a bijection over kept docs
    idx = {r["doc_id"]: r["shuffle_idx"] for r in result["ordered"].collect()}
    assert sorted(idx.values()) == list(range(1, len(kept_ids) + 1))


def test_mixing_weights_normalized(result):
    mix = result["mixing"].collect()
    assert abs(sum(r["mix_weight"] for r in mix) - 1.0) < 1e-4
    assert all(r["n_docs"] > 0 for r in mix)


def test_pipeline_is_deterministic(spark, corpus, result):
    eval_docs = spark.createDataFrame([(0, EVAL_TEXT)], "doc_id long, text string")
    again = pretrain.pretrain_corpus(
        corpus.repartition(7),
        eval_docs=eval_docs,
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr"),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),
        seed=9,
    )
    assert sorted(map(tuple, result["funnel"].collect())) == sorted(
        map(tuple, again["funnel"].collect())
    )
    assert sorted(map(tuple, result["chunks"].collect())) == sorted(
        map(tuple, again["chunks"].collect())
    )


def test_passage_rewrite_strips_cross_doc_boilerplate(spark):
    """passage_rewrite=True removes duplicated passages from SURVIVING docs
    (first occurrence wins) and recomputes token counts; a doc rewritten
    to empty is dropped rather than chunked."""
    from pdf_parser_spark.plans import pretrain

    boiler = "all rights reserved terms of service apply here now please"  # 10 words — one full k=10 passage, so both docs split on the same boundary
    unique_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    unique_b = "one two three four five six seven eight nine ten"
    rows = [
        (0, f"{unique_a} {boiler}", "en", "s0", 1),
        (1, f"{boiler} {unique_b}", "en", "s0", 1),  # loses the boiler run
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = pretrain.pretrain_corpus(
        docs,
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr", "unknown"),
        neardup_threshold=0.99,
        dup_frac_max=1.0,          # gate keeps both; rewrite does the work
        passage_rewrite=True,
        k_gram=10,                 # both docs are exactly 2 passages of 10
        ppl_keep_buckets=(0, 1, 2),
        seed=3,
    )
    kept = {r["doc_id"]: r["text"] for r in out["kept"].collect()}
    assert kept[0] == f"{unique_a} {boiler}"          # first occurrence intact
    assert kept[1] == unique_b                         # boiler stripped
    toks = {r["doc_id"]: r["n_tokens"] for r in out["kept"].collect()}
    assert toks[1] == 10                               # recounted post-rewrite


def test_optional_classifier_and_dsir_stages(spark, corpus):
    """quality_weights gates by classifier prob; dsir_target+dsir_keep
    selects toward the target corpus; both show up in the funnel and only
    shrink the kept set."""
    from pdf_parser_spark.operators import quality_train as qt

    # train weights offline: positive = docs mentioning 'w1a0' family is
    # too narrow, so label half the corpus by a marker token
    labeled = corpus.withColumn(
        "label", F.col("text").contains("w1").cast("double")
    )
    feats = qt.hashed_features(labeled, n_features=1 << 12, binary=True)
    weights = qt.train_quality_classifier(
        feats, labeled.select("doc_id", "label"), iters=10, lr=2.0
    )
    target = corpus.filter(F.col("doc_id") < 5)
    out = pretrain.pretrain_corpus(
        corpus,
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr"),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),
        quality_weights=weights,
        classifier_min_prob=0.5,
        classifier_n_features=1 << 12,
        dsir_target=target,
        dsir_keep=5,
        seed=9,
    )
    funnel = {r["stage"]: r["n"] for r in out["funnel"].collect()}
    assert "classifier_kept" in funnel and "dsir_kept" in funnel
    assert funnel["classifier_kept"] <= funnel["curated"]
    assert funnel["dsir_kept"] == 5 <= funnel["ppl_kept"]
    # classifier gate kept only label-1 docs (w1 marker): doc 1 survives
    kept_ids = {r["doc_id"] for r in out["kept"].select("doc_id").collect()}
    assert len(kept_ids) == 5


def test_optional_gopher_gate(spark, corpus):
    """gopher_gate=True drops shape-violating docs before curation and
    records a funnel stage; the corpus fixture's docs are long enough to
    pass, so add a too-short doc and check only it is gated."""
    shorty = spark.createDataFrame(
        [(200, "en", "too short to pass the gate")],
        "doc_id long, lang string, text string",
    )
    out = pretrain.pretrain_corpus(
        corpus.unionByName(shorty),
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr"),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),
        gopher_gate=True,
        seed=9,
    )
    funnel = {r["stage"]: r["n"] for r in out["funnel"].collect()}
    # two docs violate the 50-word rule: the added shorty AND the
    # fixture's 22-word contaminated doc (id 100)
    assert funnel["gopher_kept"] == funnel["input"] - 2
    kept_ids = {r["doc_id"] for r in out["kept"].select("doc_id").collect()}
    assert 200 not in kept_ids and 100 not in kept_ids
    assert 2 in kept_ids  # long fixture docs pass the gate


def test_optional_boilerplate_strip(spark, corpus):
    """strip_boilerplate=True removes host-frequent chrome lines before
    any gate, drops pure-chrome pages, and records a funnel stage."""
    nav = "Home | Products | Contact Sales Today"
    chromed = corpus.withColumn("host", F.lit("shop.example")).withColumn(
        "text", F.concat(F.lit(nav + "\n"), F.col("text"))
    )
    pure_chrome = spark.createDataFrame(
        [(300, "en", nav, "shop.example")],
        "doc_id long, lang string, text string, host string",
    )
    out = pretrain.pretrain_corpus(
        chromed.unionByName(pure_chrome),
        min_quality=0.0,
        allowed_langs=("en", "de", "es", "fr"),
        neardup_threshold=0.6,
        dup_frac_max=0.95,
        ppl_keep_buckets=(1, 2, 3),
        strip_boilerplate=True,
        seed=9,
    )
    funnel = {r["stage"]: r["n"] for r in out["funnel"].collect()}
    assert funnel["boiler_stripped"] == funnel["input"] - 1  # 300 erased
    kept = out["kept"]
    assert 300 not in {r["doc_id"] for r in kept.select("doc_id").collect()}
    # the nav line is gone from every surviving text
    assert kept.filter(F.col("text").contains(nav)).count() == 0
    # the fixture's dedup fates are unchanged by the strip (no eval_docs
    # here, so the contaminated doc 100 legitimately survives)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 101 not in kept_ids and 102 not in kept_ids and 0 in kept_ids

    with pytest.raises(ValueError):
        pretrain.pretrain_corpus(corpus, strip_boilerplate=True)
