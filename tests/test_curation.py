"""Corpus-curation pipeline: gate, language filter, exact + near dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.plans import curation

_EN = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "to walk in the park with a friend of the family"
)
_DE = (
    "der schnelle braune fuchs springt und die katze sitzt auf dem dach "
    "mit der familie in der sonne und das ist auf den punkt"
)


def _doc_text(i: int) -> str:
    # ~40% shared prefix + 60% doc-unique tokens: docs are related but fall
    # well under the 0.8 near-dup threshold against each other
    unique = " ".join(f"w{i}x{j} text{i * 7 + j}" for j in range(12))
    return f"{_EN} unique section {i}: {unique}"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(10):
        rows.append((i, _doc_text(i), "en"))
    rows.append((20, _doc_text(0), "en"))        # exact dup of 0
    rows.append((21, _doc_text(1) + " x", "en"))  # near dup of 1
    rows.append((30, "short", "en"))              # fails gate: too short
    rows.append((31, _DE, "de"))                  # german doc
    # digits-only "text": length passes but alpha=0, stopwords=0 → 0.4 < 0.5
    rows.append((32, " ".join(str(100 + k) for k in range(15)), "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_quality_gate_drops_junk(spark, corpus):
    gated = curation.quality_gate(corpus, 0.5)
    ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 30 not in ids          # too short
    assert 32 not in ids          # digits-only rows score 0.4 < 0.5
    assert set(range(10)) <= ids  # real text passes


def test_language_filter_uses_prediction_not_label(spark, corpus):
    # mislabel the German doc as 'en': the PREDICTED language must win
    mislabeled = corpus.withColumn("lang", F.lit("en"))
    kept = curation.language_filter(mislabeled, ("en",))
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 31 not in ids
    assert 0 in ids


def test_exact_dedup_keeps_min_id(spark, corpus):
    out = curation.drop_exact_duplicates(corpus)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 0 in ids and 20 not in ids
    assert 1 in ids and 21 in ids  # near-dup but not exact: both survive


def test_near_dedup_drops_larger_id(spark, corpus):
    out = curation.drop_near_duplicates(corpus, threshold=0.8)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 1 in ids and 21 not in ids  # 21 ≈ 1, larger id loses
    assert 0 in ids and 20 not in ids  # exact dups are near-dups too


def test_neardup_components_min_label(spark):
    """CC over an explicit pair graph: chains collapse to min-id components."""
    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (no 1~4 edge) + pair 7-8 + isolated-by-absence 9
        [(1, 2), (2, 3), (3, 4), (7, 8)], "a_id long, b_id long"
    )
    comp = {r["doc_id"]: r["component"]
            for r in curation.neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_near_dedup_transitive_chain_one_survivor(spark):
    """A~B, B~C with A≁C: exactly one survivor per chain (the min id).

    The chain's MIDDLE doc carries the largest id (A=1, B=3, C=2), so the
    one-pass union-by-min rule — which drops the larger id of each verified
    pair — only drops B, leaving TWO local-minimum survivors {A, C} of one
    duplicate cluster. The CC default must keep exactly the component
    minimum."""
    # 60 tokens; each single-token edit kills ~3 of the 58 3-gram shingles.
    # B edits 3 tokens (J(A,B)=49/67≈0.73); C edits 3 OTHER tokens relative
    # to B (J(B,C)≈0.73, J(A,C)=40/76≈0.53) — so at threshold 0.6 the chain
    # verifies A~B and B~C but not A~C.
    base = [f"tok{j}" for j in range(60)]
    mid = list(base)
    for j, pos in enumerate((5, 25, 45)):
        mid[pos] = f"mid{j}"
    far = list(mid)
    for j, pos in enumerate((10, 30, 50)):
        far[pos] = f"far{j}"
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (3, " ".join(mid)), (2, " ".join(far)),
         (50, "completely different text about other things entirely " * 3)],
        "doc_id long, text string",
    )
    from pdf_parser_spark.operators import dedupe as dedupe_op

    # threshold chosen so A~B (1,3) and B~C (2,3) verify but A~C (1,2) not
    pairs = {(r["a_id"], r["b_id"])
             for r in dedupe_op.near_duplicates_minhash(docs, 0.6).collect()}
    assert (1, 3) in pairs and (2, 3) in pairs and (1, 2) not in pairs

    transitive = {r["doc_id"] for r in
                  curation.drop_near_duplicates(docs, 0.6).select("doc_id").collect()}
    assert transitive == {1, 50}
    one_pass = {r["doc_id"] for r in
                curation.drop_near_duplicates(docs, 0.6, transitive=False)
                .select("doc_id").collect()}
    assert one_pass == {1, 2, 50}  # two local minima of ONE cluster survive


def test_full_curation_and_summary(spark, corpus):
    curated = curation.curate(
        corpus, min_quality=0.5, allowed_langs=("en",), neardup_threshold=0.8
    )
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert ids == set(range(10))  # dups, near-dups, junk, and German all gone
    summary = curation.curation_summary(curated).collect()
    assert len(summary) == 1
    row = summary[0]
    assert row["lang_pred"] == "en" and row["n_docs"] == 10
    assert row["total_tokens"] > 0 and 0.0 < row["avg_quality"] <= 1.0


# ------------------------------------------------- LSH banding planner

from pdf_parser_spark.operators import dedupe as dedupe_op  # noqa: E402


def test_lsh_plan_picks_the_published_splits():
    """The planner reproduces the MMDS S-curve arithmetic: sharpest rows
    that keeps P(threshold) >= the floor."""
    assert (dedupe_op.lsh_plan(0.7)["bands"], dedupe_op.lsh_plan(0.7)["rows"]) == (16, 4)
    assert (dedupe_op.lsh_plan(0.85)["bands"], dedupe_op.lsh_plan(0.85)["rows"]) == (16, 4)
    assert (dedupe_op.lsh_plan(0.9)["bands"], dedupe_op.lsh_plan(0.9)["rows"]) == (8, 8)
    assert (dedupe_op.lsh_plan(0.6)["bands"], dedupe_op.lsh_plan(0.6)["rows"]) == (32, 2)
    # exact-match threshold: one band over the whole signature
    assert dedupe_op.lsh_plan(1.0)["rows"] == 64
    # every returned plan honors its own floor
    for t in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9):
        p = dedupe_op.lsh_plan(t)
        assert p["p_at_threshold"] >= 0.95
        assert p["bands"] * p["rows"] == 64
    with pytest.raises(ValueError):
        dedupe_op.lsh_plan(0.0)


def test_lsh_plan_banding_recovers_low_threshold_pairs():
    """At J~0.6 the fixed 16x4 banding misses a measurable share of true
    pairs that the planner's 32x2 catches — computed directly from the
    deterministic signature/banding functions, no Spark needed."""
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(5000)]

    def caught(text_a, text_b, bands):
        ha = dedupe_op.band_hashes(dedupe_op.minhash_signature(text_a), bands)
        hb = dedupe_op.band_hashes(dedupe_op.minhash_signature(text_b), bands)
        return any(x == y for x, y in zip(ha, hb))

    n, caught_16, caught_32 = 120, 0, 0
    for _ in range(n):
        base = rng.sample(vocab, 60)
        # replace a suffix so shingle-set jaccard lands near 0.55-0.65
        variant = base[:44] + rng.sample(vocab, 16)
        a, b = " ".join(base), " ".join(variant)
        caught_16 += caught(a, b, 16)
        caught_32 += caught(a, b, 32)
    assert caught_32 > caught_16          # strictly better recall
    assert caught_32 >= 0.9 * n           # and near-complete at its floor


def test_band_hashes_validates_split():
    sig = dedupe_op.minhash_signature("some text here")
    with pytest.raises(ValueError):
        dedupe_op.band_hashes(sig, bands=7)  # 7 does not divide 64


def test_lsh_plan_rows_monotone_in_threshold():
    """Higher thresholds never pick a flatter curve: rows-per-band is
    non-decreasing in the threshold, and the S-curve value the planner
    reports is the actual 1-(1-t^r)^b arithmetic."""
    prev_rows = 0
    for i in range(1, 100):
        t = i / 100.0
        p = dedupe_op.lsh_plan(t)
        assert p["rows"] >= prev_rows, t
        prev_rows = p["rows"]
        b, r = p["bands"], p["rows"]
        assert abs(p["p_at_threshold"] - (1 - (1 - t ** r) ** b)) < 1e-12


def test_exact_duplicates_trim_before_fingerprint(spark):
    """Trailing-newline scrapes are exact duplicates of their trimmed
    twins — the fingerprint must trim before collapsing whitespace."""
    docs = spark.createDataFrame(
        [(1, "foo bar"), (2, "foo bar\n"), (3, "  foo  bar  "), (4, "foo barx")],
        "doc_id long, text string",
    )
    groups = {r["keeper_id"]: r["group_size"]
              for r in dedupe_op.exact_duplicates(docs).collect()}
    assert groups == {1: 3, 4: 1}


def test_simhash_exact_match_mode(spark):
    """max_hamming=0 (one 64-bit block) must work — the all-ones mask
    previously overflowed the int64 literal."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "a completely different document about other things")],
        "doc_id long, text string",
    )
    pairs = {(r["a_id"], r["b_id"])
             for r in dedupe_op.simhash_near_duplicates(docs, max_hamming=0).collect()}
    assert (1, 2) in pairs and all(3 not in p for p in pairs)


def test_empty_docs_never_become_minhash_candidates(spark):
    """Empty/whitespace docs share the constant signature: without the
    short-circuit they all collide on ONE band key (quadratic) and pair
    with jaccard 1.0. They must produce no band rows at all."""
    docs = spark.createDataFrame(
        [(i, "") for i in range(50)] + [(100, None), (101, "   ")]
        + [(200, "real content document with several words here")],
        "doc_id long, text string",
    )
    assert dedupe_op.minhash_band_table(docs).count() == 16  # only doc 200
    assert dedupe_op.near_duplicates_minhash(docs, 0.7).count() == 0
