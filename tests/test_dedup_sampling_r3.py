"""Round-3 operator tests: duplicate-passage stats, priority sampling,
perplexity buckets, deterministic shuffle, and SemDeDup."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import dedupe, indexing, lm_quality, sampling, similarity

# ---------------------------------------------------------------------------
# duplicate_passage_stats
# ---------------------------------------------------------------------------

PASSAGE = "one two three four five six seven eight nine ten"  # 10 words → 3 8-grams


@pytest.fixture(scope="module")
def passage_docs(spark):
    rows = [
        (0, PASSAGE),  # shared with doc 1: all 3 grams duplicated
        (1, "prefix words go here " + PASSAGE + " suffix words go here"),
        (2, "totally unrelated text that repeats nothing from anything else at all"),
        (3, "short doc"),  # < 8 words → no grams
        (4, PASSAGE + " " + PASSAGE),  # self-repeat only (per-doc distinct)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_passages_crafted(spark, passage_docs):
    out = {
        r["doc_id"]: r
        for r in dedupe.duplicate_passage_stats(passage_docs, k=8).collect()
    }
    # doc 0: 3 grams, all also in docs 1 and 4 → all duplicated
    assert out[0]["n_grams"] == 3 and out[0]["n_dup_grams"] == 3
    assert out[0]["dup_frac"] == 1.0
    # doc 1: 18 words → 11 distinct grams; only the 3 pure-PASSAGE ones dup
    assert out[1]["n_grams"] == 11 and out[1]["n_dup_grams"] == 3
    # doc 2 shares nothing
    assert out[2]["n_dup_grams"] == 0
    # doc 3 has no grams at all
    assert out[3]["n_grams"] == 0 and out[3]["dup_frac"] == 0.0


def test_dup_passages_self_repeat_not_counted(spark):
    """A doc repeating a passage only WITHIN itself is not 'duplicated':
    grams are per-doc distinct before the count."""
    docs = spark.createDataFrame(
        [(0, PASSAGE + " " + PASSAGE), (1, "entirely different words " * 4)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedupe.duplicate_passage_stats(docs, k=8).collect()}
    assert out[0]["n_dup_grams"] == 0


def test_dup_passages_hashed_matches_exact(spark, passage_docs):
    exact = sorted(
        map(tuple, dedupe.duplicate_passage_stats(passage_docs, k=8, hash_grams=False).collect())
    )
    hashed = sorted(
        map(tuple, dedupe.duplicate_passage_stats(passage_docs, k=8, hash_grams=True).collect())
    )
    assert exact == hashed


# ---------------------------------------------------------------------------
# weighted_priority_sample / uniform_hash_col
# ---------------------------------------------------------------------------


def _py_u(ident, seed=None):
    s = f"{seed}:{ident}" if seed is not None else str(ident)
    h = int(hashlib.md5(s.encode()).hexdigest()[:13], 16)
    return (h + 1) / float(1 << 52)


def test_priority_sample_matches_pure_python(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sampling.weighted_priority_sample(df, "w", k=25, id_col="doc_id", seed=7).collect()
    expect = sorted(
        ((w / _py_u(i, 7), i, w) for i, w in rows), key=lambda t: (-t[0], t[1])
    )[:25]
    assert [(r["doc_id"], r["w"]) for r in got] == [(i, w) for _, i, w in expect]
    # priorities are bit-exact vs the pure-python IEEE computation
    assert [r["priority"] for r in got] == [p for p, _, _ in expect]


def test_priority_sample_is_partitioning_invariant(spark):
    rows = [(i, i % 97 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = sampling.weighted_priority_sample(df, "w", 20, "doc_id").collect()
    b = sampling.weighted_priority_sample(df.repartition(7), "w", 20, "doc_id").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_priority_sample_prefers_heavy_weights(spark):
    # 500 light (w=1) + 500 heavy (w=50): the top-100 should be mostly heavy
    rows = [(i, 1) for i in range(500)] + [(i, 50) for i in range(500, 1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sampling.weighted_priority_sample(df, "w", 100, "doc_id", seed=1).collect()
    n_heavy = sum(1 for r in got if r["doc_id"] >= 500)
    assert n_heavy > 80


# ---------------------------------------------------------------------------
# ppl_buckets
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lang_docs(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(60):
        lang = "en" if i % 2 == 0 else "de"
        # vary token mix AND include a unique token so per-doc ppl is
        # tie-free (ntile splits ties by doc_id; thresholds cannot — with
        # ties the two modes legitimately disagree on tied rows)
        text = f"w{i} " + " ".join(words[(i + j) % len(words)] for j in range(5 + i % 7))
        rows.append((i, lang, text))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ppl_buckets_exact_is_balanced_and_ordered(spark, lang_docs):
    out = lm_quality.ppl_buckets(lang_docs, n_buckets=3).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {b: sum(1 for r in rs if r["bucket_id"] == b) for b in (1, 2, 3)}
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        # every head ppl <= every tail ppl
        heads = [r["ppl"] for r in rs if r["bucket"] == "head"]
        tails = [r["ppl"] for r in rs if r["bucket"] == "tail"]
        assert max(heads) <= min(tails)


def test_ppl_buckets_approximate_agrees_with_exact(spark, lang_docs):
    exact = {r["doc_id"]: r["bucket_id"]
             for r in lm_quality.ppl_buckets(lang_docs, n_buckets=3).collect()}
    approx = {r["doc_id"]: r["bucket_id"]
              for r in lm_quality.ppl_buckets(lang_docs, n_buckets=3, approximate=True).collect()}
    assert set(exact) == set(approx)
    agree = sum(1 for d in exact if exact[d] == approx[d]) / len(exact)
    assert agree >= 0.9
    assert all(abs(exact[d] - approx[d]) <= 1 for d in exact)


# ---------------------------------------------------------------------------
# deterministic_shuffle
# ---------------------------------------------------------------------------


def test_deterministic_shuffle_matches_pure_python(spark):
    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = indexing.deterministic_shuffle(df, "doc_id", seed=3, num_buckets=8)
    got = {r["doc_id"]: r["shuffle_idx"] for r in out.collect()}
    key = {i: int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:13], 16) for i in ids}
    expect = {i: rank + 1 for rank, i in enumerate(sorted(ids, key=lambda i: (key[i], i)))}
    assert got == expect


def test_deterministic_shuffle_bucket_count_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(150)], "doc_id long")
    a = indexing.deterministic_shuffle(df, "doc_id", seed=5, num_buckets=4).collect()
    b = indexing.deterministic_shuffle(df.repartition(5), "doc_id", seed=5, num_buckets=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def _greedy_keep(mat, ids, threshold):
    """Pure-python reference: greedy MIS in ascending-id order."""
    order = np.argsort(ids, kind="stable")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    nm = mat / norms
    kept, keep = [], {}
    for row in order:
        if kept and (nm[kept] @ nm[row] >= threshold).any():
            keep[int(ids[row])] = False
        else:
            keep[int(ids[row])] = True
            kept.append(row)
    return keep


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((12, 16))
    vecs, rows = [], []
    vid = 0
    for b in range(12):
        for _ in range(1 + b % 3):  # groups of near-identical vectors
            v = base[b] + rng.standard_normal(16) * 0.01
            rows.append((vid, [float(x) for x in v]))
            vecs.append(v)
            vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        np.array([np.asarray(v) for v in vecs]),
    )


def test_semdedup_single_cluster_matches_greedy(spark, emb_df):
    df, mat = emb_df
    out = similarity.semdedup(df, threshold=0.98, n_centroids=1, dim=16, iters=1)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    ids = np.arange(len(mat))
    assert got == _greedy_keep(mat, ids, 0.98)
    # each near-identical group keeps exactly its smallest id
    assert sum(got.values()) == 12


def test_semdedup_deterministic_across_partitioning(spark, emb_df):
    df, _ = emb_df
    a = sorted(map(tuple, similarity.semdedup(df, 0.95, n_centroids=4, dim=16).collect()))
    b = sorted(
        map(tuple, similarity.semdedup(df.repartition(7), 0.95, n_centroids=4, dim=16).collect())
    )
    assert a == b


def test_semdedup_cluster_guard_raises(spark, emb_df):
    df, _ = emb_df
    with pytest.raises(Exception, match="max_cluster_rows"):
        similarity.semdedup(
            df, 0.99, n_centroids=1, dim=16, iters=1, max_cluster_rows=3
        ).collect()
