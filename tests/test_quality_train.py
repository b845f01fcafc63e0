"""Trained quality classifier + DSIR resampling (operators/quality_train).

Correctness strategy: the Spark training loop is full-batch gradient
descent — a pure function of the (doc_id, feat, val) feature table — so a
single-node numpy twin run on the SAME collected triples must reproduce
the weights and probabilities to float tolerance. DSIR's model math is
checked against hand-computed smoothed log-probs, and the resampler
against its determinism/bias contracts.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import quality_train as qt

pytestmark = pytest.mark.spark

GOOD = "the quick brown fox jumps over the lazy dog with measured prose"
BAD = "zzz qqq xxx kkk vvv www jjj ppp zzz qqq xxx kkk"


def _docs(spark, n=40):
    rows = []
    for i in range(n):
        label = i % 2
        base = GOOD if label else BAD
        rows.append((i, f"{base} filler{i % 5}", float(label)))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def _numpy_train(triples, labels, n_docs, iters, lr, l2=0.0):
    """Dense numpy twin of train_quality_classifier on collected triples."""
    feats = sorted({f for _, f, _ in triples})
    fidx = {f: j for j, f in enumerate(feats)}
    docs = sorted(labels)
    didx = {d: j for j, d in enumerate(docs)}
    X = np.zeros((len(docs), len(feats)))
    for d, f, v in triples:
        X[didx[d], fidx[f]] = v
    y = np.array([labels[d] for d in docs])
    w = np.zeros(len(feats))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / n_docs + l2 * w
        w = w - lr * g
    return {f: w[fidx[f]] for f in feats}, X, y, w


def test_classifier_matches_numpy_twin(spark):
    docs = _docs(spark)
    feats = qt.hashed_features(docs, n_features=1 << 12)
    labels = docs.select("doc_id", "label")
    wdf = qt.train_quality_classifier(feats, labels, iters=8, lr=0.5)
    got = {int(r["feat"]): float(r["weight"]) for r in wdf.collect()}

    triples = [
        (int(r["doc_id"]), int(r["feat"]), float(r["val"]))
        for r in feats.collect()
    ]
    lab = {int(r["doc_id"]): float(r["label"]) for r in labels.collect()}
    want, X, y, w = _numpy_train(triples, lab, len(lab), iters=8, lr=0.5)
    assert set(got) == {f for f, v in want.items() if v != 0.0}
    for f, v in got.items():
        assert abs(v - want[f]) < 1e-9, f"feat {f}: {v} vs {want[f]}"

    # and the learned model separates the classes
    probs = {
        int(r["doc_id"]): float(r["prob"])
        for r in qt.score_documents(feats, wdf).collect()
    }
    for d, label in lab.items():
        assert (probs[d] > 0.5) == (label == 1.0), (d, probs[d], label)


def test_driver_and_relational_paths_agree(spark):
    """max_driver_nnz=0 forces the relational loop; both paths must produce
    the same sparse model (same update rule, 1e-9 float drift budget for
    differing summation orders)."""
    docs = _docs(spark, n=20)
    feats = qt.hashed_features(docs, n_features=1 << 12)
    labels = docs.select("doc_id", "label")
    fast = {int(r["feat"]): float(r["weight"])
            for r in qt.train_quality_classifier(
                feats, labels, iters=6, lr=0.5).collect()}
    slow = {int(r["feat"]): float(r["weight"])
            for r in qt.train_quality_classifier(
                feats, labels, iters=6, lr=0.5, max_driver_nnz=0).collect()}
    assert set(fast) == set(slow)
    for f, v in fast.items():
        assert abs(v - slow[f]) < 1e-9, (f, v, slow[f])


def test_unlabeled_docs_do_not_affect_training(spark):
    """Docs present in the feature table but absent from the label table
    must not move the gradient (both paths restrict to labeled docs)."""
    docs = _docs(spark, n=20)
    extra = spark.createDataFrame(
        [(900, "qqq zzz spurious gradient mass", 0.0)],
        "doc_id long, text string, label double",
    )
    feats_clean = qt.hashed_features(docs, n_features=1 << 12)
    feats_noisy = qt.hashed_features(docs.unionByName(extra), n_features=1 << 12)
    labels = docs.select("doc_id", "label")
    a = {int(r["feat"]): float(r["weight"])
         for r in qt.train_quality_classifier(feats_clean, labels,
                                              iters=4, lr=0.5).collect()}
    b = {int(r["feat"]): float(r["weight"])
         for r in qt.train_quality_classifier(feats_noisy, labels,
                                              iters=4, lr=0.5).collect()}
    assert a == b


def test_score_with_empty_weights_is_half(spark):
    docs = _docs(spark, n=6)
    feats = qt.hashed_features(docs, n_features=1 << 12)
    empty = spark.createDataFrame([], "feat long, weight double")
    rows = qt.score_documents(feats, empty).collect()
    assert rows and all(abs(r["prob"] - 0.5) < 1e-12 for r in rows)


def test_classifier_generalizes_to_heldout(spark):
    train = _docs(spark, n=30)
    feats = qt.hashed_features(train, n_features=1 << 12)
    wdf = qt.train_quality_classifier(
        feats, train.select("doc_id", "label"), iters=10, lr=0.5
    )
    held = spark.createDataFrame(
        [(1000, GOOD + " unseen tail", 1.0), (1001, BAD + " kkk vvv", 0.0)],
        "doc_id long, text string, label double",
    )
    hfeats = qt.hashed_features(held, n_features=1 << 12)
    probs = {
        int(r["doc_id"]): float(r["prob"])
        for r in qt.score_documents(hfeats, wdf).collect()
    }
    assert probs[1000] > 0.5 > probs[1001]


def test_dsir_model_matches_hand_smoothing(spark):
    nf = 1 << 12
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    model = {int(r["feat"]): float(r["logp"])
             for r in qt.dsir_ngram_model(docs, n_features=nf).collect()}
    fmap = {
        r["word"]: int(r["feat"])
        for r in spark.createDataFrame([("a",), ("b",), ("c",)], "word string")
        .select("word", F.pmod(F.xxhash64("word"), F.lit(nf)).alias("feat"))
        .collect()
    }
    n = 5.0
    counts = {fmap["a"]: 2.0, fmap["b"]: 2.0, fmap["c"]: 1.0}
    for feat, c in counts.items():
        assert abs(model[feat] - math.log((c + 1.0) / (n + nf))) < 1e-12
    floor = qt._model_floor(docs, "text", nf, 1.0)
    assert abs(floor - math.log(1.0 / (n + nf))) < 1e-12


def test_dsir_ratios_favor_target_like_docs(spark):
    target = spark.createDataFrame(
        [(i, GOOD) for i in range(20)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(0, GOOD), (1, GOOD), (2, BAD), (3, BAD)],
        "doc_id long, text string",
    )
    r = {int(x["doc_id"]): float(x["log_ratio"])
         for x in qt.dsir_log_ratios(raw, target, n_features=1 << 12).collect()}
    assert min(r[0], r[1]) > max(r[2], r[3])


def test_dsir_empty_doc_scores_zero(spark):
    target = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(0, GOOD), (1, ""), (2, None)], "doc_id long, text string"
    )
    rows = {int(x["doc_id"]): x
            for x in qt.dsir_log_ratios(raw, target, n_features=1 << 12).collect()}
    assert rows[1]["log_ratio"] == 0.0 and rows[1]["n_tokens"] == 0
    assert rows[2]["log_ratio"] == 0.0 and rows[2]["n_tokens"] == 0
    assert len(rows) == 3


def test_dsir_resample_deterministic_and_biased(spark):
    target = spark.createDataFrame(
        [(i, GOOD) for i in range(10)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, GOOD if i < 10 else BAD) for i in range(20)],
        "doc_id long, text string",
    )
    kept1 = sorted(
        r["doc_id"]
        for r in qt.dsir_resample(raw, target, k=8, n_features=1 << 12, seed=7).collect()
    )
    kept2 = sorted(
        r["doc_id"]
        for r in qt.dsir_resample(raw, target, k=8, n_features=1 << 12, seed=7).collect()
    )
    assert kept1 == kept2 and len(kept1) == 8
    # extreme separation → the kept set is target-like
    assert all(d < 10 for d in kept1)


def test_score_plan_broadcasts_model(spark):
    """The weight/model join must be a broadcast — the corpus-side table
    never shuffles by feat."""
    docs = _docs(spark, n=10)
    feats = qt.hashed_features(docs, n_features=1 << 12)
    wdf = spark.createDataFrame([(1, 0.5)], "feat long, weight double")
    plan = qt.score_documents(feats, wdf)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_binary_features_presence_valued(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b")], "doc_id long, text string"
    )
    rows = qt.hashed_features(docs, n_features=1 << 12, binary=True).collect()
    # two word feats at 1.0 + the intercept at 1.0
    assert len(rows) == 3 and all(r["val"] == 1.0 for r in rows)
