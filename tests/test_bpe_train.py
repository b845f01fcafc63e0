"""Distributed BPE merge learning vs a pure-Python reference
implementation of Sennrich et al. 2016 over the same word counts."""

from __future__ import annotations

from collections import Counter

import pytest

from pdf_parser_spark.operators import bpe_train

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
    "low lower lowest",
]


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return dict(c)


def _ref_learn_bpe(word_counts, n_merges):
    """Reference BPE (Sennrich et al. 2016 pseudo-code, deterministic
    tie-break (count desc, pair lexicographic))."""
    vocab = {
        tuple(list(w) + [bpe_train.END]): n for w, n in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_counts_match_reference(spark, docs):
    got = {r["word"]: r["count"] for r in bpe_train.word_counts(docs).collect()}
    assert got == _ref_word_counts(CORPUS)


def test_learn_bpe_matches_reference_merge_table(spark, docs):
    want, _ = _ref_learn_bpe(_ref_word_counts(CORPUS), 12)
    got = bpe_train.learn_bpe(docs, n_merges=12)
    assert got == want
    assert len(got) > 3  # the fixture genuinely exercises several rounds


def test_learn_bpe_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every adjacent pair occurs once -> no merge is learnable
    assert bpe_train.learn_bpe(docs, n_merges=10) == []


def test_segment_words_matches_reference_segmentation(spark, docs):
    wc = bpe_train.word_counts(docs)
    merges, ref_vocab = _ref_learn_bpe(_ref_word_counts(CORPUS), 12)
    got = {
        r["word"]: tuple(r["pieces"])
        for r in bpe_train.segment_words(wc, merges).collect()
    }
    # rebuild the reference segmentation per word
    want = {}
    for syms in ref_vocab:
        word = "".join(syms).removesuffix(bpe_train.END)
        want[word] = syms
    assert got == want


def test_learn_bpe_partitioning_invariant(spark, docs):
    a = bpe_train.learn_bpe(docs, n_merges=8)
    b = bpe_train.learn_bpe(docs.repartition(7), n_merges=8)
    assert a == b


def test_overlapping_pair_merges_left_to_right(spark):
    # 'aaa' with merge (a,a): greedy left-to-right gives (aa, a), never (a, aa)
    docs = spark.createDataFrame(
        [(0, "aaa aaa aaa")], "doc_id long, text string"
    )
    wc = bpe_train.word_counts(docs)
    seg = bpe_train.segment_words(wc, [("a", "a")]).collect()[0]
    assert tuple(seg["pieces"]) == ("aa", "a", bpe_train.END)


def test_tokenize_corpus_reconstructs_and_orders(spark, docs):
    merges = bpe_train.learn_bpe(docs, n_merges=12)
    out = {r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
           for r in bpe_train.tokenize_corpus(docs, merges).collect()}
    assert set(out) == set(range(len(CORPUS)))
    for i, text in enumerate(CORPUS):
        pieces, n = out[i]
        assert n == len(pieces)
        # lossless: joining the pieces reproduces the words in order
        rebuilt = "".join(pieces).replace(bpe_train.END, " ").strip()
        assert rebuilt == " ".join(text.lower().split())


def test_tokenize_corpus_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "low low"), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = bpe_train.learn_bpe(docs, n_merges=4)
    out = {r["doc_id"]: list(r["pieces"])
           for r in bpe_train.tokenize_corpus(docs, merges).collect()}
    assert out[1] == [] and out[2] == []
    assert "".join(out[0]).count(bpe_train.END) == 2
