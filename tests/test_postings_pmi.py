"""Inverted-index postings, bigram PMI, and anchor-text extraction."""

from __future__ import annotations

import math

import pytest

from pdf_parser_spark.operators import indexing, linkgraph, textstats


def test_postings_topk_and_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana banana"),
            (3, "apple"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["term"], r["rank"]): (r["doc_id"], r["tf"], r["df_docs"])
        for r in indexing.postings(docs, top_k=2).collect()
    }
    # apple: df=3; top by tf: doc1 (2), then doc2/doc3 tie at 1 → doc2 wins
    assert rows[("apple", 1)] == (1, 2, 3)
    assert rows[("apple", 2)] == (2, 1, 3)
    # banana: df=2; doc2 (3) then doc1 (1)
    assert rows[("banana", 1)] == (2, 3, 2)
    assert rows[("banana", 2)] == (1, 1, 2)
    assert ("apple", 3) not in rows  # capped at top_k


def test_bigram_pmi_hand_computed(spark):
    # corpus: "a b" x 5 and "a c" x 5 → bigrams: (a,b)=5, (a,c)=5
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(5)] + [(i + 5, "a c") for i in range(5)],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): (r["c_ab"], r["pmi"])
           for r in textstats.bigram_pmi(docs, top_k=10, min_count=5).collect()}
    # unigrams: a=10, b=5, c=5, n_uni=20; bigrams: n_bi=10
    want = round(math.log((5 / 10) / ((10 / 20) * (5 / 20))), 4)
    assert got == {("a", "b"): (5, want), ("a", "c"): (5, want)}


def test_bigram_pmi_min_count_floor(spark):
    docs = spark.createDataFrame(
        [(0, "x y x y x y x y x y"), (1, "p q")], "doc_id long, text string"
    )
    got = {(r["a"], r["b"]) for r in
           textstats.bigram_pmi(docs, top_k=10, min_count=5).collect()}
    assert ("p", "q") not in got  # below the floor
    assert ("x", "y") in got


def test_extract_anchors_pairs(spark):
    df = spark.createDataFrame(
        [
            (
                "https://s.com/p",
                '<a href="https://t.com/a">first</a> noise '
                '<a class="x" href="https://u.org/b" rel="nofollow">second</a>',
            )
        ],
        "url string, html string",
    )
    got = {(r["out_url"], r["anchor"])
           for r in linkgraph.extract_anchors(df).collect()}
    assert got == {
        ("https://t.com/a", "first"),
        ("https://u.org/b", "second"),
    }


def test_host_anchor_rollup(spark):
    df = spark.createDataFrame(
        [
            ("s1", '<a href="https://T.com:443/a">buy</a><a href="https://t.com/b">buy</a>'),
            ("s2", '<a href="http://t.com/c">sale</a><a href="/rel">skip</a>'),
        ],
        "url string, html string",
    )
    rows = linkgraph.host_anchor_rollup(linkgraph.extract_anchors(df)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["host"], r["n_anchors"], r["n_distinct_anchors"]) == ("t.com", 3, 2)
    assert r["anchors_csv"] == "buy,sale"


def test_bigram_pmi_empty_corpus(spark):
    docs = spark.createDataFrame([(0, ""), (1, "   "), (2, None)],
                                 "doc_id long, text string")
    out = textstats.bigram_pmi(docs, top_k=5, min_count=1)
    assert out.count() == 0
    assert out.columns == ["a", "b", "c_ab", "pmi"]
