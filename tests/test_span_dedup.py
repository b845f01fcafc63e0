"""span_dedup (ExactSubstr-style, Lee et al. 2022): parity against a
direct single-process reference implementation, plus edge semantics."""

from __future__ import annotations

import random

from pdf_parser_spark.operators import dedupe


def _ref_span_dedup(docs: dict[int, str], k: int):
    """Reference: mark duplicated k-gram start positions (keeping the
    global min-(doc,pos) occurrence), union the [p, p+k) windows, cut."""
    toks = {d: t.split() for d, t in docs.items()}
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p : p + k]), []).append((d, p))
    removed = {d: set() for d in toks}
    for lst in occ.values():
        if len(lst) >= 2:
            first = min(lst)
            for d, p in lst:
                if (d, p) != first:
                    removed[d].update(range(p, p + k))
    return {
        d: (
            " ".join(w for i, w in enumerate(ws) if i not in removed[d]),
            len(ws),
            len(removed[d]),
        )
        for d, ws in toks.items()
    }


def _run(spark, docs: dict[int, str], k: int, **kw):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = dedupe.span_dedup(df, k=k, **kw).collect()
    return {
        r["doc_id"]: (r["dedup_text"], r["n_tokens"], r["n_removed"])
        for r in rows
    }


def _corpus():
    """Deterministic corpus with cross-doc shared passages, a within-doc
    repeat, a doc shorter than k, and unique filler."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    shared_a = "alpha beta gamma delta epsilon zeta".split()
    shared_b = "one two three four five six seven eight".split()
    docs = {}
    for d in range(8):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(40)]
        if d in (1, 3, 5):  # shared passage A at varying offsets
            words[5 : 5 + len(shared_a)] = shared_a
        if d in (2, 3):  # shared passage B
            words[20 : 20 + len(shared_b)] = shared_b
        docs[d] = " ".join(words)
    docs[8] = " ".join(shared_a * 3)  # within-doc repeat
    docs[9] = "too short"  # shorter than k
    return docs


def test_span_dedup_matches_reference(spark):
    docs = _corpus()
    for k in (4, 6):
        got = _run(spark, docs, k)
        want = _ref_span_dedup(docs, k)
        assert got == want, f"k={k}"


def test_span_dedup_raw_gram_path_matches_hashed(spark):
    docs = _corpus()
    assert _run(spark, docs, 5, hash_grams=False) == _run(spark, docs, 5)


def test_span_dedup_first_occurrence_survives_whole(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    docs = {0: f"head0 {shared} tail0", 1: f"head1 {shared} tail1"}
    got = _run(spark, docs, 5)
    assert got[0][0] == docs[0]  # first doc untouched
    assert got[1] == ("head1 tail1", 12, 10)


def test_span_dedup_within_doc_repeat_keeps_first_copy(spark):
    phrase = "p q r s t"
    docs = {0: f"{phrase} mid1 mid2 mid3 {phrase}"}
    got = _run(spark, docs, 5)
    assert got[0] == (f"{phrase} mid1 mid2 mid3", 13, 5)


def test_span_dedup_internal_consistency(spark):
    got = _run(spark, _corpus(), 4)
    for text, n_tokens, n_removed in got.values():
        kept = len(text.split()) if text else 0
        assert kept + n_removed == n_tokens
