"""gopher_rules: exact parity with a row-local Python reference over
adversarial fixtures, and the zero-exchange plan contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pdf_parser_spark.operators.textstats import GOPHER_STOPWORDS, gopher_rules

_BULLETS = ("- ", "* ", "• ", "· ")


def _py_rules(text: str, min_words=50, max_words=100_000) -> dict:
    words = [w for w in re.split(r"\s+", text.strip()) if w]
    n = len(words)
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    mean_wl = sum(len(w) for w in words) / n if n else 0.0
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    n_hash = text.count("#")
    n_ell = text.count("...") + text.count("…")
    bullets = sum(1 for l in lines if any(l.startswith(b) for b in _BULLETS))
    ell_end = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    stops = sum(1 for w in words if w.lower() in GOPHER_STOPWORDS)
    return {
        "ok_word_count": min_words <= n <= max_words,
        "ok_mean_word_len": 3.0 <= mean_wl <= 10.0,
        "ok_alpha_words": (alpha / n if n else 0.0) >= 0.8,
        "ok_symbol_ratio": ((n_hash + n_ell) / n if n else 0.0) <= 0.1,
        "ok_bullet_lines": (bullets / len(lines) if lines else 0.0) <= 0.9,
        "ok_ellipsis_lines": (ell_end / len(lines) if lines else 0.0) <= 0.3,
        "ok_stopwords": stops >= 2,
    }


FIXTURES = [
    # clean prose that passes everything
    "The quick brown fox jumps over the lazy dog and then runs to be "
    "with the pack of hounds that have gathered near the barn. " * 5,
    # too short
    "tiny doc with few words",
    # bullet spam
    "\n".join(f"- item {i} in the endless list of the catalogue" for i in range(40)),
    # ellipsis spam
    "\n".join(f"teaser line {i} continues soon..." for i in range(30))
    + "\nthe final line of the page with and that have to be complete words with",
    # hashtag spam
    ("#tag " * 60) + "the post that have to be seen with everyone",
    # numeric-heavy (alpha-word rule fails)
    " ".join(str(i) for i in range(120)) + " the of and that have with to be",
    # long words (mean word length rule fails)
    " ".join("x" * 15 for _ in range(80)) + " the of and to be that have with",
    # unicode ellipsis and bullets
    "• primero\n• segundo\n… y la línea que termina…\n"
    + "the words of the document that have to be counted with care " * 10,
    # empty and whitespace-only
    "",
    "   \n \n  ",
]


def test_parity_with_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    for i, t in enumerate(FIXTURES):
        want = _py_rules(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, t[:60])
        assert got[i]["gopher_pass"] == all(want.values()), i


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = gopher_rules(df).first()
    assert row["gopher_pass"] is False and row["ok_stopwords"] is False


# ------------------------------------------------ compression ratio


def test_compression_ratio_separates_repetition_from_prose(spark):
    import zlib

    from pdf_parser_spark.operators.textstats import (
        compression_ratio,
        with_compression_ratio,
    )

    prose = ("the quick brown fox jumps over the lazy dog while seventeen "
             "unrelated observers catalog entirely distinct circumstances ")
    repetitive = "buy now click here " * 40
    docs = spark.createDataFrame(
        [(1, prose * 3), (2, repetitive), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["compression_ratio"]
           for r in with_compression_ratio(docs).collect()}
    # spark column == scalar reference, row for row
    assert got[1] == compression_ratio(prose * 3)
    assert got[2] == compression_ratio(repetitive)
    assert got[3] == 1.0 and got[4] == 1.0
    # the signal orders as published: repetitive << prose
    assert got[2] < 0.15 < got[1]
    # and the scalar is the plain zlib arithmetic
    raw = (prose * 3).encode()
    assert got[1] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
