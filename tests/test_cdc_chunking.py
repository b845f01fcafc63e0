"""Content-defined chunking: boundary re-alignment after edits (the
property fixed-stride chunking lacks), size clamps, utf-8 seam safety,
and the dedup-stats payoff on a planted near-duplicate corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators.cdc_chunking import (
    cdc_boundaries,
    cdc_chunks,
    chunk_dedup_stats,
    with_cdc_chunks,
)


def _text(n=4000, seed=7):
    # deterministic pseudo-text with enough byte variety to cut on
    words = []
    x = seed
    for i in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        words.append(f"w{x % 9973}")
    return " ".join(words)


def test_boundaries_respect_clamps():
    data = _text().encode()
    avg = 256
    cuts = cdc_boundaries(data, avg_size=avg)
    assert cuts[-1] == len(data)
    sizes = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(s <= avg * 4 for s in sizes)
    assert all(s >= avg // 4 for s in sizes[:-1])  # tail may be short
    # expected size is in the right ballpark
    mean = sum(sizes) / len(sizes)
    assert avg / 3 < mean < avg * 3


def test_edit_realigns_boundaries():
    """Insert one word at the front: fixed-stride would shift EVERY
    chunk; CDC re-aligns, so most chunks are shared byte-for-byte."""
    base = _text()
    edited = "inserted " + base
    a = {t for _, _, t in cdc_chunks(base, avg_size=256)}
    b = {t for _, _, t in cdc_chunks(edited, avg_size=256)}
    shared = len(a & b)
    assert shared / len(a) > 0.8, (shared, len(a))


def test_utf8_seam_safety():
    # multi-byte chars must never split across a chunk seam
    s = ("héllo wörld çafé " * 400).strip()
    chunks = cdc_chunks(s, avg_size=64)
    joined = "".join(t for _, _, t in chunks)
    assert joined == " ".join(s.split())
    for _, _, t in chunks:
        t.encode("utf-8")  # every piece is valid text


def test_validation_and_empty():
    with pytest.raises(ValueError):
        cdc_boundaries(b"abc", avg_size=100)  # not a power of two
    assert cdc_chunks("") == []
    assert cdc_chunks(None) == []
    assert cdc_chunks("   ") == []


def test_spark_dedup_stats_on_planted_neardups(spark):
    base = _text(3000)
    rows = [(0, base)]
    # 9 near-duplicates, each with a one-word edit at a different site
    words = base.split(" ")
    for i in range(1, 10):
        w = list(words)
        w[i * 250] = "EDIT"
        rows.append((i, " ".join(w)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = with_cdc_chunks(docs, avg_size=256)
    stats = chunk_dedup_stats(chunks).first()
    # near-identical docs share most chunk bytes
    assert stats["dup_byte_frac"] > 0.7, stats
    assert stats["distinct_bytes"] < stats["total_bytes"]
    # the chunk table itself is a single python stage: no exchange below it
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
