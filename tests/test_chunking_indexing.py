"""Chunking and global-index operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import chunking, indexing


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_documents(df, chunk_tokens=50, overlap=10).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 40 over 120 tokens → starts 0, 40, 80 → 3 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in rows] == [50, 50, 40]
    assert rows[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # overlap: chunk 1 starts 10 tokens before chunk 0 ends
    assert rows[1]["chunk_text"].split()[0] == "w40"
    assert rows[0]["chunk_text"].split()[-1] == "w49"
    # full coverage
    seen = {t for r in rows for t in r["chunk_text"].split()}
    assert seen == {f"w{i}" for i in range(120)}


def test_chunking_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "only three tokens"), (4, " \n\t ")],
        "doc_id long, text string",
    )
    rows = chunking.chunk_documents(df, chunk_tokens=50, overlap=10).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["n_chunk_tokens"] == 3 and rows[0]["chunk_text"] == "only three tokens"


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_tokens=10, overlap=10)


def test_global_index_matches_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(500)], "doc_id long, x long"
    )
    got = {
        r["doc_id"]: r["global_idx"]
        for r in indexing.with_global_index(
            df, key="x", tiebreaker="doc_id", ascending=False, num_buckets=7
        ).collect()
    }
    ordered = sorted(range(500), key=lambda i: (-((i * 37) % 101), i))
    want = {i: rank + 1 for rank, i in enumerate(ordered)}
    assert got == want


def test_global_index_contiguous_and_partitioning_invariant(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(300)], "doc_id long, k long")
    a = indexing.with_global_index(df, key="k", tiebreaker="doc_id", num_buckets=5)
    b = indexing.with_global_index(
        df.repartition(11), key="k", tiebreaker="doc_id", num_buckets=3
    )
    ga = sorted(r["global_idx"] for r in a.collect())
    assert ga == list(range(1, 301))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_index_null_keys_match_window_null_ordering(spark):
    """Null keys rank exactly where row_number() OVER (ORDER BY ...) puts
    them: last for desc, first for asc (ADVICE r3)."""
    rows = [(0, 10), (1, None), (2, 30), (3, None), (4, 20)]
    df = spark.createDataFrame(rows, "doc_id long, x long")

    def window_want(asc):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        order = F.col("x").asc() if asc else F.col("x").desc()
        w = Window.orderBy(order, F.col("doc_id").asc())
        return {
            r["doc_id"]: r["idx"]
            for r in df.withColumn(
                "idx", F.row_number().over(w)
            ).collect()
        }

    for asc in (True, False):
        got = {
            r["doc_id"]: r["global_idx"]
            for r in indexing.with_global_index(
                df, key="x", tiebreaker="doc_id", ascending=asc, num_buckets=3
            ).collect()
        }
        assert got == window_want(asc), f"ascending={asc}"
