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


def _pack_twin(rows, seq_len):
    """Pure-Python concat-and-cut twin: rows = [(id, order, length)]."""
    out = []
    pos = 0
    for cid, _order, ln in sorted(rows, key=lambda r: (r[1], r[0])):
        if ln <= 0:
            continue
        start, end = pos, pos + ln
        p = start // seq_len
        while p * seq_len < end:
            s = max(0, p * seq_len - start)
            e = min(ln, (p + 1) * seq_len - start)
            out.append((cid, p, max(0, start - p * seq_len), s, e - s))
            p += 1
        pos = end
    return sorted(out)


def _pack_rows(spark, rows, seq_len, partitions=5):
    df = spark.createDataFrame(
        rows, "doc_id long, ord long, n_chunk_tokens long"
    ).repartition(partitions)
    got = chunking.pack_sequences(
        df, seq_len, order_col="ord", id_col="doc_id", num_buckets=4
    )
    return sorted(
        (
            r["doc_id"], r["pack_id"], r["offset_in_pack"],
            r["slice_start"], r["slice_len"],
        )
        for r in got.collect()
    )


def test_pack_sequences_matches_python_twin(spark):
    # lengths 1..13 incl. one chunk longer than seq_len (straddles >= 2
    # packs) and zero-length chunks (dropped)
    rows = [(i, (i * 7) % 41, (i * 5) % 13 + (20 if i == 9 else 0)) for i in range(40)]
    rows += [(100, 999, 0), (101, 1000, 0)]
    assert _pack_rows(spark, rows, seq_len=16) == _pack_twin(rows, 16)


def test_pack_sequences_packs_tile_exactly(spark):
    rows = [(i, i, (i * 3) % 9 + 1) for i in range(60)]
    got = _pack_rows(spark, rows, seq_len=16)
    by_pack: dict[int, list] = {}
    for cid, pid, off, s, ln in got:
        by_pack.setdefault(pid, []).append((off, ln))
    total = sum(r[2] for r in rows)
    last = total // 16 if total % 16 else total // 16 - 1
    for pid, slices in by_pack.items():
        slices.sort()
        cursor = 0
        for off, ln in slices:
            assert off == cursor, (pid, slices)
            cursor += ln
        if pid < last:
            assert cursor == 16, (pid, cursor)
        else:
            assert cursor == total - 16 * last


def test_pack_sequences_partition_invariant(spark):
    rows = [(i, (i * 11) % 29, (i * 5) % 12 + 1) for i in range(50)]
    assert _pack_rows(spark, rows, 10, partitions=1) == _pack_rows(
        spark, rows, 10, partitions=9
    )


def test_prefix_sum_matches_single_partition_window(spark):
    from pyspark.sql import Window

    rows = [(i, (i * 13) % 37, float((i * 7) % 11)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, k long, w double").repartition(7)
    got = indexing.with_global_prefix_sum(
        df, "w", key="k", tiebreaker="id", num_buckets=5, out_col="ps"
    )
    win = Window.orderBy(F.col("k").asc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("ps", F.sum("w").over(win) - F.col("w"))
    g = {r["id"]: r["ps"] for r in got.collect()}
    w_ = {r["id"]: r["ps"] for r in want.collect()}
    assert g == w_


def test_prefix_sum_long_mode_exact_longs(spark):
    rows = [(i, i, (1 << 40) + i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, k long, w long")
    got = indexing.with_global_prefix_sum(
        df, "w", key="k", tiebreaker="id", num_buckets=3,
        out_col="ps", sum_type="long",
    )
    vals = {r["id"]: r["ps"] for r in got.collect()}
    acc = 0
    for i in range(10):
        assert vals[i] == acc and isinstance(vals[i], int)
        acc += (1 << 40) + i


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, 1, 5)], "doc_id long, ord long, n_chunk_tokens long")
    with pytest.raises(ValueError):
        chunking.pack_sequences(df, 0, order_col="ord")


def test_bm25_parity_with_python_reference(spark):
    import math

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog chased the cat around the yard"),
        (2, "a quiet library with books and books and books"),
        (3, "cat cat cat cat"),
        (4, "dogs and cats living together in the yard"),
        (5, "completely unrelated text about spark plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    query = ["cat", "yard", "books"]

    from pdf_parser_spark.operators.indexing import bm25_search

    got = bm25_search(docs, query, k=5).collect()

    # plain-Python reference
    k1, b = 1.2, 0.75
    toks = {i: t.lower().split() for i, t in rows}
    N = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / N
    dfs = {q: sum(1 for w in toks.values() if q in w) for q in query}
    scores = {}
    matched = {}
    for i, ws in toks.items():
        s, m = 0.0, 0
        for q in query:
            tf = ws.count(q)
            if tf == 0:
                continue
            m += 1
            idf = math.log(1 + (N - dfs[q] + 0.5) / (dfs[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if m:
            scores[i], matched[i] = s, m
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    assert [(r["doc_id"], r["n_matched"]) for r in got] == [
        (i, matched[i]) for i, _ in want
    ]
    for r, (i, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-5, (r["doc_id"], r["score"], s)


def test_bm25_query_filter_precedes_exchange(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "doc_id long, text string"
    )
    from pdf_parser_spark.operators.indexing import bm25_search

    df = bm25_search(docs, ["common"], k=3, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_no_redundant_tail_chunk(spark):
    """A final window wholly contained in its predecessor must not be
    emitted — it duplicates training text verbatim."""
    from pdf_parser_spark.operators import chunking as ch

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(45))),   # one chunk covers all
         (2, " ".join(f"w{i}" for i in range(50))),   # exactly chunk_tokens
         (3, " ".join(f"w{i}" for i in range(51))),   # needs a real tail
         (4, " ".join(f"w{i}" for i in range(90)))],  # tail ends exactly at n
        "doc_id long, text string",
    )
    out = ch.chunk_documents(docs, chunk_tokens=50, overlap=10)
    counts = {r["doc_id"]: r["cnt"] for r in
              out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {1: 1, 2: 1, 3: 2, 4: 2}
    # every token still covered, and no chunk is a subset of its neighbor
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"].split()
            for r in out.collect()}
    assert rows[(3, 1)][-1] == "w50"           # tail reaches the end
    assert not set(rows[(4, 1)]) <= set(rows[(4, 0)])


def test_pack_id_uses_integer_division(spark):
    """floor(long/long) routes through a double and mis-assigns packs past
    2^53 corpus tokens; the div must stay in long arithmetic."""
    from pdf_parser_spark.operators import chunking as ch

    big = (1 << 53) + 1  # not representable as a double
    chunks = spark.createDataFrame(
        [(1, big, 2)], "chunk_uid long, order_key long, n_chunk_tokens int"
    )
    # order_key doubles as the prefix-sum key; with one row _start == 0,
    # so exercise the div directly on the internal expression instead:
    from pyspark.sql import functions as SF
    got = spark.createDataFrame([(big,)], "_start long").select(
        SF.expr("_start div 3").alias("d"),
        SF.floor(SF.col("_start") / SF.lit(3).cast("long")).alias("f"),
    ).collect()[0]
    assert got["d"] == big // 3          # exact
    assert got["f"] != big // 3          # the old form demonstrably wrong


def test_prefix_sum_null_weight_matches_single_window(spark):
    """A NULL-weight row gets the PRECEDING rows' sum (window parity),
    not NULL."""
    from pyspark.sql import Window as W

    from pdf_parser_spark.operators.indexing import with_global_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "k long, wt int"
    )
    got = {r["k"]: r["ps"] for r in with_global_prefix_sum(
        df, "wt", key="k", tiebreaker="k", num_buckets=2, out_col="ps",
        sum_type="long",
    ).collect()}
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    expect = {r["k"]: r["ps"] for r in df.withColumn(
        "ps", (F.sum(F.col("wt").cast("long")).over(w)
               - F.coalesce(F.col("wt").cast("long"), F.lit(0))),
    ).collect()}
    assert got == expect == {1: 0, 2: 10, 3: 10}
