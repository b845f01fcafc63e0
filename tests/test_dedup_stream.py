"""StreamingDedupIngest: cross-drop dedup through the streaming sink,
exactly-once corpus commits, crash-after-index recovery."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from pdf_parser_spark.streaming.dedup_stream import StreamingDedupIngest

SCHEMA = "doc_id long, text string"


def _text(seed: int, n: int = 60) -> str:
    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(500)}" for _ in range(n))


def _drop(spark, path: str, name: str, rows) -> None:
    """Deliver one flat parquet file into the watched directory."""
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(rows, SCHEMA)
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def _ingest(spark, tmp_path):
    src = str(tmp_path / "drops")
    os.makedirs(src, exist_ok=True)
    return (
        StreamingDedupIngest(
            spark, src, str(tmp_path / "tables"),
            str(tmp_path / "ckpt"), SCHEMA,
        ),
        src,
    )


def test_streaming_dedup_across_drops(spark, tmp_path):
    ing, src = _ingest(spark, tmp_path)
    _drop(spark, src, "d1", [(1, _text(1)), (2, _text(2)), (3, _text(1))])
    stats = ing.run_available_now()
    assert stats["batches_committed"] == 1
    assert sorted(
        r["doc_id"] for r in ing.output().select("doc_id").collect()
    ) == [1, 2]

    # a later drop repeating an indexed text must not re-enter the corpus
    _drop(spark, src, "d2", [(10, _text(2)), (11, _text(9))])
    stats = ing.run_available_now()
    assert stats["batches_committed"] == 2
    assert sorted(
        r["doc_id"] for r in ing.output().select("doc_id").collect()
    ) == [1, 2, 11]


def test_streaming_dedup_replay_is_noop(spark, tmp_path):
    ing, src = _ingest(spark, tmp_path)
    _drop(spark, src, "d1", [(1, _text(1))])
    ing.run_available_now()
    v = ing.corpus.current_version()
    # re-running with nothing new must not add snapshots
    ing.run_available_now()
    assert ing.corpus.current_version() == v


def test_crash_after_index_before_corpus_recovers(spark, tmp_path):
    """Simulate the worst window: the index committed the batch, the
    corpus did not, and the stream checkpoint was lost (full replay)."""
    ing, src = _ingest(spark, tmp_path)
    rows = [(1, _text(1)), (2, _text(2)), (3, _text(1))]
    _drop(spark, src, "d1", rows)
    # crash: only the index half runs (batch id 0 = first stream batch)
    ing.index.dedup_batch(spark.createDataFrame(rows, SCHEMA), 0)
    assert ing.corpus.current_version() == 0

    ing.run_available_now()  # replay completes the corpus commit
    assert sorted(
        r["doc_id"] for r in ing.output().select("doc_id").collect()
    ) == [1, 2]
    # and the index was not double-appended
    n = (
        ing.index.sigs.read()
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n == 1
