"""StreamingCorpusRollup: per-drop ingestion equals a one-shot batch
build, replay after checkpoint loss is a no-op, and a crash-replayed
batch id never double-counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.plans.corpus_report import CorpusRollup
from pdf_parser_spark.streaming.rollup_stream import StreamingCorpusRollup

SCHEMA = "doc_id long, lang string, text string"


def _rows(lo, hi):
    return [
        (
            i,
            "en" if i % 2 == 0 else "de",
            f"common words plus unique w{i % 50} x{i % 7} filler text",
        )
        for i in range(lo, hi)
    ]


def _drop(spark, path, name, rows):
    # flat files: readStream.parquet does not recurse into subdirectories
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        f"{path}/_stage_{name}"
    )
    import glob
    import shutil

    src = glob.glob(f"{path}/_stage_{name}/part-*.parquet")[0]
    shutil.move(src, f"{path}/{name}.parquet")
    shutil.rmtree(f"{path}/_stage_{name}")


def test_stream_equals_oneshot_and_replay_noop(spark, tmp_path):
    src = str(tmp_path / "drops")
    import os

    os.makedirs(src)
    _drop(spark, src, "d1", _rows(0, 120))
    _drop(spark, src, "d2", _rows(120, 240))

    ing = StreamingCorpusRollup(
        spark, src, str(tmp_path / "roll"), str(tmp_path / "ckpt"), SCHEMA
    )
    out = ing.run_available_now()
    assert out["batches_committed"] == 2

    oneshot = CorpusRollup(spark, str(tmp_path / "one"))
    oneshot.ingest(
        spark.read.schema(SCHEMA).parquet(src), batch_id=99
    )
    rs = {r["lang"]: r.asDict() for r in ing.report().collect()}
    ro = {r["lang"]: r.asDict() for r in oneshot.report().collect()}
    for lang in ("en", "de"):
        for col in ("n_docs", "n_tokens", "distinct_tokens_est",
                    "distinct_tokens_kmv", "len_p50", "len_p99"):
            assert rs[lang][col] == ro[lang][col], (lang, col)

    # checkpoint loss → full source replay; batch-id idempotency makes it
    # a no-op (no new versions, identical report)
    v_before = ing.rollup.table.current_version()
    replay = StreamingCorpusRollup(
        spark, src, str(tmp_path / "roll"), str(tmp_path / "ckpt2"), SCHEMA
    )
    replay.run_available_now()
    assert replay.rollup.table.current_version() == v_before
    rs2 = {r["lang"]: r.asDict() for r in replay.report().collect()}
    assert rs2 == rs


def test_direct_double_ingest_is_noop(spark, tmp_path):
    roll = CorpusRollup(spark, str(tmp_path / "r"))
    docs = spark.createDataFrame(_rows(0, 80), SCHEMA)
    v1 = roll.ingest(docs, batch_id=7)
    v2 = roll.ingest(docs, batch_id=7)  # crash-replay of a committed batch
    assert v1 == v2
    total = roll.report().agg(F.sum("n_docs")).first()[0]
    assert total == 80  # not 160
