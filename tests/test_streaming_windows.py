"""Watermarked tumbling-window aggregation: stream == batch, late-data drop."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from pdf_parser_spark.streaming.windows import windowed_txn_stats

TXN_SCHEMA = "txn_id string, amount double, sourceType string, ts timestamp"


def _rows():
    h = lambda hh, mm=0: datetime(2024, 3, 1, hh, mm)
    return [
        ("a", 10.0, "bank", h(9, 5)),
        ("b", -4.0, "bank", h(9, 55)),
        ("c", 7.5, "card", h(9, 30)),
        ("d", 1.0, "bank", h(10, 10)),
        ("e", 2.0, "card", h(11, 59)),
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["txn_id", "amount", "sourceType", "ts"]),
        schema=TXN_SCHEMA,
    )


def test_batch_windowing(spark):
    out = windowed_txn_stats(_df(spark, _rows()), "1 hour").collect()
    key = {(r["window_start"].hour, r["sourceType"]): (r["n_txns"], r["total_amount"]) for r in out}
    assert key[(9, "bank")] == (2, 6.0)
    assert key[(9, "card")] == (1, 7.5)
    assert key[(10, "bank")] == (1, 1.0)
    assert key[(11, "card")] == (1, 2.0)


@pytest.mark.slow
def test_stream_finalizes_windows_and_drops_late(spark, tmp_path):
    """Two query runs over one checkpoint: the persisted watermark makes the
    hour-9 windows final in run 1, so a straggler arriving before run 2 is
    dropped rather than re-opening them (append-mode finality, S3)."""
    src = str(tmp_path / "txns")
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def run(_name_suffix):
        # file sink (memory sink cannot recover from a checkpoint)
        q = (
            windowed_txn_stats(
                spark.readStream.schema(TXN_SCHEMA).parquet(src),
                "1 hour",
                "2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    # run 1: hours 9-11 plus a 16:00 event → watermark 14:00 persisted,
    # hour-9/10/11 windows emitted as FINAL
    _df(spark, _rows()).coalesce(1).write.mode("append").parquet(src)
    _df(spark, [("f", 100.0, "bank", datetime(2024, 3, 1, 16, 0))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got1 = run("a").collect()
    by_key = {(r["window_start"].hour, r["sourceType"]): r["total_amount"] for r in got1}
    assert by_key[(9, "bank")] == 6.0
    assert by_key[(9, "card")] == 7.5
    assert by_key[(10, "bank")] == 1.0

    # run 2: a 9:40 straggler, far behind the persisted 14:00 watermark —
    # dropped; no window re-emission, hour-9 totals unchanged
    _df(spark, [("late", 999.0, "bank", datetime(2024, 3, 1, 9, 40))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = run("b").collect()  # cumulative file-sink contents
    assert all(r["total_amount"] != 999.0 for r in got2)
    n_hour9_bank = [
        r for r in got2 if r["window_start"].hour == 9 and r["sourceType"] == "bank"
    ]
    assert len(n_hour9_bank) == 1, "final hour-9 window must not re-emit"
    assert n_hour9_bank[0]["total_amount"] == 6.0
