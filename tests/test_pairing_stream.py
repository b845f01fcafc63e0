"""Structured Streaming stateful pairing (S2 streaming-native variant)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from pdf_parser_spark.streaming import pairing_stream as ps

TXN_SCHEMA = "txn_id string, amount double, sourceType string, dateKey string, ts timestamp"


def _ts(day: int):
    return datetime(2024, 1, 1 + day)


def _write_batch(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["txn_id", "amount", "sourceType", "dateKey", "ts"]),
                          schema=TXN_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src, max_files=1):
    out_name = f"pairs_{abs(hash(src)) % 10_000_000}"
    q = (
        ps.paired_stream(
            spark.readStream.schema(TXN_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
        )
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {out_name}")


# pure-python greedy sweep ---------------------------------------------------


def test_pair_key_group_matches_leader_shadow():
    rows = [("L1", "bank", 1, 10), ("S1", "card", -1, 12)]
    pairs, pool = ps._pair_key_group(rows, [])
    assert pairs == [("L1", "S1", "pair:L1:S1", "card_payment")]
    assert pool == []


def test_pair_key_group_respects_window_and_roles():
    rows = [("L1", "bank", 1, 10), ("S1", "card", -1, 20)]  # 10 days apart
    pairs, pool = ps._pair_key_group(rows, [])
    assert pairs == [] and len(pool) == 2
    # two leaders never pair
    pairs, pool = ps._pair_key_group([("L1", "bank", 1, 10), ("L2", "bank", 1, 11)], [])
    assert pairs == []


def test_pair_key_group_consults_existing_state_first():
    state = [("S0", "loan", -1, 9)]
    rows = [("L1", "bank", 1, 10), ("S1", "card", -1, 10)]
    pairs, pool = ps._pair_key_group(rows, state)
    # arrival-order greedy (mirrors reference pair_on_ingest): when L1 is
    # processed the pool holds only the pre-existing S0, so L1-S0 forms even
    # though S1 (same batch, arrives after) would be date-closer; S1 stays
    # unpaired in state for future leaders
    assert pairs == [("L1", "S0", "pair:L1:S0", "loan_payment")]
    assert [p[0] for p in pool] == ["S1"]


# streaming end-to-end -------------------------------------------------------


@pytest.mark.slow
def test_stream_pairs_within_batch(spark, tmp_path):
    src = str(tmp_path / "txns")
    _write_batch(spark, src, [
        ("L1", 250.0, "bank", "20240110", _ts(9)),
        ("S1", -250.0, "card", "20240112", _ts(11)),
        ("N1", 99.0, "card", "20240110", _ts(9)),   # positive card: no role
        ("N2", -123.45, "loan", "20240110", _ts(9)),  # no matching leader
    ])
    got = _run_stream(spark, src).collect()
    assert {(r["l_id"], r["s_id"], r["pairReason"]) for r in got} == {
        ("L1", "S1", "card_payment")
    }


@pytest.mark.slow
def test_stream_pairs_across_micro_batches_via_state(spark, tmp_path):
    src = str(tmp_path / "txns2")
    _write_batch(spark, src, [("L1", 77.0, "bank", "20240110", _ts(9))])
    _write_batch(spark, src, [("S1", -77.0, "bank", "20240111", _ts(10))])
    got = _run_stream(spark, src, max_files=1).collect()
    assert {(r["l_id"], r["s_id"], r["pairReason"]) for r in got} == {
        ("L1", "S1", "bank_transfer")
    }
