"""Repo-side oracle contract: every queries() entry with an oracle_sql()
runs in Spark AND DuckDB at sf0.001 and must match on column names, row
count, and order-insensitive values — the same comparison the driver
harness performs at sf0.01 (scripts/check_oracle.py is the standalone
twin). Catches registration/cap regressions (the driver's correctness
record holds at most 50 entries) and oracle drift repo-side, before the
judge sees them.
"""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

duckdb = pytest.importorskip("duckdb")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
_ORACLE_NAMES = [n for n in _QUERIES if n in _ORACLES]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _frame_key(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(",".join(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_driver_record_cap_not_exceeded():
    """The driver records the FIRST 50 queries() entries; every
    oracle-backed query must sit inside that window or its green row is
    silently dropped from CORRECTNESS_r*.json (round-3 lesson)."""
    names = list(_QUERIES)
    first_50 = set(names[:50])
    outside = [n for n in _ORACLE_NAMES if n not in first_50]
    assert outside == [], (
        f"oracle-backed queries past the driver's 50-entry record: {outside}"
    )


def test_every_oracle_has_a_query():
    dangling = [n for n in _ORACLES if n not in _QUERIES]
    assert dangling == []


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(_ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(map(str.lower, scols)) == sorted(map(str.lower, ocols)), (
        f"{name}: column names diverge"
    )
    assert len(srows) == len(orows), f"{name}: row counts diverge"
    sk = _frame_key(scols, [[r[c] for c in scols] for r in srows])
    ok = _frame_key(ocols, orows)
    if sk != ok:
        diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
        pytest.fail(f"{name}: values diverge, first diffs: {diffs}")
