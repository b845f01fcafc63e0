"""Stratified sampling, sessionization, and TF-IDF operator tests."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import sampling, sessions, textstats

# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_strata(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], ["web", "pdf"][i % 2], f"text {i}")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")


def test_stratified_sample_exactly_k_per_stratum(spark, docs_strata):
    out = sampling.stratified_sample(docs_strata, ["lang", "source"], k=5, id_col="doc_id")
    counts = {
        (r["lang"], r["source"]): r["n"]
        for r in out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    # 6 strata, 20 docs each: every stratum yields exactly k
    assert len(counts) == 6 and set(counts.values()) == {5}


def test_stratified_sample_is_order_and_partitioning_invariant(spark, docs_strata):
    base = sampling.stratified_sample(docs_strata, ["lang", "source"], k=5, id_col="doc_id")
    shuffled = sampling.stratified_sample(
        docs_strata.repartition(7, "text").orderBy(F.col("doc_id").desc()),
        ["lang", "source"],
        k=5,
        id_col="doc_id",
    )
    a = sorted((r["doc_id"], r["sample_rank"]) for r in base.collect())
    b = sorted((r["doc_id"], r["sample_rank"]) for r in shuffled.collect())
    assert a == b


def test_stratified_sample_matches_scalar_md5_ranking(spark, docs_strata):
    """The rank key is plain md5-of-id-string — recompute it driver-side."""
    ids = [r["doc_id"] for r in docs_strata.filter(
        (F.col("lang") == "en") & (F.col("source") == "web")).collect()]
    expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
    got = [
        r["doc_id"]
        for r in sampling.stratified_sample(docs_strata, ["lang", "source"], k=5, id_col="doc_id")
        .filter((F.col("lang") == "en") & (F.col("source") == "web"))
        .orderBy("sample_rank")
        .collect()
    ]
    assert got == expect


def test_stratified_sample_is_locally_stable_under_growth(spark, docs_strata):
    """Consistent-sampling property: adding docs only perturbs the sample by
    displacement — every doc sampled from the grown corpus that existed in
    the small corpus was sampled there too (hash ranks never reorder)."""
    small = docs_strata.filter(F.col("doc_id") < 60)
    s_small = {
        r["doc_id"]
        for r in sampling.stratified_sample(small, ["lang", "source"], k=5, id_col="doc_id").collect()
    }
    s_big = {
        r["doc_id"]
        for r in sampling.stratified_sample(docs_strata, ["lang", "source"], k=5, id_col="doc_id").collect()
    }
    assert {d for d in s_big if d < 60} <= s_small


# ---------------------------------------------------------------------------
# sessionize / session_rollup
# ---------------------------------------------------------------------------


def _ts(minute: int, second: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 3, 1, 10, minute, second)


@pytest.fixture(scope="module")
def events_gaps(spark):
    rows = [
        # user 1: 3 events within 30 min, then a 31-min gap → 2 sessions
        (1, 1, _ts(0), 10.004),
        (2, 1, _ts(10), 20.0),
        (3, 1, _ts(29), 0.105),
        (4, 1, _ts(0) + datetime.timedelta(minutes=60, seconds=1), 5.0),
        # user 2: single event
        (5, 2, _ts(5), 1.0),
        # user 3: boundary — gap of exactly 1800s stays in-session
        (6, 3, _ts(0), 1.0),
        (7, 3, _ts(30), 2.0),
        (8, 3, _ts(30) + datetime.timedelta(seconds=1801), 4.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_sessionize_gap_rule(spark, events_gaps):
    out = sessions.sessionize(events_gaps, gap_seconds=1800)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1, 7: 1, 8: 2}


def test_session_rollup_exact_cents(spark, events_gaps):
    out = sessions.session_rollup(sessions.sessionize(events_gaps, gap_seconds=1800))
    row = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    u1s1 = row[(1, 1)]
    assert u1s1["n_events"] == 3
    # 10.004 + 20.0 + 0.105 → round per-event cents: 1000 + 2000 + 11 (0.105
    # doubles to 10.500000000000000888..., HALF_UP → 11)
    assert u1s1["value_cents"] == 3011
    assert u1s1["session_start_s"] == int(_ts(0).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert row[(3, 1)]["n_events"] == 2  # 1800s gap is NOT a new session


def test_sessionize_is_arrival_order_invariant(spark, events_gaps):
    base = sessions.sessionize(events_gaps, gap_seconds=1800)
    scrambled = sessions.sessionize(
        events_gaps.orderBy(F.col("value").desc()).repartition(5, "value"),
        gap_seconds=1800,
    )
    a = sorted((r["event_id"], r["session_id"]) for r in base.collect())
    b = sorted((r["event_id"], r["session_id"]) for r in scrambled.collect())
    assert a == b


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_matches_hand_computation(spark):
    corpus = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["term"]: r for r in textstats.tfidf_top_terms(df, k=10).collect()}
    # apple: tf=2, df=1 → 2·ln(3)
    assert out["apple"]["total_occurrences"] == 2
    assert out["apple"]["doc_freq"] == 1
    assert out["apple"]["tfidf"] == pytest.approx(round(2 * math.log(3), 4))
    # banana: tf=2, df=2 → 2·ln(1.5)
    assert out["banana"]["tfidf"] == pytest.approx(round(2 * math.log(1.5), 4))
    # durian: tf=1, df=1 → ln(3)
    assert out["durian"]["tfidf"] == pytest.approx(round(math.log(3), 4))


def test_tfidf_top_k_ordering_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "tie tie other%d" % (i % 4)) for i in range(8)], "doc_id long, text string"
    )
    out = textstats.tfidf_top_terms(df, k=3).collect()
    ranks = [(r["tfidf"], r["term"]) for r in out]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


# ------------------------------------------------------------ per_group_cap


def test_per_group_cap_keeps_best_rows(spark):
    from pdf_parser_spark.operators.sampling import per_group_cap

    rows = [
        ("a.com", i, float(i % 5)) for i in range(10)
    ] + [("b.com", 100, 9.0)]
    df = spark.createDataFrame(rows, "host string, doc_id long, q double")
    out = per_group_cap(df, "host", 3, "q", "doc_id").collect()
    got = sorted((r["host"], r["doc_id"]) for r in out)
    # a.com: best q=4.0 at ids 4,9 then q=3.0 at id 3 (tie → smaller id)
    assert got == [("a.com", 3), ("a.com", 4), ("a.com", 9), ("b.com", 100)]


def test_per_group_cap_compiles_to_window_group_limit(spark):
    from pdf_parser_spark.operators.sampling import per_group_cap

    df = spark.range(100).select(
        (F.col("id") % 3).alias("host"), F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("q"),
    )
    plan = (
        per_group_cap(df, "host", 2, "q", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# ------------------------------------------------------------- dedup_lines


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    from pdf_parser_spark.operators.textstats import dedup_lines

    doc = "Share this\nreal paragraph one\nShare this\nreal two\nShare this"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = dedup_lines(df).collect()[0]
    assert r["dedup_text"] == "Share this\nreal paragraph one\nreal two"
    assert (r["n_lines"], r["n_dup_lines"]) == (5, 2)


def test_dedup_lines_short_line_guard(spark):
    from pdf_parser_spark.operators.textstats import dedup_lines

    doc = "a\n\nx long enough line\n\na\nx long enough line"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = dedup_lines(df, min_line_chars=2).collect()[0]
    # blank and one-char lines survive; only the long line dedups
    assert r["dedup_text"] == "a\n\nx long enough line\n\na"
    assert r["n_dup_lines"] == 1


def test_dedup_lines_is_zero_exchange(spark):
    from pdf_parser_spark.operators.textstats import dedup_lines

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l1\nl2\nl1\n"), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
