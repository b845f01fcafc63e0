"""Parity: native-column scalar ports (functions/scalar.py) vs the pure
extraction_core golden functions, over adversarial inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark import extraction_core as core
from pdf_parser_spark.functions import scalar as fns


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4, app_name="fns-test")


def test_valid_amount_parity(spark):
    vals = [None, 0.0, 0.005, 0.01, -0.01, 5.0, -0.009, 0.0099999, 100.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, amount double")
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", fns.valid_amount_col(F.col("amount")).alias("ok")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == core.is_valid_amount(v), (i, v)


_B9_CASES = [
    ("Interest charge summary", "01/05/2023", 150.0),
    ("Interest charge summary", "01/05/2023", 99.99),
    ("Interest charge summary", "11/05/2023", 150.0),  # after cutoff
    ("Pay Over Time balance", "09/30/2023", -120.0),
    ("APR", "02/29/2020", 500.0),
    ("summary of account activity for the period shown", "01/01/2020", 500.0),
    ("regular purchase at store", "01/01/2020", 500.0),
    ("Monthly SUMMARY", "not-a-date", 500.0),
    ("Monthly SUMMARY", "", 500.0),
    ("Monthly SUMMARY", "09/30/2023", None),
    (None, "01/01/2020", 500.0),
    ("interest", "1/5/2023", 100.0),  # non-padded date, both parsers accept
    # whitespace parity: python .split() semantics — a leading tab must NOT
    # create a phantom token that flips the <=6-word gate at the boundary
    ("\tinterest one two three four five", "01/05/2023", 150.0),
    ("interest\n charge  with\ttabs and newline", "01/05/2023", 150.0),
    ("  apr  ", "01/05/2023", 200.0),
]


def test_summary_interest_parity(spark):
    rows = [(i, m, d, a) for i, (m, d, a) in enumerate(_B9_CASES)]
    df = spark.createDataFrame(rows, "i int, memo string, date string, amount double")
    got = {
        r["i"]: r["ok"]
        for r in df.select(
            "i",
            fns.summary_interest_col(F.col("memo"), F.col("date"), F.col("amount")).alias("ok"),
        ).collect()
    }
    for i, (m, d, a) in enumerate(_B9_CASES):
        assert got[i] == core.looks_like_summary_interest_row(m, d, a), (i, m, d, a)


_NUM_CASES = [
    "$1,234.56", "(45.00)", "refund", "", "12.3.4", "USD 99", "-0.5",
    "1-2", "balance due 42.10 now", "($ 1,000.00 )", ".", "--", "(0.00)",
    "3.14 apples 2", "()", "(abc)", "( 7 )", "-", "1.",
]


def test_to_number_and_fragment_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_NUM_CASES)], "i int, raw string"
    )
    got = {
        r["i"]: (r["num"], r["frag"])
        for r in df.select(
            "i",
            fns.to_number_col(F.col("raw")).alias("num"),
            fns.amount_fragment_col(F.col("raw")).alias("frag"),
        ).collect()
    }
    for i, s in enumerate(_NUM_CASES):
        assert got[i][0] == pytest.approx(core.to_number(s)), (i, s)
        assert got[i][1] == pytest.approx(core.parse_amount_fragment(s)), (i, s)


_CONTRA_CASES = [
    "Accumulated Depreciation (Contra Asset)",
    "Sales - Contra revenue adjustments",
    "Refunds and Discounts (Contra-Revenue)",
    "Plain Operating Account",
    "Foo - (Contra X) Bar",
    "Gross Revenue (contra) - net of returns",
    "A (contra one) (contra two) B",
    "Allowance  -  doubtful (no strip here)",
    "",
    None,
    "(contra)",
    "X - (keep this)",
    "Tail - something CONTRA here",
]


def test_clean_contra_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_CONTRA_CASES)], "i int, label string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", fns.clean_contra_col(F.col("label")).alias("out")).collect()
    }
    for i, s in enumerate(_CONTRA_CASES):
        assert got[i] == core.clean_contra(s), (i, s)


_D4_CASES = [
    "6220 - Meals & Entertainment",
    "meals & entertainment",
    "Legal Fees",
    "travel lodging expense",
    "bank fees software",
    "zzz qqq unmatched tokens",
    "",
    None,
    "  ",
    "7090 - Uncategorized Expense",
    "consulting",
    "shipping supplies packaging",
    "SUBSCRIPTION revenue",
    "checking",
    # whitespace parity: python .strip() strips tabs/newlines, so '\tRent'
    # must still hit the exact/substring tiers
    "\tRent",
    "Legal Fees\n",
    " 6220 - Meals & Entertainment \t",
    "\t \n",  # whitespace-only: truthy raw → strips to '' → FIRST account
    "meals\t&\tentertainment",  # tabs are NOT token separators (split(' '))
]


def test_force_map_to_allowed_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_D4_CASES)], "i int, chosen string"
    )
    out = fns.force_map_to_allowed(df, "chosen")
    got = {r["i"]: r["mapped_account"] for r in out.collect()}
    for i, s in enumerate(_D4_CASES):
        assert got[i] == core.force_map_to_allowed(s, core.ALLOWED_ACCOUNTS), (i, s)


# ---------------------------------------------------------------------------
# source-account per-page semantics (round-1 parity nit)
# ---------------------------------------------------------------------------


def test_source_account_first_match_per_page_last_page_wins():
    # one page with TWO matches: the reference's per-page `search` takes the
    # FIRST (11111), not the last
    page1 = "Account Ending 1-11111\nsome text\nAccount Ending 1-22222"
    assert core.extract_source_account([page1]) == "AMEX 11111"
    # last matching page wins across pages; a trailing no-match page keeps it
    page2 = "Account Ending 1-33333\nmore"
    page3 = "no account info here"
    assert core.extract_source_account([page1, page2, page3]) == "AMEX 33333"
    assert core.extract_source_account([page3]) == "Unknown Source"


def test_layout_page_texts_roundtrip():
    from pdf_parser_spark import pdf_layout

    # 130 lines → 3 pages at LINES_PER_PAGE=60
    text = "\n".join(f"line {i} of the statement" for i in range(130))
    chars = pdf_layout.synthesize_char_boxes(text)
    full, _spans, pages = pdf_layout.extract_layout_text(chars, return_pages=True)
    assert full == text
    assert len(pages) == 3
    assert "\n".join(pages) == text
