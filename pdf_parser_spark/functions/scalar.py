"""Native-column ports of the SQL-expressible extraction_core scalars.

The pure-Python functions in ``pdf_parser_spark.extraction_core`` are the
byte-identity golden layer (imported by the pandas UDFs and the pytest
oracle). For the subset whose semantics are fully relational — B9 summary
interest, B10 amount sanity, D4 best-token-overlap account mapping, G12
contra-label cleaning, G13 numeric coercion — this module provides
whole-stage-codegen column expressions so they run JVM-side with no Python
in the plan at all. Parity with the pure functions is asserted in
tests/test_functions_scalar.py over adversarial inputs.

Reference lineage (same as the scalar twins):
  B9  (pyc) parse.looks_like_summary_interest_row
  B10 (pyc) parse.is_valid_amount
  D4  utils/classify_transaction.py:15-37 (_force_map_to_allowed)
  G12 routes/coa.py:33-59 (_clean_contra)
  G13 routes/journal.py:7-18 (_to_number); journal_detail.py:45-58
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.extraction_core import ALLOWED_ACCOUNTS, fallback_account


def valid_amount_col(amount):
    """B10 — abs(amount) >= 0.01; NULL → false (mirrors `is_valid_amount`)."""
    return F.coalesce(F.abs(amount) >= 0.01, F.lit(False))


_B9_CUTOFF = "2023-10-01"


def summary_interest_col(memo, date_str, amount):
    """B9 — statement-summary interest heuristic as one boolean expression.

    keyword hit AND <=6 words AND abs(amount)>=100 AND date < 2023-10-01;
    unparseable dates and NULL amounts → false, exactly like the scalar.
    """
    lo = F.lower(F.coalesce(memo, F.lit("")))
    kw = (
        lo.contains("interest")
        | lo.contains("pay over time")
        | lo.contains("apr")
        | lo.contains("summary")
    )
    n_words = F.size(F.split(F.trim(lo), r"\s+"))
    big = F.coalesce(F.abs(amount) >= 100.0, F.lit(False))
    parsed = F.try_to_timestamp(date_str, F.lit("M/d/yyyy"))
    old = F.coalesce(parsed < F.lit(_B9_CUTOFF).cast("timestamp"), F.lit(False))
    return kw & (n_words <= 6) & big & old


def to_number_col(x):
    """G13 — keep chars [0-9.-], cast double, failure → 0.0."""
    s = F.regexp_replace(F.coalesce(x.cast("string"), F.lit("")), r"[^0-9.\-]", "")
    return F.coalesce(s.try_cast("double"), F.lit(0.0))


def amount_fragment_col(x):
    """G13b — digit-keep float with (..)-negation (parse_amount_fragment)."""
    s = F.coalesce(x.cast("string"), F.lit(""))
    neg = s.contains("(") & s.contains(")")
    digits = F.regexp_replace(s, r"[^0-9.\-]", "")
    val = F.coalesce(digits.try_cast("double"), F.lit(0.0))
    return F.when(neg & (val > 0), -val).otherwise(val)


def clean_contra_col(label):
    """G12 — strip '(... contra ...)' groups and ' - … contra …' suffixes.

    Regex port of the scalar's scan loop: any parenthesised group whose body
    mentions 'contra' is removed together with an immediately-preceding
    dash; then a ' - ' suffix whose right side mentions 'contra' is
    truncated; finally space runs collapse. Equivalent to the scalar for
    non-nested parens (the reference never nests; parity-tested).
    """
    t = F.coalesce(label, F.lit(""))
    # repeat twice: removing one group can make a preceding dash adjacent to
    # a later group (the scalar loop restarts its scan after each removal)
    for _ in range(2):
        t = F.regexp_replace(t, r"(?i)\s*-?\s*\([^()]*contra[^()]*\)", " ")
    dash_pos = F.instr(t, " - ")
    right_part = F.lower(F.substring(t, dash_pos + 3, F.lit(1 << 20)))
    t = F.when(
        (dash_pos > 0) & right_part.contains("contra"),
        F.rtrim(F.substring(t, F.lit(1), dash_pos - 1)),
    ).otherwise(t)
    t = F.regexp_replace(t, r" {2,}", " ")
    return F.trim(t)


# ---------------------------------------------------------------------------
# D4 — best-token-overlap mapping as a broadcast-join + window argmax
# ---------------------------------------------------------------------------


def allowed_accounts_df(spark, accounts: list[str] | None = None) -> DataFrame:
    """(idx, account, account_lc, a_tokens) — the tiny broadcast dimension."""
    accounts = accounts if accounts is not None else ALLOWED_ACCOUNTS
    rows = [(i, a) for i, a in enumerate(accounts)]
    df = spark.createDataFrame(rows, "idx int, account string")
    return df.select(
        "idx",
        "account",
        F.lower(F.col("account")).alias("account_lc"),
        F.filter(
            F.split(F.lower(F.col("account")), " "), lambda x: x != ""
        ).alias("a_tokens"),
    )


def force_map_to_allowed(
    df: DataFrame,
    chosen_col: str,
    out_col: str = "mapped_account",
    accounts: list[str] | None = None,
) -> DataFrame:
    """D4 distributed: map every `chosen_col` onto the allowed chart.

    Cascade identical to the scalar `force_map_to_allowed`: exact lowercase
    match, else FIRST (list-order) mutual-substring match, else max
    shared-token count with first-in-list tie-break; empty/NULL input →
    uncategorized fallback. One broadcast cross join against the ~60-row
    chart, then a `min_by` argmin aggregation per row id — partially
    aggregable, so the map side collapses the 60× fan-out to one row per
    input before the exchange (a row_number window would shuffle and sort
    all 60 candidates per row). No Python anywhere in the plan.
    """
    accounts = accounts if accounts is not None else ALLOWED_ACCOUNTS
    allowed = allowed_accounts_df(df.sparkSession, accounts)
    fb = fallback_account(accounts)

    c = F.lower(F.trim(F.coalesce(F.col(chosen_col), F.lit(""))))
    row = df.withColumn("_c", c).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    j = row.crossJoin(F.broadcast(allowed))
    exact = F.col("_c") == F.col("account_lc")
    sub = F.col("account_lc").contains(F.col("_c")) | F.col("_c").contains(
        F.col("account_lc")
    )
    c_tokens = F.filter(F.split(F.col("_c"), " "), lambda x: x != "")
    hits = F.size(
        F.filter(c_tokens, lambda t: F.array_contains(F.col("a_tokens"), t))
    )
    tier = F.when(exact, 0).when(sub, 1).otherwise(2)
    # ordering struct (tier, hits_key, idx) is unique per _rid (idx is
    # unique), so the argmin is deterministic
    order = F.struct(
        tier.alias("t"),
        F.when(tier == 2, -hits).otherwise(F.lit(0)).alias("h"),
        F.col("idx").alias("i"),
    )
    best = j.groupBy("_rid").agg(
        F.min_by(F.col("account"), order).alias("_best_account")
    )
    out = (
        row.join(best, "_rid")
        .withColumn(
            out_col,
            # the scalar falls back only on a falsy *raw* input ('' / None);
            # whitespace-only input strips to '' and then matches the FIRST
            # account via the substring rule ('' is a substring of anything)
            F.when(
                F.col(chosen_col).isNull() | (F.col(chosen_col) == ""),
                F.lit(fb),
            ).otherwise(F.col("_best_account")),
        )
        .drop("_c", "_rid", "_best_account")
    )
    return out
