"""H1/H2 + B11 — journal derivation: 1 txn → debit + credit rows.

Ref: routes/journal.py:29-51 (entries) and routes/journal_detail.py:100-111
(typed legs). Shadow legs are excluded first (B11, journal.py:36-37); each
surviving txn explodes into two rows via an inline array of structs — a
generator expression, no shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_shadows(txns: DataFrame) -> DataFrame:
    """B11 — drop eventLeader==False or pairReason=='shadow' rows.

    NULL eventLeader/pairReason (unpaired txns) must PASS the filter — the
    reference checks `t.get("eventLeader") is False` (routes/journal.py:36),
    which is False for missing keys, so coalesce NULLs before comparing.
    """
    return txns.filter(
        F.coalesce(F.col("eventLeader"), F.lit(True))
        & (F.coalesce(F.col("pairReason"), F.lit("")) != "shadow")
    )


def journal_entries(txns: DataFrame) -> DataFrame:
    """H1 — debit/credit explosion (ref: routes/journal.py:35-50).

    account leg carries `account` when amount ≥ 0 else `source`; the other
    leg flips; both legs amount = abs(amount). Line ids are
    f"{txn_id}-debit"/"-credit" (deterministic re-spec of the reference's
    positional f"{i}-debit" — position is meaningless in a distributed batch).
    """
    base = filter_shadows(txns)
    amount = F.coalesce(F.col("amount"), F.lit(0.0))
    abs_amt = F.abs(amount)
    account = F.coalesce(F.col("account"), F.lit("Uncategorized"))
    source = F.coalesce(F.col("source"), F.lit("Offset"))
    legs = F.array(
        F.struct(
            F.concat(F.col("txn_id"), F.lit("-debit")).alias("id"),
            F.lit("Debit").alias("type"),
            F.when(amount >= 0, account).otherwise(source).alias("account"),
        ),
        F.struct(
            F.concat(F.col("txn_id"), F.lit("-credit")).alias("id"),
            F.lit("Credit").alias("type"),
            F.when(amount < 0, account).otherwise(source).alias("account"),
        ),
    )
    return (
        base.withColumn("leg", F.explode(legs))
        .select(
            F.col("leg.id").alias("id"),
            F.col("txn_id").alias("txnId"),
            "date",
            "memo",
            F.col("leg.account").alias("account"),
            F.col("leg.type").alias("type"),
            abs_amt.alias("amount"),
        )
    )


def account_type_col(account):
    """G11 as a native expression (ref: routes/journal_detail.py:21-37)."""
    s = F.trim(F.coalesce(account, F.lit("")))
    code = F.regexp_extract(s, r"^(\d+)", 1)
    d = F.substring(code, 1, 1)
    return (
        F.when(d == "1", F.lit("Asset"))
        .when(d == "2", F.lit("Liability"))
        .when(d == "3", F.lit("Equity"))
        .when(d == "4", F.lit("Income"))
        .when(d == "5", F.lit("COGS"))
        .when(d.isin("6", "7", "8", "9"), F.lit("Expense"))
        .when(F.substring(s, -6, 6).rlike(r"\d"), F.lit("Liability"))
        .otherwise(F.lit("Expense"))
    )


def journal_entries_typed(txns: DataFrame) -> DataFrame:
    """H2 — double-entry legs by account type (ref: routes/journal_detail.py:100-111).

    Primary leg is a Debit iff account_type ∈ {Expense, COGS, Asset}.
    """
    abs_amt = F.abs(F.coalesce(F.col("amount"), F.lit(0.0)))
    primary_debit = account_type_col(F.col("account")).isin("Expense", "COGS", "Asset")
    legs = F.array(
        F.struct(
            F.concat(F.col("txn_id"), F.lit("-1")).alias("id"),
            F.col("account").alias("leg_account"),
            F.when(primary_debit, F.lit("Debit")).otherwise(F.lit("Credit")).alias("type"),
        ),
        F.struct(
            F.concat(F.col("txn_id"), F.lit("-2")).alias("id"),
            F.col("source").alias("leg_account"),
            F.when(primary_debit, F.lit("Credit")).otherwise(F.lit("Debit")).alias("type"),
        ),
    )
    return txns.withColumn("leg", F.explode(legs)).select(
        F.col("leg.id").alias("id"),
        F.col("txn_id").alias("txnId"),
        "date",
        "memo",
        F.col("leg.leg_account").alias("account"),
        F.col("leg.type").alias("type"),
        abs_amt.alias("amount"),
    )
