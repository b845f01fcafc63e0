"""Normalization stage: sourceType assignment + display-amount (C2 + G10).

The reference computes displayAmount per row with a Firestore range probe per
transaction (utils/display_amount.py:41-55 — an RPC per row). Here the probe
becomes ONE banded self-join producing a has_bank_match flag, then G10 is a
native `when` chain (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import banding


def assign_source_type(txns: DataFrame, default: str = "bank") -> DataFrame:
    """sourceType column; reference default is 'bank' (main.py:230).

    If the upstream pages table carried a source_type_hint it is used
    (fixtures cycle bank/card/loan per doc — FIXTURES.md F3); else default.
    """
    if "source_type_hint" in txns.columns:
        return txns.withColumn(
            "sourceType", F.coalesce(F.col("source_type_hint"), F.lit(default))
        )
    return txns.withColumn("sourceType", F.lit(default))


def bank_match_flags(txns: DataFrame) -> DataFrame:
    """C2 probe output as a standalone keyed table: (txn_id, has_bank_match).

    The banded probe itself, without the decoration join — callers that
    fuse several txn_id-keyed decorations into one wide join (the
    single-barrier pipeline, plans/pipeline.py) build each flag table
    independently from the SAME cached base and pay the wide txn_id
    exchange once, not once per decoration.

    Ref: utils/display_amount.py:41-55 (_has_bank_match). Batch re-spec
    (FIXTURES.md): the probe sees the whole dataset except the row itself
    (the reference saw only previously-persisted rows — arrival-order
    dependent, not reproducible).

    Plan shape: bank-side build table is aggregated to distinct
    (cents, bucket, txn ids) keys; probe side fans out 9×; the join is a
    plain equi-join + residual. Only card-outflow rows need the probe (G10
    uses it only there), so the probe side is pre-filtered — at scale this
    is a small fraction of rows.
    """
    need = txns.filter((F.col("sourceType") == "card") & (F.col("amount") < 0))
    probe = banding.with_probe_keys(
        need.select("txn_id", "amount", "dateKey")
    ).select("txn_id", "_cents_p", "_bucket_p", "_cents", "_day")

    # aggregate the build side to DISTINCT (cents, bucket, day) keys — the
    # flag only asks "does ANY bank row match", so thousands of identical
    # recurring amounts in one week must collapse to one build row instead
    # of fanning the join |probe-hits| x |duplicates| wide before the final
    # distinct. (The old txn_id != b_txn_id predicate was vacuous: the
    # probe side is card-only, the build side bank-only.)
    bank = banding.with_build_keys(
        txns.filter(F.col("sourceType") == "bank").select("txn_id", "amount", "dateKey")
    ).select(
        F.col("_cents").alias("b_cents"),
        F.col("_day").alias("b_day"),
        F.col("_bucket").alias("b_bucket"),
    ).distinct()

    return (
        probe.join(
            bank,
            (probe["_cents_p"] == bank["b_cents"])
            & (probe["_bucket_p"] == bank["b_bucket"]),
            "inner",
        )
        .filter(
            (F.abs(F.col("_cents") - F.col("b_cents")) <= 1)
            & (F.abs(F.col("_day") - F.col("b_day")) <= 5)
        )
        .select("txn_id")
        .distinct()
        .withColumn("has_bank_match", F.lit(True))
    )


def with_bank_match(txns: DataFrame, broadcast_matches: bool | None = None) -> DataFrame:
    """C2 — has_bank_match: a *bank* txn within ±5 days and ±$0.01 exists.

    `bank_match_flags` builds the keyed flag table; this decorates every
    row with it (missing rows → False).
    """
    matched = bank_match_flags(txns)
    # matched ids are the card-outflow rows with a bank twin. Default is NO
    # hint: AQE sees the true built size at runtime and broadcasts only when
    # the set is genuinely small — a forced broadcast is a driver-serial
    # collect+rebroadcast that costs the same at every cluster size (pure
    # Amdahl fraction) and is unbounded on adversarial data at 100 TB.
    # broadcast_matches=True forces the hint for callers that know their
    # matched set is tiny; False documents the explicit shuffle choice.
    if broadcast_matches:
        matched = F.broadcast(matched)
    return txns.join(matched, "txn_id", "left").withColumn(
        "has_bank_match", F.coalesce(F.col("has_bank_match"), F.lit(False))
    )


def with_display_amount(txns: DataFrame) -> DataFrame:
    """G10 as a native expression (ref: utils/display_amount.py:57-79)."""
    st = F.lower(F.trim(F.coalesce(F.col("sourceType"), F.lit(""))))
    amt = F.coalesce(F.col("amount"), F.lit(0.0))
    abs_amt = F.abs(amt)
    disp = (
        F.when(st == "bank", F.when(amt >= 0, abs_amt).otherwise(-abs_amt))
        .when(
            st == "card",
            F.when(amt > 0, abs_amt)
            .when(F.col("has_bank_match"), abs_amt)
            .otherwise(-abs_amt),
        )
        .otherwise(amt)
    )
    return txns.withColumn("displayAmount", disp)


def normalize(txns: DataFrame) -> DataFrame:
    """Full normalization: sourceType → bank-match probe → displayAmount."""
    return with_display_amount(with_bank_match(assign_source_type(txns)))
