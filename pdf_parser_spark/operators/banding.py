"""Banded equi-join keys for tolerance/range matching (C1/C2 backbone).

The reference does tolerance matching as client-side linear scans under a
dateKey range query (utils/transfer_pairing.py:38-57, utils/
display_amount.py:41-55). At 10^12 rows that must become an equi-join, so we
band both dimensions:

- amount: cents = round(abs(amount)*100) (amounts are round(x,2) doubles, so
  cents are exact ints); tolerance ±0.01 ⇒ |centsA − centsB| ≤ 1 ⇒ probe side
  fans out to cents + {-1,0,1}.
- date: day = days-since-epoch of dateKey; window ±5 days ⇒ bucket = day//6;
  any pair ≤5 days apart is in the same or an adjacent bucket ⇒ probe side
  fans out to bucket + {-1,0,1}.

Probe rows explode 3×3 = 9×, build side stays 1× — a bounded-fanout equi-join
Catalyst can hash/sort-merge and AQE can skew-split, instead of a cartesian
with a residual filter. The exact predicate is re-applied as a residual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OFFSETS = [-1, 0, 1]


def _day(datekey: Column) -> Column:
    # try_to_date: '' dateKeys (unparseable dates, G4 fallback) → null day →
    # the row never matches any band, mirroring the reference's early return
    # (transfer_pairing.py:76-77: no datekey → no pairing)
    return F.datediff(F.try_to_date(datekey, "yyyyMMdd"), F.lit("1970-01-01"))


def with_build_keys(df: DataFrame, amount="amount", datekey="dateKey") -> DataFrame:
    """Build side: exact (cents, bucket) keys, 1 row per input row."""
    return (
        df.withColumn("_cents", F.round(F.abs(F.col(amount)) * 100).cast("long"))
        .withColumn("_day", _day(F.col(datekey)))
        .withColumn("_bucket", F.floor(F.col("_day") / 6).cast("long"))
    )


def with_probe_keys(df: DataFrame, amount="amount", datekey="dateKey") -> DataFrame:
    """Probe side: 9 fanned-out (cents±δ, bucket±δ) keys per row."""
    pairs = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(db).alias("db"))
            for dc in OFFSETS
            for db in OFFSETS
        ]
    )
    base = with_build_keys(df, amount, datekey)
    return (
        base.withColumn("_probe", F.explode(pairs))
        .withColumn("_cents_p", F.col("_cents") + F.col("_probe.dc"))
        .withColumn("_bucket_p", F.col("_bucket") + F.col("_probe.db"))
        .drop("_probe")
    )


def fan_group_probe(df: DataFrame, cents: str = "_cents", day: str = "_day") -> DataFrame:
    """Probe fan-out for rows already carrying exact (cents, day) keys —
    the group-level twin of with_probe_keys for pre-aggregated sides
    (operators/pairing.py collapses each side to one representative row
    per (cents, day) group before the banded join; the fan-out then costs
    9 rows per GROUP, not per transaction)."""
    pairs = F.array(
        *[
            F.struct(F.lit(dc).alias("dc"), F.lit(db).alias("db"))
            for dc in OFFSETS
            for db in OFFSETS
        ]
    )
    return (
        df.withColumn("_bucket", F.floor(F.col(day) / 6).cast("long"))
        .withColumn("_probe", F.explode(pairs))
        .withColumn("_cents_p", F.col(cents) + F.col("_probe.dc"))
        .withColumn("_bucket_p", F.col("_bucket") + F.col("_probe.db"))
        .drop("_probe")
    )


def residual(
    a_amount: Column, a_day: Column, b_amount: Column, b_day: Column,
) -> Column:
    """Exact tolerance predicate re-applied after the banded equi-join.

    The tolerance is FIXED (±1 cent, ±5 days) because the band keys are:
    the ±1-cent probe fan-out and the width-6 day buckets guarantee every
    pair within this tolerance meets in the equi-join — a wider tolerance
    passed only here would silently MISS pairs the bands never co-locate
    (the old tunable tol_cents/window_days parameters were exactly that
    trap, and no caller used them)."""
    return (
        (F.abs(F.round(F.abs(a_amount) * 100) - F.round(F.abs(b_amount) * 100)) <= 1)
        & (F.abs(a_day - b_day) <= 5)
    )
