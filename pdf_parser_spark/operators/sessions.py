"""Gap-based sessionization over event streams (batch form).

A training-data staple the reference's ±5-day pairing window gestures at
but never generalizes: group a user's events into sessions separated by
inactivity gaps, then roll sessions up. Classic two-window formulation —
`lag` to flag session starts, running `sum` to number sessions — both
map-side-free windows partitioned by the user key, so the only shuffle is
the hash partition on `user_col` (reused by the rollup's groupBy: Catalyst
sees the child partitioning and elides the second exchange).

Determinism: gaps compare floor-epoch-seconds (long truncation) and the
ordering key is (ts, event_id) — total order, no arrival-order dependence.
The rollup sums value in exact integer cents so the result is
bit-identical regardless of aggregation order (double sums are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Floor wall-clock seconds since 1970-01-01, timezone-free.

    Parquet timestamps written without UTC adjustment load as TIMESTAMP_NTZ
    (which a plain long cast rejects), and going through TIMESTAMP_LTZ would
    make the value depend on the session timezone. Summing calendar fields
    (days since epoch · 86400 + h·3600 + m·60 + s) reads the stored
    wall-clock second on any session — matching DuckDB's `floor(epoch(ts))`
    on the same file — and stays inside whole-stage codegen.
    """
    t = col.cast("timestamp_ntz")
    days = F.datediff(F.to_date(t), F.to_date(F.lit("1970-01-01")))
    return (
        days.cast("long") * 86400
        + F.hour(t).cast("long") * 3600
        + F.minute(t).cast("long") * 60
        + F.second(t).cast("long")
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Events + per-user `session_id` (1-based ordinal per user).

    A new session starts when the gap to the previous event (floor epoch
    seconds) exceeds ``gap_seconds``, or at the user's first event.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    epoch = epoch_seconds(F.col(ts_col))
    prev = F.lag(epoch).over(w)
    is_new = (prev.isNull() | ((epoch - prev) > gap_seconds)).cast("int")
    running = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(running))


def session_rollup(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregate: event count, start second, exact cent sum."""
    return sessions.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(epoch_seconds(F.col(ts_col))).alias("session_start_s"),
        F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("value_cents"),
    )
