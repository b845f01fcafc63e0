"""As-of join — "latest right row at or before each left row's timestamp".

Spark has no ASOF JOIN operator (pandas `merge_asof` exists only driver-
side). A range-condition join (`l.ts >= r.ts`) would make Catalyst fall
back to a broadcast-nested-loop or a per-key cross product — quadratic in
the hot keys. This is the merge formulation instead:

    union both sides → one hash shuffle on the key →
    per-key sort by (ts, side) → running last_value(right payload)

i.e. exactly one Exchange on the join key and a per-key sort-merge sweep —
the same cost envelope as a sort-merge join, independent of how many right
rows precede each left row. The classic stream-processing trick (Flink's
event-time join and DuckDB's ASOF JOIN execute the same way internally).

Semantics: for every left row, the right row with the greatest
``right_ts <= left_ts`` for the same key; ties on right_ts resolved by the
greatest ``right_id`` (total order ⇒ deterministic under any partitioning).
Left rows with no prior right row keep NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix``-named columns of the matched right row.

    ``payload_cols`` defaults to ``[right_ts, right_id]``. Right rows sort
    BEFORE left rows at equal timestamps (side flag 0 < 1), so a right row
    at exactly ``left_ts`` matches — the standard ASOF ``<=`` convention.
    """
    payload_cols = payload_cols or [right_ts, right_id]

    l_cols = left.columns
    packed = F.struct(*[F.col(c) for c in payload_cols])
    # the tie-break column keeps right_id's own type: any orderable type
    # works, and a cast (e.g. a non-numeric string id to long) would null
    # out and silently break the documented greatest-right_id total order
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_rord"),
        packed.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
    ).select(on, "_ts", "_side", "_rord", "_payload", *[c for c in l_cols if c != on])

    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("_rord"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in l_cols if c != on],
    )

    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *l_cols,
        *[
            F.col("_match")[c].alias(prefix + c)
            for c in payload_cols
        ],
    )
    return out
