"""S2 as true Structured Streaming: stateful transfer pairing.

The reference pairs each newly-ingested transaction against the existing
store (utils/transfer_pairing.py:60-77 via routes/plaid.py:290-296). The
batch rebuild re-runs the C1 join per micro-batch; this module is the
*streaming-native* alternative named in SURVEY.md §2.10: a custom stateful
operator over ``applyInPandasWithState``, keyed by the amount band, with a
5-day event-time horizon (the reference's WINDOW_DAYS) enforced through
watermark + state timeout.

Streaming re-spec (documented deviation): pairing within a state key uses
EXACT cents equality — the batch path's ±1-cent tolerance needs the 3-key
probe fan-out (operators/banding.py) which would let one leader form pairs
in two keys with no way to coordinate exclusivity across state partitions.
Exact-cents keying keeps the exclusivity invariant (each txn in ≤1 pair)
structurally guaranteed; the ±1-cent candidates are a strict superset
handled by the batch job (the nightly C1 re-pair) — the standard
lambda-ish split: streaming gives low-latency pairs, batch gives the
tolerance-complete ones.

Within a key, matching is deterministic regardless of arrival order *within
a micro-batch* (rows are sorted by (dateKey, txn_id) before the greedy
sweep); across micro-batches it is arrival-ordered like the reference.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

OUTPUT_SCHEMA = (
    "cents long, l_id string, s_id string, pairId string, pairReason string"
)
STATE_SCHEMA = "ids array<string>, types array<string>, signs array<int>, days array<long>"
INPUT_COLS = ["cents", "txn_id", "sourceType", "sign", "day", "ts"]

WINDOW_DAYS = 5


def _is_leader(source_type: str, sign: int) -> bool:
    return source_type == "bank" and sign >= 0


def _is_shadow(source_type: str, sign: int) -> bool:
    return sign < 0 and source_type in ("card", "loan", "bank")


def _reason(shadow_type: str) -> str:
    return {"card": "card_payment", "loan": "loan_payment"}.get(shadow_type, "bank_transfer")


def _pair_key_group(
    rows: list[tuple], unpaired: list[tuple]
) -> tuple[list[tuple], list[tuple]]:
    """Greedy sweep over (id, type, sign, day) tuples; returns (pairs, still_unpaired).

    New rows are pre-sorted; existing unpaired state is consulted first
    (mirrors pair_on_ingest matching against the store before peers).
    """
    pool = list(unpaired)
    pairs: list[tuple] = []
    for row in rows:
        rid, rtype, rsign, rday = row
        best = None
        for i, (pid, ptype, psign, pday) in enumerate(pool):
            if pid == rid or abs(rday - pday) > WINDOW_DAYS:
                continue
            if _is_leader(rtype, rsign) and _is_shadow(ptype, psign):
                cand = (abs(rday - pday), pid, i, "ls")
            elif _is_shadow(rtype, rsign) and _is_leader(ptype, psign):
                cand = (abs(rday - pday), pid, i, "sl")
            else:
                continue
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is None:
            pool.append(row)
            continue
        _dist, pid, idx, direction = best
        other = pool.pop(idx)
        if direction == "ls":
            leader, shadow = row, other
        else:
            leader, shadow = other, row
        lo, hi = sorted((leader[0], shadow[0]))
        pairs.append((leader[0], shadow[0], f"pair:{lo}:{hi}", _reason(shadow[1])))
    return pairs, pool


def pair_state_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body for one cents key."""
    cents = int(key[0])
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=["cents", "l_id", "s_id", "pairId", "pairReason"])
        return

    if state.exists:
        ids, types, signs, days = state.get
        unpaired = list(zip(ids, types, [int(s) for s in signs], [int(d) for d in days]))
    else:
        unpaired = []

    new_rows: list[tuple] = []
    max_ts_ms = 0
    for pdf in pdfs:
        for _, r in pdf.sort_values(["day", "txn_id"]).iterrows():
            new_rows.append((r["txn_id"], r["sourceType"], int(r["sign"]), int(r["day"])))
            ts_ms = int(pd.Timestamp(r["ts"]).value // 1_000_000)
            max_ts_ms = max(max_ts_ms, ts_ms)

    pairs, pool = _pair_key_group(new_rows, unpaired)

    # Evict state that can no longer pair. The watermark admits events up to
    # WINDOW_DAYS behind the max event time, and an admissible late event can
    # pair with anything within WINDOW_DAYS of *itself* — so a row stays
    # pairable until it is 2*WINDOW_DAYS behind the pool max. Evicting at
    # max-WINDOW_DAYS (the old horizon) silently dropped pairs whose partner
    # arrived late but inside the watermark.
    if pool and max_ts_ms:
        horizon_day = max(d for _, _, _, d in pool) - 2 * WINDOW_DAYS
        pool = [p for p in pool if p[3] >= horizon_day]
    if pool:
        state.update((
            [p[0] for p in pool],
            [p[1] for p in pool],
            [p[2] for p in pool],
            [p[3] for p in pool],
        ))
        if max_ts_ms:
            # wake up after the watermark passes the pairing horizon
            # (2*WINDOW_DAYS, matching the eviction rule above) to clear state
            state.setTimeoutTimestamp(max_ts_ms + 2 * WINDOW_DAYS * 86_400_000)
    elif state.exists:
        state.remove()

    yield pd.DataFrame(
        [(cents,) + p for p in pairs],
        columns=["cents", "l_id", "s_id", "pairId", "pairReason"],
    )


def paired_stream(txn_stream):
    """txn stream (txn_id, amount, sourceType, dateKey, ts) → pair stream.

    Watermark bounds both late data and state size: events later than 5 days
    are dropped, state keys idle past the horizon time out and clear.
    """
    from pyspark.sql import functions as F

    prepared = (
        txn_stream.withWatermark("ts", f"{WINDOW_DAYS} days")
        .withColumn("cents", F.round(F.abs(F.col("amount")) * 100).cast("long"))
        .withColumn("sign", F.when(F.col("amount") >= 0, 1).otherwise(-1))
        .withColumn(
            "day",
            F.datediff(F.to_date(F.col("dateKey"), "yyyyMMdd"), F.lit("1970-01-01").cast("date")).cast("long"),
        )
        .select("cents", "txn_id", "sourceType", "sign", "day", "ts")
    )
    return prepared.groupBy("cents").applyInPandasWithState(
        pair_state_func,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
