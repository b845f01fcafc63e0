"""C1 — transfer pairing as a banded self-join with deterministic matching.

Reference semantics (utils/transfer_pairing.py:60-107, invoked per-ingested
row): a transaction pairs with a counterpart having |Δamount| ≤ 0.01 and
|Δdate| ≤ 5 days, with role constraints. Normalizing the three ingest-side
branches into one batch rule, every pair is

    leader  L: sourceType='bank', amount ≥ 0        (the inflow leg)
    shadow  S: amount < 0, sourceType ∈ {card, loan, bank}

with pairReason = card_payment | loan_payment (S on card/loan) |
bank_transfer (S on bank), pairId = f"pair:{min(id)}:{max(id)}", leader leg
eventLeader=True, shadow leg pairReason='shadow' on its own row
(transfer_pairing.py:83-84,94-95,103-104).

The reference is greedy in arrival order — irreproducible in a distributed
batch. Canonical re-spec (FIXTURES.md): *mutual-best matching* — each leader
ranks its candidate shadows by (day distance, cents distance, txn_id), each
shadow ranks its candidate leaders the same way, and a pair forms iff both
rank each other first. This is deterministic, order-free, exclusive (each txn
in ≤ 1 pair), and symmetric; property tests assert those invariants rather
than arrival-order equivalence (SURVEY.md §7 hard part 2).

Plan shape: pre-filtered leader/shadow sides → collapse each side to one
min-id representative per exact (cents, day) group (map-side-combinable;
result-identical — see _banded_candidates) → 9× banded probe fan-out over
GROUP rows → equi-join on (cents band, date bucket) → residual filter →
explode each group-pair candidate into a leader-keyed and a shadow-keyed
row → ONE min_by aggregate computes both argmins in a single pass over the
join output → unordered-pair regroup keeps pairs where both sides chose
each other. No cartesian, no window sort over the candidate fan-out, no
per-band quadratic blow-up under repeated amounts, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pdf_parser_spark.operators import banding

PAIR_COLS = ["pairId", "eventLeader", "pairedWith", "pairReason"]


def _banded_candidates(txns: DataFrame) -> DataFrame:
    """GROUP-level banded-join candidates: one row per (leader-group,
    shadow-group) band pair, where a group is an exact (cents, day) key and
    each side is pre-collapsed to its minimum-txn_id representative.

    Why this is result-identical to the per-transaction join it replaces:
    the mutual-best ordering is (day_dist, cents_dist, other_id), and both
    distances are functions of the two (cents, day) keys ALONE. So every
    leader in one (cents, day) group ranks the candidate shadows
    identically, and among shadows sharing a (cents, day) key only the
    lexicographically smallest s_id can ever be chosen (the ordering's
    final tiebreak is the id). Symmetrically for leaders. Pairs can
    therefore only ever form between group representatives, and the
    group-level mutual-best over representatives IS the transaction-level
    mutual-best (the q13 DuckDB oracle — still the per-transaction
    row_number formulation — proves the equivalence every round, as does
    the greedy-reference property suite).

    Why it matters at scale: the per-transaction join fanned out
    |leaders| x |shadows| within each band — quadratic under repeated
    amounts. Statement corpora are EXACTLY that (thousands of $9.99 rows
    on the same day); measured at 600k synthetic docs the candidate
    stream was ~10^8 rows feeding a struct-ordered min_by that compiles
    to SortAggregate (mutable-buffer rules exclude string-bearing
    structs from HashAggregate), i.e. an external sort of the whole
    stream — 14.7 GB spilled, ~700 s of CPU, the single largest stage in
    the fused chain at every parallelism level. The group collapse is a
    map-side-combinable pre-aggregation (the exchange carries one row per
    group) and bounds the join output at one row per band pair, which
    also removes the banded join's worst-case skew: a hot (cents, bucket)
    key now meets 1x1 per group pair, not |L|x|S|.

    Each group pair may still appear up to 3x (one per matching probe
    band); duplicates carry identical ordering structs, so the downstream
    argmin is unaffected and the dedupe shuffle is skipped."""
    leaders = (
        banding.with_build_keys(
            txns.filter(
                (F.col("sourceType") == "bank") & (F.col("amount") >= 0)
            ).select(F.col("txn_id").alias("l_id"), "amount", "dateKey")
        )
        .groupBy("_cents", "_day")
        .agg(F.min("l_id").alias("l_id"))
    )
    probes = banding.fan_group_probe(leaders).select(
        "l_id", "_cents", "_day", "_cents_p", "_bucket_p"
    )

    shadows = (
        banding.with_build_keys(
            txns.filter(
                (F.col("amount") < 0)
                & F.col("sourceType").isin("card", "loan", "bank")
            ).select(
                F.col("txn_id").alias("s_id"),
                F.col("sourceType").alias("s_type"),
                "amount",
                "dateKey",
            )
        )
        .groupBy("_cents", "_day")
        # representative = min s_id; struct min is lexicographic and s_id
        # is unique, so this is (min s_id, its own sourceType)
        .agg(F.min(F.struct("s_id", "s_type")).alias("_m"))
        .select(
            F.col("_cents").alias("s_cents"),
            F.col("_day").alias("s_day"),
            F.floor(F.col("_day") / 6).cast("long").alias("s_bucket"),
            F.col("_m.s_id").alias("s_id"),
            F.col("_m.s_type").alias("s_type"),
        )
    )

    return (
        probes.join(
            shadows,
            (F.col("_cents_p") == F.col("s_cents"))
            & (F.col("_bucket_p") == F.col("s_bucket")),
            "inner",
        )
        .filter(
            (F.abs(F.col("_cents") - F.col("s_cents")) <= 1)
            & (F.abs(F.col("_day") - F.col("s_day")) <= 5)
        )
        .select(
            "l_id",
            "s_id",
            "s_type",
            F.abs(F.col("_day") - F.col("s_day")).alias("day_dist"),
            F.abs(F.col("_cents") - F.col("s_cents")).alias("cents_dist"),
        )
    )


def matched_pairs(txns: DataFrame) -> DataFrame:
    """Mutual-best selection → one row per formed pair.

    Each side's best candidate is an ARGMIN per key — computed with
    `min_by` aggregations instead of row_number windows. A window rank-1
    must shuffle and fully sort every candidate row per key; min_by is
    partially aggregable, so the map side collapses each partition to one
    row per key before the exchange — the shuffle carries only the
    distinct leader/shadow representative ids. The candidate stream
    itself is group-level (one row per band pair of (cents, day) groups —
    see _banded_candidates), so the aggregate's input is bounded by the
    number of co-banded group pairs, not by transaction multiplicity.

    Both argmins come from ONE pass over the banded join: each candidate
    explodes into a leader-keyed and a shadow-keyed row and a single
    groupBy(role, key) computes best-shadow-per-leader and
    best-leader-per-shadow together. The previous formulation aggregated
    the join output twice (one branch per direction), which re-executed
    the banded join + map-side partial agg per branch and doubled the AQE
    stage count — measured at 100k docs: 6 jobs → 4 and ~20% less wall
    time for the pairing stage. Result-identical to the window formulation
    (the ordering struct (day_dist, cents_dist, id) is unique per key, so
    the argmin is deterministic); the q13 DuckDB oracle — still the
    row_number formulation — proves the equivalence every round.

    Band-duplicate candidates (the 3×3 probe fan-out can emit one pair up
    to three times) carry identical ordering structs, so they cannot change
    either argmin — the pre-aggregation dropDuplicates shuffle is skipped.
    """
    base = _banded_candidates(txns)
    both = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("L").alias("role"),
                    F.col("l_id").alias("key"),
                    F.col("s_id").alias("other"),
                    F.col("s_type").alias("s_type"),
                    F.col("day_dist").alias("day_dist"),
                    F.col("cents_dist").alias("cents_dist"),
                ),
                F.struct(
                    F.lit("S").alias("role"),
                    F.col("s_id").alias("key"),
                    F.col("l_id").alias("other"),
                    F.col("s_type").alias("s_type"),
                    F.col("day_dist").alias("day_dist"),
                    F.col("cents_dist").alias("cents_dist"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    best = both.groupBy("role", "key").agg(
        F.min_by(
            F.struct("other", "s_type"),
            F.struct("day_dist", "cents_dist", "other"),
        ).alias("b")
    )
    # Mutuality without a self-join of `best`: leader ids and shadow ids are
    # disjoint (amount >= 0 vs < 0), so an unordered pair {a, b} receives at
    # most one L-row (a's best shadow is b) and at most one S-row (b's best
    # leader is a); exactly two rows <=> both chose each other. One tiny
    # exchange on the pair key replaces the join of the two argmin branches.
    return (
        best.groupBy(
            F.least("key", F.col("b.other")).alias("p_lo"),
            F.greatest("key", F.col("b.other")).alias("p_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("role") == "L", F.col("key"))).alias("l_id"),
            F.max(F.when(F.col("role") == "L", F.col("b.other"))).alias("s_id"),
            F.max(F.when(F.col("role") == "L", F.col("b.s_type"))).alias("s_type"),
        )
        .filter(F.col("n") == 2)
        .select(
            "l_id",
            "s_id",
            F.concat(
                F.lit("pair:"),
                F.least("l_id", "s_id"),
                F.lit(":"),
                F.greatest("l_id", "s_id"),
            ).alias("pairId"),
            F.when(F.col("s_type") == "card", F.lit("card_payment"))
            .when(F.col("s_type") == "loan", F.lit("loan_payment"))
            .otherwise(F.lit("bank_transfer"))
            .alias("pairReason"),
        )
    )


def pair_decorations(txns: DataFrame) -> DataFrame:
    """Pairing decorations as a standalone keyed table:
    (txn_id, pairId, eventLeader, pairedWith, pairReason) — one row per
    paired LEG. Callers fusing several txn_id-keyed decorations into one
    wide join (plans/pipeline.py single-barrier chain) consume this
    directly; `pair_transfers` is the join-back convenience."""
    pairs = matched_pairs(txns)
    # One generator pass instead of a 2-branch union: a union of two
    # projections of `pairs` makes Catalyst re-execute the whole pairing
    # subtree once per branch (only the last exchange is AQE-reusable);
    # exploding each pair into its leader and shadow legs keeps the
    # decoration build a single linear plan.
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("l_id").alias("txn_id"),
                    F.col("pairId").alias("pairId"),
                    F.lit(True).alias("eventLeader"),
                    F.col("s_id").alias("pairedWith"),
                    F.col("pairReason").alias("pairReason"),
                ),
                F.struct(
                    F.col("s_id").alias("txn_id"),
                    F.col("pairId").alias("pairId"),
                    F.lit(False).alias("eventLeader"),
                    F.col("l_id").alias("pairedWith"),
                    F.lit("shadow").alias("pairReason"),
                ),
            )
        ).alias("d")
    ).select("d.*")


def pair_transfers(txns: DataFrame, broadcast_decorations: bool | None = None) -> DataFrame:
    """Decorate transactions with pairId/eventLeader/pairedWith/pairReason.

    Unpaired rows keep NULLs (nullable decoration, FIXTURES.md F3).
    """
    decorations = pair_decorations(txns)
    # Default is NO hint: AQE broadcasts the decorations only when their
    # runtime size is actually small. A forced broadcast is a driver-serial
    # collect+rebroadcast (identical cost at N and 4N executors — an Amdahl
    # fraction that caps scaling efficiency) and can exceed broadcast limits
    # at 10^12 rows. broadcast_decorations=True forces the hint when the
    # pair density is known-tiny; with no hint the join degrades gracefully
    # to a shuffle on txn_id (the table's bucket key, so it co-locates).
    if broadcast_decorations:
        decorations = F.broadcast(decorations)
    return txns.join(decorations, "txn_id", "left")
