"""Mergeable sketches — HyperLogLog, KMV (bottom-k / theta-style), and
count-min — built entirely from native Catalyst expressions.

Why this module exists at 100 TB: exact ``COUNT(DISTINCT x)`` per group,
exact corpus-overlap joins, and exact per-token frequency tables all
shuffle the full key universe. A sketch column is a few KB per group,
is MERGEABLE (day N's sketch + day N+1's sketch = the union's sketch
without re-reading day N), and can be persisted in a snapshot table
next to the rollup it summarizes — the Druid/DataSketches pattern,
re-expressed as Spark map/array columns so Catalyst sees every step
(no UDF, no driver-side sketch object).

Representations (all plain Spark SQL types, so they survive parquet):

- HLL:  ``map<int,int>`` — sparse register file, register index →
  max rho. Missing key = zero register. Merge = per-key max.
- KMV:  sorted ``array<bigint>`` of the k smallest distinct xxhash64
  values. Merge = k smallest of the union. Supports distinct-count,
  Jaccard, and intersection estimates (Beyer et al. 2007,
  Bar-Yossef et al. 2002).
- CMS:  ``map<int,bigint>`` — sparse (depth*width) counter file.
  Merge = per-key sum. Point query = min over depth rows
  (Cormode & Muthukrishnan 2005). One-sided error: never undercounts.
- HIST: ``map<int,bigint>`` — log-binned counters (DDSketch, Masson et
  al. 2019). Merge = per-key sum. Quantile reads within relative error
  alpha; bin count grows with the value RANGE, never the row count.

Reference parity note: the reference service (acstumler/pdf_parser)
keeps exact in-memory dicts for its per-user vendor rollups
(routes/journal.py:29-51 scale: one user's transactions). These sketches
are the 10^12-row generalization of the same questions — "how many
distinct X per group" / "how often does token t occur" — where exact
dicts stop fitting anywhere.

Scale shapes (asserted in tests/test_sketches.py):
- hll_build: one hash exchange keyed by (group, register) with map-side
  partial max (≤ m rows per group per mapper survive the partial agg),
  then one exchange keyed by group to assemble the map.
- kmv_build: map-side partial distinct, then WindowGroupLimit prunes
  each mapper to its local bottom-k per group BEFORE the shuffle.
- cms_build: one exchange keyed by (group, slot) with map-side partial
  count — the classic two-phase agg, never a per-token global shuffle.

Numeric safety: rho uses log2 of an EXACT power of two (``w & -w``), so
IEEE rounding can never misplace a register (a naive ``floor(log2(w))``
rounds 2^52-1 up to 52.0 and corrupts the register near the top of the
range). p is capped at 16 so every intermediate fits a double exactly.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hll_build",
    "hll_merge",
    "hll_merge_expr",
    "hll_estimate_expr",
    "kmv_build",
    "kmv_merge_expr",
    "kmv_distinct_expr",
    "kmv_jaccard_expr",
    "kmv_intersect_expr",
    "cms_build",
    "cms_merge",
    "cms_merge_expr",
    "cms_count_expr",
    "hist_build",
    "hist_merge",
    "hist_merge_expr",
    "hist_count_expr",
    "hist_quantile_expr",
]

_TWO63 = float(2**63)
_TWO64 = float(2**64)


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007; sparse-register variant)
# --------------------------------------------------------------------------

def _check_p(p: int) -> int:
    # p >= 11 keeps alpha in the single large-m regime; p <= 16 keeps
    # 2^(64-p) <= 2^53 so the suffix w is exact in a double.
    if not 11 <= p <= 16:
        raise ValueError(f"p must be in [11, 16], got {p}")
    return 1 << p


def _hll_rho(h: Column, p: int) -> Column:
    """Position of the lowest set bit of the hash suffix, 1-based.

    Any fixed bit-pattern statistic of a uniform hash works for HLL; we
    use trailing zeros because ``w & -w`` is an exact power of two, so
    ``log2`` is exact in IEEE and the register value can never be off by
    one (unlike floor(log2(w)) for leading zeros, which rounds up at the
    top of the range).
    """
    w = F.shiftrightunsigned(h, p)
    lowbit = w.bitwiseAND(-w)
    return F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        (F.log2(lowbit.cast("double")) + F.lit(1.0)).cast("int")
    )


def hll_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """One HLL sketch per group over ``value_col``: columns
    ``group_cols... , hll map<int,int>``.

    Standard error ~= 1.04 / sqrt(2^p): p=12 → 1.6%, p=14 → 0.8%.
    Two exchanges, both with map-side partials; no row ever carries more
    than (register, rho) past the first shuffle.
    """
    _check_p(p)
    h = F.xxhash64(F.col(value_col))
    # null values are skipped, matching COUNT(DISTINCT) semantics —
    # xxhash64(NULL) would otherwise hash the seed and count one phantom
    df = df.where(F.col(value_col).isNotNull())
    regs = (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(1 << p)).cast("int").alias("_reg"),
            _hll_rho(h, p).alias("_rho"),
        )
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    return regs.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_reg", "_rho"))).alias("hll")
    )


def hll_merge_expr(a: Column, b: Column) -> Column:
    """Pairwise merge of two HLL map columns (per-register max)."""
    return F.map_zip_with(
        a, b, lambda _k, x, y: F.greatest(F.coalesce(x, F.lit(0)), F.coalesce(y, F.lit(0)))
    )


def hll_merge(
    df: DataFrame, group_cols: Sequence[str], hll_col: str = "hll"
) -> DataFrame:
    """Merge many sketch ROWS down to one sketch per group (e.g. daily
    sketches → an all-time sketch). Explode-and-remax: the exchange is
    keyed by (group, register), bounded by m per input row."""
    exploded = df.select(*group_cols, F.explode(F.col(hll_col)).alias("_reg", "_rho"))
    regs = exploded.groupBy(*group_cols, "_reg").agg(F.max("_rho").alias("_rho"))
    return regs.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_reg", "_rho"))).alias(hll_col)
    )


def hll_estimate_expr(hll: Column, p: int = 12) -> Column:
    """Distinct-count estimate from a sketch column (double).

    Raw harmonic-mean estimator with the standard small-range linear
    counting correction (E <= 2.5m and zero registers present). The
    large-range correction is unnecessary with 64-bit hashes (HLL++
    practice)."""
    m = _check_p(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = (F.lit(m) - F.size(hll)).cast("double")
    inv_sum = zeros + F.aggregate(
        F.map_values(hll),
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(0.5), r.cast("double")),
    )
    raw = F.lit(alpha * m * m) / inv_sum
    # greatest(zeros, 1) only matters when zeros == 0, where the branch is
    # not selected anyway — it keeps ANSI mode from tripping on the
    # division inside the unselected branch.
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.greatest(zeros, F.lit(1.0)))
    return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)


# --------------------------------------------------------------------------
# KMV / bottom-k (theta-style set sketch)
# --------------------------------------------------------------------------

def kmv_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """One KMV sketch per group: columns ``group_cols..., kmv
    array<bigint>`` holding the k smallest distinct hash values, sorted.

    The distinct pass partially dedups map-side; the rank-<=-k filter
    compiles to WindowGroupLimit, so each mapper ships at most k rows per
    group into the window exchange (same pre-shuffle prune as
    sampling.per_group_cap)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = (
        df.where(F.col(value_col).isNotNull())  # COUNT(DISTINCT) semantics
        .select(*group_cols, F.xxhash64(F.col(value_col)).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    return kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("_h")).alias("kmv")
    )


def kmv_merge_expr(a: Column, b: Column, k: int) -> Column:
    """Union sketch: k smallest of the combined distinct hash sets.
    Exactly equals the sketch built over the concatenated inputs, which
    makes the merge associative and order-independent."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def _kmv_frac(kth: Column) -> Column:
    # normalize a signed-64 hash to (0, 1]: fraction of hash space <= kth
    return (kth.cast("double") + F.lit(_TWO63 + 1.0)) / F.lit(_TWO64)


def kmv_distinct_expr(kmv: Column, k: int) -> Column:
    """Distinct-count estimate (double). Exact when the group had fewer
    than k distinct values (the sketch IS the distinct set); otherwise
    the unbiased (k-1)/u_k estimator of Bar-Yossef et al."""
    n = F.size(kmv)
    kth = F.element_at(kmv, k)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / _kmv_frac(kth)
    )


def kmv_jaccard_expr(a: Column, b: Column, k: int) -> Column:
    """Jaccard estimate between two KMV sketches: the fraction of the
    union sketch's members that appear in both input sketches (Beyer et
    al. 2007). Error ~ 1/sqrt(k) around the true Jaccard."""
    u = kmv_merge_expr(a, b, k)
    both = F.array_intersect(a, b)
    matches = F.size(F.array_intersect(u, both))
    return matches.cast("double") / F.size(u).cast("double")


def kmv_intersect_expr(a: Column, b: Column, k: int) -> Column:
    """Intersection distinct-count estimate: Jaccard(a,b) x |a ∪ b|.
    The corpus-overlap question ("how many of dump N's urls are already
    in dump N-1?") answered from two KB-sized columns, no join."""
    u = kmv_merge_expr(a, b, k)
    return kmv_jaccard_expr(a, b, k) * kmv_distinct_expr(u, k)


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

def _cms_slots(token: Column, width: int, depth: int) -> list[Column]:
    # depth independent hash rows: xxhash64(token, d) chains the seed in,
    # giving a distinct hash function per row; slot id = row*width + bucket
    return [
        (F.lit(d * width) + F.pmod(F.xxhash64(token, F.lit(d)), F.lit(width))).cast(
            "int"
        )
        for d in range(depth)
    ]


def cms_build(
    df: DataFrame,
    group_cols: Sequence[str],
    token_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One CMS per group counting occurrences of ``token_col`` rows:
    columns ``group_cols..., cms map<int,bigint>``.

    Guarantee: point queries never undercount; overcount <= 2N/width
    with probability 1 - 2^-depth (N = total occurrences in the group).
    Size bound: at most depth*width map entries per group regardless of
    vocabulary size — that bound is the whole point at web scale."""
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    df = df.where(F.col(token_col).isNotNull())  # count(col) skips nulls
    slots = (
        df.select(
            *group_cols,
            F.explode(F.array(*_cms_slots(F.col(token_col), width, depth))).alias(
                "_slot"
            ),
        )
        .groupBy(*group_cols, "_slot")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return slots.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_slot", "_n"))).alias("cms")
    )


def cms_merge_expr(a: Column, b: Column) -> Column:
    """Pairwise merge (per-slot sum) — counts add, so the merged sketch
    equals the sketch of the concatenated inputs exactly."""
    return F.map_zip_with(
        a,
        b,
        lambda _k, x, y: F.coalesce(x, F.lit(0).cast("long"))
        + F.coalesce(y, F.lit(0).cast("long")),
    )


def cms_merge(
    df: DataFrame, group_cols: Sequence[str], cms_col: str = "cms"
) -> DataFrame:
    """Merge many CMS rows down to one per group (per-slot sum)."""
    exploded = df.select(*group_cols, F.explode(F.col(cms_col)).alias("_slot", "_n"))
    slots = exploded.groupBy(*group_cols, "_slot").agg(F.sum("_n").alias("_n"))
    return slots.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_slot", "_n"))).alias(cms_col)
    )


def _hist_gamma(alpha: float) -> float:
    if not 0.0 < alpha < 0.5:
        raise ValueError(f"alpha must be in (0, 0.5), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


_HIST_ZERO_KEY = -(2**31)  # log keys never reach this; reserved for v == 0


def hist_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """One log-binned histogram per group over a NON-NEGATIVE numeric
    column: ``group_cols..., hist map<int,bigint>`` (DDSketch, Masson et
    al. 2019 — bin key = ceil(log_gamma(v)), zeros in a reserved key).

    Any quantile read from the sketch is within relative error ``alpha``
    of the true value; the map stays small because the number of bins is
    log_gamma(max/min) — ~900 bins spans 10 orders of magnitude at
    alpha=0.01 — independent of row count. Same scale shape as
    cms_build: one (group, bin) exchange with map-side partial counts.
    """
    gamma = _hist_gamma(alpha)
    df = df.where(F.col(value_col).isNotNull())  # a null bin key would throw
    v = F.col(value_col).cast("double")
    key = (
        F.when(v < 0, F.raise_error(F.lit("hist_build: negative value")))
        .when(v == 0, F.lit(_HIST_ZERO_KEY))
        .otherwise(F.ceil(F.log(v) / F.lit(math.log(gamma))).cast("int"))
    )
    bins = (
        df.select(*group_cols, key.alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return bins.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_bin", "_n"))).alias("hist")
    )


def hist_merge_expr(a: Column, b: Column) -> Column:
    """Pairwise merge (per-bin sum) — exact, like every count merge."""
    return cms_merge_expr(a, b)


def hist_merge(
    df: DataFrame, group_cols: Sequence[str], hist_col: str = "hist"
) -> DataFrame:
    """Merge many histogram rows down to one per group (per-bin sum)."""
    exploded = df.select(*group_cols, F.explode(F.col(hist_col)).alias("_bin", "_n"))
    bins = exploded.groupBy(*group_cols, "_bin").agg(F.sum("_n").alias("_n"))
    return bins.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_bin", "_n"))).alias(hist_col)
    )


def hist_count_expr(hist: Column) -> Column:
    """Total row count in the sketch (exact — counts merge exactly)."""
    return F.aggregate(
        F.map_values(hist), F.lit(0).cast("long"), lambda acc, n: acc + n
    )


def hist_quantile_expr(hist: Column, q: float, alpha: float = 0.01) -> Column:
    """The q-quantile estimate (double), within relative error ``alpha``
    of the true order statistic. Pure expression: sort the bins, walk the
    cumulative counts to the target rank with a fold, convert the bin key
    back to its midpoint value — no explode, no shuffle, so reading P
    quantiles from G groups is a G x P projection."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    gamma = _hist_gamma(alpha)
    entries = F.array_sort(F.map_entries(hist))  # struct sort: key asc
    total = hist_count_expr(hist)
    target = F.greatest(F.ceil(F.lit(q) * total.cast("double")).cast("long"), F.lit(1).cast("long"))
    # fold state: (cum count, found bin key or null)
    init = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(None).cast("int").alias("bin")
    )
    walk = F.aggregate(
        entries,
        init,
        lambda acc, e: F.when(acc["bin"].isNotNull(), acc).otherwise(
            F.struct(
                (acc["cum"] + e["value"]).alias("cum"),
                F.when(acc["cum"] + e["value"] >= target, e["key"])
                .otherwise(F.lit(None).cast("int"))
                .alias("bin"),
            )
        ),
    )
    bin_key = walk["bin"]
    # midpoint of bin (gamma^(k-1), gamma^k]: 2*gamma^k/(gamma+1)
    mid = F.pow(F.lit(gamma), bin_key.cast("double")) * F.lit(2.0 / (gamma + 1.0))
    return F.when(bin_key == _HIST_ZERO_KEY, F.lit(0.0)).otherwise(mid)


def cms_count_expr(cms: Column, token: Column, width: int = 1024, depth: int = 4) -> Column:
    """Estimated occurrence count of ``token`` (long): min over the depth
    counter rows. ``token`` may be a literal or a join-side column —
    either way the lookup is a pure expression, so probing q tokens
    against g groups is a g x q projection, not a shuffle."""
    counts = [
        F.coalesce(F.element_at(cms, s), F.lit(0).cast("long"))
        for s in _cms_slots(token, width, depth)
    ]
    return F.least(*counts) if len(counts) > 1 else counts[0]
