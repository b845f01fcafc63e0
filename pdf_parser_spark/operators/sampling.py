"""Deterministic stratified sampling — k rows per stratum, hash-ranked.

Training-data pipelines need reproducible samples (eval slices, human
review batches, per-domain caps) that do NOT depend on row order, executor
count, or a seed store: rank rows inside each stratum by a cryptographic
hash of their id and keep the k smallest. The same corpus always yields
the same sample on any cluster size, and adding documents only perturbs
the sample locally (hash ranks are stable — a bounded form of consistent
sampling).

Scale shape: one hash projection + one row_number window per stratum key —
a single shuffle on the stratum columns; no sort of the full table beyond
the per-partition window sort. For heavily-skewed strata at 10^12 rows,
pre-filter with an approximate per-stratum hash threshold before the exact
window (not needed at bench scales; documented escape hatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep the k hash-smallest rows of every stratum.

    Rank key = md5 of the UTF-8 string form of ``id_col`` (hex compares
    lexicographically the same everywhere), tie-broken by the id itself.
    """
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def domain_mixing_weights(
    docs: DataFrame,
    domain_cols: list[str],
    token_count,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain mixing weights for training-data sampling.

    Raw web corpora are dominated by a few giant domains; training mixtures
    therefore re-weight domains with a temperature exponent (multilingual
    sampling à la XLM-R / mT5, alpha in (0, 1]): a domain holding share
    ``s`` of the corpus tokens is sampled with weight proportional to
    ``s^alpha`` — alpha=1 keeps natural proportions, alpha→0 approaches
    uniform. Returns one row per domain: ``n_docs``, ``n_tokens``,
    ``token_share``, ``mix_weight`` (normalized s^alpha), and
    ``sampling_factor`` = mix_weight / token_share — the per-domain
    up/down-sampling rate a data loader applies.

    ``token_count`` is the per-row token-count Column (e.g.
    ``textstats.token_count_col(F.col("text"))``), so the caller controls
    the tokenizer.

    Scale shape: one hash aggregation keyed by domain (map-side partials —
    the corpus collapses to |domains| rows before any exchange), then a
    broadcast of the 1-row total for normalization. The corpus itself is
    scanned exactly once and never joined or windowed.
    """
    per_domain = docs.groupBy(*domain_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count).cast("long").alias("n_tokens"),
    )
    totals = per_domain.agg(
        F.sum("n_tokens").alias("_total"),
        F.sum(F.pow(F.col("n_tokens"), F.lit(alpha))).alias("_scaled_sum"),
    )
    # zero guards (Spark 4 ANSI mode turns x/0 into a job-killing
    # SparkArithmeticException): a domain whose docs are all empty has
    # share 0 — its sampling factor is 0 by definition, not an error; an
    # all-empty corpus likewise yields all-zero shares/weights.
    share = F.when(
        F.col("_total") > 0, F.col("n_tokens") / F.col("_total")
    ).otherwise(F.lit(0.0))
    weight = F.when(
        F.col("_scaled_sum") > 0,
        F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("_scaled_sum"),
    ).otherwise(F.lit(0.0))
    factor = F.when(share > 0, weight / share).otherwise(F.lit(0.0))
    return per_domain.crossJoin(F.broadcast(totals)).select(
        *domain_cols,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(weight, 6).alias("mix_weight"),
        F.round(factor, 4).alias("sampling_factor"),
    )


def uniform_hash_col(id_col: str, seed: int | None = None):
    """Deterministic uniform u in (0, 1] from an id — EXACTLY reproducible
    across engines.

    u = (first 13 md5 hex digits + 1) / 2^52. Every step is bit-exact in
    any IEEE-754 engine: the 52-bit integer and 2^52 are exactly
    representable doubles and division is correctly rounded, so Spark and
    a SQL oracle (folding the same hex digits) agree to the last bit — no
    seed store, no RNG state, stable under repartitioning and retries.
    """
    s = F.col(id_col).cast("string")
    if seed is not None:
        s = F.concat(F.lit(f"{seed}:"), s)
    h = F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 13), 16, 10)
    return (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 52))


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int | None = None,
    priority_col: str = "priority",
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup 2007, public methodology):
    keep the k rows with the largest priority = weight / u, u the
    deterministic uniform hash of the id — inclusion probability grows
    with weight, the estimator stays unbiased with threshold weighting,
    and the sample is a pure function of (ids, weights, seed).

    Scale shape: priority is a zero-exchange projection, and top-k by
    priority is mergeable — the top-k of a union is the top-k of
    per-partition top-ks, so Spark plans TakeOrderedAndProject (each task
    keeps k rows, the driver merges) — no global sort, no single-partition
    window, identical output at any cluster size. Weights must be > 0.
    """
    pr = F.col(weight_col).cast("double") / uniform_hash_col(id_col, seed)
    return (
        df.withColumn(priority_col, pr)
        .orderBy(F.col(priority_col).desc(), F.col(id_col))
        .limit(k)
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    order_col: str,
    tiebreaker: str,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, best-first — the
    RefinedWeb/FineWeb-style per-domain cap (public methodology: cap a
    single host's share of the corpus so mega-sites cannot dominate a
    trained distribution).

    Order within a group is (order_col desc|asc, tiebreaker asc);
    ``tiebreaker`` must be unique so the kept set is deterministic.

    Scale shape: one hash exchange keyed by group_col. The rank-<=-k
    filter compiles to Spark's WindowGroupLimit, which prunes each MAP
    partition to its local top-k per group BEFORE the shuffle — a host
    with 10^8 pages ships ~max_rows rows per mapper, not 10^8, so the
    skewed-host problem the cap exists to solve never hits the exchange
    either. (Plan-asserted in tests.)
    """
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tiebreaker).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_rows)
        .drop("_rk")
    )
