"""Mirror-site detection: which HOSTS serve (nearly) the same corpus?

Web crawls are full of mirrors — same site under two domains, CDN
aliases, scraped clones. Document-level dedup removes the duplicate
PAGES, but corpus curation also wants the host-level fact ("these two
domains are the same site") for domain mixing, crawl scheduling, and
blocklist propagation. Comparing every host pair is O(H²); this
operator is the standard bottom-k-sketch banding instead:

1. fingerprint every document (xxhash64 of whitespace-normalized text);
2. one KMV bottom-k sketch per host (operators/sketches.kmv_build —
   WindowGroupLimit-pruned, k longs per host);
3. CANDIDATE pairs = hosts sharing at least one of their m smallest
   fingerprint hashes (explode m ≤ k minima → equi-join on the hash):
   two hosts with Jaccard J share their global minimum with
   probability J, and at least one of m independent-ish minima with
   ~1-(1-J)^m — high-overlap hosts are found with near certainty while
   unrelated hosts almost never collide. No all-pairs stage exists.
4. estimate Jaccard per candidate pair from the two sketches
   (kmv_jaccard_expr) and keep pairs ≥ threshold.

Adversarial guard: a fingerprint shared by MANY hosts (an empty page,
a parked-domain template) would fan a single band bucket into H² pairs;
buckets wider than ``max_hosts_per_hash`` are dropped (the pages-level
near-dup path still handles that content — a universal boilerplate hash
says nothing about two hosts mirroring each other anyway).

Scale shape: fingerprints are row-local; the sketch build is the
kmv_build shape; banding shuffles H x m rows keyed by hash; the verify
join carries only candidate pairs, each a KB-sized sketch comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import sketches as sk

__all__ = ["host_sketches", "mirror_hosts"]


def host_sketches(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    k: int = 128,
) -> DataFrame:
    """(host, kmv) — one bottom-k sketch of document fingerprints per
    host. The fingerprint normalizes whitespace only: mirrors serve the
    same bytes modulo templating noise; heavier canonicalization can be
    layered by passing a pre-normalized text column."""
    fp = docs.select(
        F.col(host_col).alias("host"),
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ").alias(
            "_norm"
        ),
    )
    return sk.kmv_build(fp, ["host"], "_norm", k=k)


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    k: int = 128,
    m: int = 16,
    threshold: float = 0.5,
    max_hosts_per_hash: int = 64,
) -> DataFrame:
    """(host_a, host_b, jaccard_est) for host pairs whose document sets
    overlap at least ``threshold`` (host_a < host_b, deterministic).

    ``m`` trades recall for candidate volume: detection probability for
    true Jaccard J is ~1-(1-J)^m (m=16, J=0.5 → 0.9998)."""
    if not 1 <= m:
        raise ValueError("m must be >= 1")
    sketches = host_sketches(docs, host_col, text_col, k=k).localCheckpoint()

    minima = sketches.select(
        "host", F.explode(F.slice("kmv", 1, m)).alias("_h")
    )
    # band buckets, with the adversarial-width guard
    sized = minima.join(
        minima.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") <= max_hosts_per_hash),
        "_h",
    )
    a = sized.select(F.col("_h"), F.col("host").alias("host_a"))
    b = sized.select(F.col("_h"), F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "_h")
        .filter(F.col("host_a") < F.col("host_b"))
        .select("host_a", "host_b")
        .distinct()
    )

    sa = sketches.select(F.col("host").alias("host_a"), F.col("kmv").alias("_ka"))
    sb = sketches.select(F.col("host").alias("host_b"), F.col("kmv").alias("_kb"))
    return (
        pairs.join(sa, "host_a")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            F.round(sk.kmv_jaccard_expr(F.col("_ka"), F.col("_kb"), k), 4).alias(
                "jaccard_est"
            ),
        )
        .filter(F.col("jaccard_est") >= threshold)
        .orderBy("host_a", "host_b")
    )
