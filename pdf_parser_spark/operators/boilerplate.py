"""Cross-document host-boilerplate stripping — the CCNet-style line cleaner.

``textstats.dedup_lines`` removes lines a single page repeats; this
module removes lines a HOST repeats across its pages — nav bars, cookie
banners, footers, category chrome — which appear exactly once per page
and are therefore invisible to any within-document pass. The published
recipe (CCNet's shard-level line dedup, RefinedWeb's host heuristics —
public methodology) is frequency-based: a line that occurs on at least a
``frac`` fraction of a host's pages (and on at least ``min_docs`` pages,
so single-page hosts never self-erase) is chrome, not content, and is
dropped from every page of that host.

Scale shape (the 10^12-document reading):

1. candidate hashes per doc: row-local split → trim → length gate →
   xxhash64 → array_distinct. A doc contributes each line ONCE no matter
   how often it repeats it, so the exploded stream is bounded by distinct
   lines per doc, and document-frequency is a plain ``count`` downstream
   (no count-distinct machinery).
2. ONE exchange keyed by (host, line_hash) with map-side partials —
   Zipfian chrome collapses in the mapper, so the shuffle carries the
   distinct (host, line) inventory, 16-byte rows, not the corpus.
3. the boilerplate set is capped at ``top_k`` lines per host (rank filter
   directly over the window ⇒ Spark's WindowGroupLimit prunes to top_k
   per partition BEFORE that shuffle), then packed to ONE array row per
   host — bounded width by construction, the same guard the anchor
   rollup uses, so a wikipedia-sized host cannot produce an unbounded
   aggregate row.
4. strip: docs left-join the per-host array (host-keyed sort-merge join;
   AQE skew split handles megahosts because the build side is one
   ≤ top_k·8-byte row per host; broadcast it instead when the host
   universe is small) and drop matching lines with a row-local
   ``filter(lines, ...)`` — order-preserving, no second explode, no
   Python anywhere in the operator.

Reference parity: the reference's per-document noise rejection
(main.py "is_valid_transaction_line" / noise-row filters) is the
within-page analogue; there is no cross-document pass to mirror, so this
is a beyond-reference curation operator in the SURVEY §2-addendum sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["host_boilerplate_lines", "strip_host_boilerplate"]


def _candidate_hashes(text_col: str, min_line_chars: int):
    """Distinct xxhash64 of each trimmed line of at least
    ``min_line_chars`` chars — row-local, one entry per distinct line."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    cand = F.filter(lines, lambda ln: F.length(F.trim(ln)) >= min_line_chars)
    return F.array_distinct(F.transform(cand, lambda ln: F.xxhash64(F.trim(ln))))


def host_boilerplate_lines(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_docs: int = 3,
    frac: float = 0.5,
    top_k: int = 256,
    min_line_chars: int = 4,
) -> DataFrame:
    """One row per host with ``boiler_hashes``: the (≤ top_k) line hashes
    that occur on ≥ max(min_docs, ceil(frac · host_pages)) of the host's
    pages, plus ``n_pages`` and ``n_boiler_lines``.

    The tie-break inside top_k is (document-frequency desc, hash asc) —
    a total order, so the kept set is deterministic under any
    partitioning. Lines shorter than ``min_line_chars`` after trim are
    never candidates (blank separators and one-char list chrome carry no
    signal, and stripping them would reflow every page).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")
    if min_docs < 2:
        # min_docs=1 with a single-page host would classify the page's
        # every line as boilerplate and erase the document
        raise ValueError("min_docs must be >= 2")
    per_doc = docs.select(
        F.col(host_col).alias("host"),
        _candidate_hashes(text_col, min_line_chars).alias("_lhs"),
    )
    counts = per_doc.select("host", F.explode("_lhs").alias("line_hash")).groupBy(
        "host", "line_hash"
    ).agg(F.count(F.lit(1)).alias("df"))
    pages = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    thresh = F.greatest(
        F.lit(min_docs).cast("long"),
        F.ceil(F.lit(frac) * F.col("n_pages")).cast("long"),
    )
    boiler = (
        counts.join(pages, "host")
        .filter(F.col("df") >= thresh)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("df").desc(), F.col("line_hash").asc()
                )
            ),
        )
        .filter(F.col("_rk") <= top_k)  # rank-filter ⇒ WindowGroupLimit prune
    )
    return boiler.groupBy("host", "n_pages").agg(
        F.array_sort(F.collect_list("line_hash")).alias("boiler_hashes"),
        F.count(F.lit(1)).alias("n_boiler_lines"),
    )


def strip_host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    out_col: str = "clean_text",
    min_docs: int = 3,
    frac: float = 0.5,
    top_k: int = 256,
    min_line_chars: int = 4,
    broadcast_boiler: bool = False,
) -> DataFrame:
    """``docs`` plus ``out_col`` (the page with its host's boilerplate
    lines removed, original line order preserved) and
    ``n_stripped_lines``. Hosts with no boilerplate (or below-threshold
    hosts, or a null host) pass through byte-identical.

    ``broadcast_boiler=True`` broadcasts the per-host array table —
    right when the host universe fits an executor (≤ ~10^6 hosts);
    at web scale leave it False and let the host-keyed sort-merge join
    + AQE skew split carry it.
    """
    boiler = host_boilerplate_lines(
        docs, host_col, text_col, min_docs, frac, top_k, min_line_chars
    ).select(F.col("host").alias(host_col), "boiler_hashes")
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    joined = docs.join(boiler, host_col, "left")

    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    # a line is stripped iff it was a candidate (length gate) AND its
    # hash is in the host's boilerplate set — same hash definition as the
    # build, so build and strip agree line-for-line
    def _keep(ln):
        return ~(
            (F.length(F.trim(ln)) >= min_line_chars)
            & F.array_contains(F.col("boiler_hashes"), F.xxhash64(F.trim(ln)))
        )

    kept = F.when(F.col("boiler_hashes").isNull(), lines).otherwise(
        F.filter(lines, _keep)
    )
    return (
        joined.withColumn("_all", lines)
        .withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn(
            "n_stripped_lines", (F.size("_all") - F.size(kept)).cast("long")
        )
        .drop("_all", "boiler_hashes")
    )
