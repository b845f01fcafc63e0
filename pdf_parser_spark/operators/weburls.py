"""URL canonicalization and host rollups — all native column expressions.

Common-Crawl-style corpora key everything on `url` (BASELINE input hint), and
the same page is fetched under dozens of spellings: mixed-case scheme/host,
default ports, fragments, and tracking query parameters. Canonicalizing
before any url-keyed dedupe/join is the difference between "unique pages"
and "unique byte strings".

Everything here is regexp/array expressions inside whole-stage codegen — no
UDFs, no shuffle. The canonical form applied, in order:

1. scheme and host lowercased (path/query case preserved — RFC 3986 §6.2.2.1
   says only scheme+host are case-insensitive);
2. fragment removed;
3. default port stripped (``:80`` for http, ``:443`` for https);
4. tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``), remaining parameters kept in original order;
5. empty path normalized to ``/``.

The rules are deliberately expressible in ANSI SQL so the oracle can verify
them value-for-value (q40); parameter *sorting* is intentionally NOT done —
it changes join keys across engines' sort collations for mixed-case params.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# matched against a single `key=value` token; anchored on the key
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def scheme_col(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def host_col(url: Column) -> Column:
    """Lowercased host, port stripped (userinfo is out of scope: the crawl
    frontier never emits credentialed urls)."""
    authority = F.regexp_extract(url, _AUTHORITY_RE, 1)
    return F.lower(F.regexp_replace(authority, r":\d+$", ""))


def port_col(url: Column) -> Column:
    authority = F.regexp_extract(url, _AUTHORITY_RE, 1)
    return F.regexp_extract(authority, r":(\d+)$", 1)


def canonical_url_col(url: Column) -> Column:
    u = F.trim(url)
    scheme = scheme_col(u)
    host = host_col(u)
    port = port_col(u)
    # strip the fragment BEFORE extracting path/query: a '?' inside a
    # fragment ("#sec?x=1") is fragment text, not a query string
    pre = F.regexp_replace(u, r"#.*", "")
    path = F.regexp_extract(pre, _PATH_RE, 1)
    query = F.regexp_extract(pre, _QUERY_RE, 1)

    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    u = F.col(url_col)
    return df.withColumn(out_col, canonical_url_col(u)).withColumn(
        "host", host_col(u)
    )


def filter_blocked_hosts(
    df: DataFrame, blocklist: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Drop rows whose host is on the blocklist — broadcast LEFT ANTI join.

    Blocklists (spam hosts, opted-out domains, adult filters) are tiny next
    to the crawl: broadcasting turns the filter into a map-side hash probe —
    no shuffle of the corpus, ever. `blocklist` must carry a ``host``
    column (or pass host_col).
    """
    return df.join(F.broadcast(blocklist), host_col, "left_anti")


def host_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl stats over canonicalized urls.

    One hash aggregation keyed by host; `n_pages` (distinct canonical urls)
    uses Spark's two-phase distinct expansion — partial aggregation per
    partition, no raw-row reshuffle. Hot hosts are the classic skew key at
    crawl scale: route through operators/skew.salted_aggregate when a host
    exceeds a partition (q23 demonstrates the salted twin of this shape).
    """
    c = with_canonical_url(df, url_col)
    return c.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.countDistinct("canonical_url").alias("n_pages"),
    )
