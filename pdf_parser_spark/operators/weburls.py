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


def path_col(url: Column) -> Column:
    """The path component ('' when the url has none)."""
    return F.regexp_extract(url, _PATH_RE, 1)


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


def with_page_metadata(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds title / meta-description / canonical-link columns — the
    CC-index-style per-url metadata derivative, extracted with native
    regexps (zero Python; the DOM extractor is reserved for body text).

    Empty string when a field is absent. The regexes are deliberately
    first-match (pages with duplicate tags keep the first, as browsers
    effectively do for title/canonical).
    """
    h = F.col(html_col).cast("string")
    return pages.withColumns(
        {
            "title": F.regexp_extract(h, r"<title[^>]*>([^<]*)</title>", 1),
            "meta_description": F.regexp_extract(
                h,
                r'<meta[^>]*name="description"[^>]*content="([^"]*)"',
                1,
            ),
            "canonical_url": F.regexp_extract(
                h,
                r'<link[^>]*rel="canonical"[^>]*href="([^"]*)"',
                1,
            ),
        }
    )


def robots_decisions(urls: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """RFC 9309 path matching as a relational argmax.

    ``rules``: (host, prefix, allow) — one row per Allow/Disallow line of
    a host's robots.txt. Per url: candidate rules share the url's host and
    prefix-match its path; the winner is the LONGEST prefix, ties broken
    toward allow (the RFC's most-specific-wins + allow-on-tie). Urls with
    no matching rule are allowed. Returns the urls plus
    (matched_prefix, allowed).

    Scale shape: the rules side is small by nature (robots lines per host)
    → broadcast join on host; the prefix match is a residual predicate on
    that equi-join, never a cross product; the winner is a map-side-
    combinable max_by over struct(len, allow), not a window.
    """
    path = F.coalesce(path_col(F.col(url_col)), F.lit(""))
    u = urls.withColumn("_path", F.when(path == "", "/").otherwise(path))
    u = u.withColumn("_host", host_col(F.col(url_col)))
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("prefix"),
        F.col("allow").cast("boolean").alias("allow"),
    )
    cand = u.join(
        F.broadcast(r),
        (u["_host"] == r["_host"]) & F.col("_path").startswith(F.col("prefix")),
        "left",
    ).drop(r["_host"])
    win = F.max_by(
        F.struct(F.col("prefix"), F.col("allow")),
        # longest prefix wins; equal lengths prefer allow=true
        F.struct(
            F.length("prefix").alias("l"),
            F.col("allow").cast("int").alias("a"),
        ),
    )
    grouped = cand.groupBy(url_col).agg(win.alias("_w"))
    return (
        u.select(url_col, "_path")
        .join(grouped, url_col)
        .select(
            url_col,
            F.col("_path").alias("path"),
            F.coalesce(F.col("_w.prefix"), F.lit("")).alias("matched_prefix"),
            F.coalesce(F.col("_w.allow"), F.lit(True)).alias("allowed"),
        )
    )


def schedule_fetches(urls: DataFrame, delays: DataFrame,
                     url_col: str = "url", priority_col: str | None = None,
                     default_delay_s: float = 1.0,
                     per_host_cap: int = 1000,
                     cycle_s: float = 60.0) -> DataFrame:
    """Politeness-aware fetch schedule — the frontier step between "urls
    we want" and "requests a fetcher may actually send".

    ``delays``: (host, crawl_delay_s) — e.g. robots Crawl-delay lines;
    hosts absent from it get ``default_delay_s``. Per host, urls are
    ranked (by ``priority_col`` desc when given, url asc as the total
    tie-break), capped at ``per_host_cap`` per scheduling cycle, and the
    i-th url is offset i·delay seconds from the host's first fetch —
    ``wave = floor(offset / cycle_s)`` groups the output into fetch
    batches a crawler drains in order, so a host with a 10 s delay
    lands 6 urls in a 60 s wave no matter how many urls want it.

    Scale shape: the per-host window is width-bounded BY the cap — the
    rank filter prunes to per_host_cap rows per partition before the
    host exchange (WindowGroupLimit), so a 10^8-url megahost costs the
    shuffle at most per_host_cap rows, the same guard the per-domain
    cap and anchor rollup use. The delay decoration is a host-keyed
    equi-join (broadcast when the host universe is small, AQE otherwise);
    everything is native expressions.

    Reference parity: the reference fetches one document per request on
    user demand (main.py upload path) — politeness scheduling has no
    analog there; this is the crawl-tier front door the 10^12-page
    corpus needs before extraction can run at all.
    """
    if per_host_cap < 1:
        raise ValueError("per_host_cap must be >= 1")
    if cycle_s <= 0:
        raise ValueError("cycle_s must be positive")
    from pyspark.sql import Window

    u = urls.withColumn("_host", host_col(F.col(url_col)))
    # one delay per host, conservatively the LARGEST: robots tables
    # naturally carry one Crawl-delay row per user-agent group, and a
    # duplicate-host join would fan every url into conflicting schedule
    # rows (politeness prefers the slowest applicable rate anyway)
    d = delays.select(
        F.col("host").alias("_host"),
        F.col("crawl_delay_s").cast("double").alias("_delay"),
    ).groupBy("_host").agg(F.max("_delay").alias("_delay"))
    order = (
        [F.col(priority_col).desc()] if priority_col else []
    ) + [F.col(url_col).asc()]
    ranked = (
        u.withColumn(
            "_rk", F.row_number().over(Window.partitionBy("_host").orderBy(*order))
        )
        .filter(F.col("_rk") <= per_host_cap)  # rank filter ⇒ WindowGroupLimit
    )
    offset = (F.col("_rk") - 1) * F.coalesce(
        F.col("_delay"), F.lit(float(default_delay_s))
    )
    return ranked.join(d, "_host", "left").select(
        F.col(url_col),
        F.col("_host").alias("host"),
        (F.col("_rk") - 1).cast("int").alias("fetch_seq"),
        F.round(offset, 6).alias("offset_s"),
        F.floor(offset / F.lit(float(cycle_s))).cast("int").alias("wave"),
    )


def sitemap_entries(docs: DataFrame, xml_col: str = "xml",
                    url_col: str = "url") -> DataFrame:
    """Sitemap inventory: one row per ``<loc>`` of each sitemap document
    (sitemaps.org protocol — public spec). Returns (url, loc, kind,
    lastmod) where kind is 'urlset' (page entry) or 'sitemapindex'
    (nested sitemap to fetch next — the caller loops fetch→parse until
    no index entries remain; recursion is per-round relational, never
    driver-side page-at-a-time).

    Entirely native: root-element sniff + regexp_extract_all over
    ``<url>``/``<sitemap>`` blocks, one Generate per doc — no XML
    library, no Python, no shuffle. lastmod is kept as the raw W3C
    datetime string (sitemaps carry several precisions; parse
    downstream with to_timestamp when a precision is fixed).
    """
    kind = F.when(
        F.col(xml_col).rlike(r"<\s*sitemapindex[\s>]"), F.lit("sitemapindex")
    ).when(F.col(xml_col).rlike(r"<\s*urlset[\s>]"), F.lit("urlset"))
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<\s*(?:url|sitemap)\s*>(.*?)</\s*(?:url|sitemap)\s*>"), 1
    )
    return (
        docs.select(F.col(url_col).alias("url"), kind.alias("kind"),
                    F.explode(blocks).alias("_b"))
        .filter(F.col("kind").isNotNull())
        .select(
            "url",
            F.trim(F.regexp_extract("_b", r"(?s)<\s*loc\s*>\s*(.*?)\s*</\s*loc\s*>", 1))
            .alias("loc"),
            "kind",
            F.nullif(
                F.trim(
                    F.regexp_extract(
                        "_b", r"(?s)<\s*lastmod\s*>\s*(.*?)\s*</\s*lastmod\s*>", 1
                    )
                ),
                F.lit(""),
            ).alias("lastmod"),
        )
        .filter(F.length("loc") > 0)
    )
