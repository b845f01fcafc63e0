"""Web link-graph operators: outlink extraction, in-degree, PageRank.

The extraction tier's webtext counterpart of the reference's cross-document
joins: a Common-Crawl-style corpus is also a hyperlink GRAPH, and crawl
prioritization / spam filtering / quality weighting all start from link
structure (public methodology: Page et al. 1999 "The PageRank Citation
Ranking"; Common Crawl's own host-level webgraph releases).

Design points:
- outlink extraction is a NATIVE `regexp_extract_all` over the html string
  — whole-stage codegen, zero Python, zero shuffles; the full DOM parser
  (html_extract.py) is reserved for text extraction where block structure
  matters, because an href inventory doesn't need a DOM;
- host canonicalization reuses operators/weburls (lowercase, strip port);
- in-degree is one hash aggregate keyed by target host;
- PageRank is power iteration where each step is ONE shuffle (the
  contribution aggregate keyed by dst); ranks and degrees stay keyed by
  node, the edge table is computed once and persisted, and each iteration
  localCheckpoints the (tiny, |hosts|-sized) rank table so iteration i
  doesn't re-plan iterations 1..i-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators import weburls

# Three quoting styles extracted DIRECTLY from the raw html, one pattern
# per style (a normalize-to-double-quotes rewrite pass corrupted two real
# shapes: href= text inside OTHER quoted attribute values became a phantom
# link, and single-quoted values containing double quotes got truncated at
# the first "). Each pattern requires whitespace before `href`, so
# attribute-VALUE text like title='href=evil' can never match — the html
# spec requires whitespace between attributes.
_HREF_DQUOTE_RE = r'\shref\s*=\s*"([^"]*)"'
_HREF_SQUOTE_RE = r"\shref\s*=\s*'([^']*)'"
_HREF_UNQUOTED_RE = r"""\shref\s*=\s*([^'"\s>][^\s>]*)"""


def extract_outlinks(pages: DataFrame, html_col: str = "html",
                     id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """One row per (source page, href target url) — native, no DOM pass.

    `html_col` may be string or binary (cast to string — the pages table's
    html column is utf-8 bytes). Double-quoted, single-quoted, and
    unquoted href values are each extracted with their own pattern from
    the raw markup; within a page the three groups concatenate (per-style
    document order — consumers are set-shaped: in-degree, edges,
    pagerank). Relative links are kept verbatim; callers that only
    consume absolute links filter on a scheme match, which is what
    host_indegree does.
    """
    html_str = F.col(html_col).cast("string")
    hrefs = F.concat(
        F.regexp_extract_all(html_str, F.lit(_HREF_DQUOTE_RE), F.lit(1)),
        F.regexp_extract_all(html_str, F.lit(_HREF_SQUOTE_RE), F.lit(1)),
        F.regexp_extract_all(html_str, F.lit(_HREF_UNQUOTED_RE), F.lit(1)),
    )
    return pages.select(*id_cols, F.explode(hrefs).alias("out_url"))


def _link_host(url_col):
    """Host of a link TARGET. Protocol-relative links (``//cdn.com/x``)
    carry a host despite lacking a scheme — they are the standard real-
    HTML pattern for CDN/cross-scheme references, and dropping them
    undercounts exactly the heavily-linked infrastructure hosts the
    in-degree signal ranks. Path-relative links still yield ''."""
    fixed = F.when(
        url_col.startswith("//"), F.concat(F.lit("http:"), url_col)
    ).otherwise(url_col)
    return weburls.host_col(fixed)


def host_indegree(links: DataFrame, src_col: str = "url",
                  out_col: str = "out_url") -> DataFrame:
    """Per target host: total inbound links + distinct linking source pages.

    Links with a host only — absolute or protocol-relative (path-relative
    hrefs have none). Both aggregates are a single hash exchange keyed by
    host; count(distinct src) is Spark's standard two-phase expand — fine
    because the key space is |hosts|, not |pages|.
    """
    h = links.select(
        F.col(src_col).alias("_src"),
        _link_host(F.col(out_col)).alias("host"),
    ).filter(F.col("host") != "")
    return h.groupBy("host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("_src").alias("n_src_pages"),
    )


def host_edges(links: DataFrame, src_col: str = "url",
               out_col: str = "out_url") -> DataFrame:
    """Distinct (src_host, dst_host) edges, self-loops dropped."""
    e = links.select(
        weburls.host_col(F.col(src_col)).alias("src"),
        _link_host(F.col(out_col)).alias("dst"),
    ).filter((F.col("src") != "") & (F.col("dst") != ""))
    return e.filter(F.col("src") != F.col("dst")).distinct()


def pagerank(edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Power-iteration PageRank over distinct (src, dst) edges.

    Semantics (the standard formulation): rank initializes uniform 1/N;
    each step every node sends rank/out_degree along its out-edges; the
    mass of DANGLING nodes (no out-edges) is redistributed uniformly; new
    rank = (1-d)/N + d * (contributions + dangling/N). Ranks always sum
    to 1. Returns (node, rank).

    Scale shape: per iteration ONE wide edge — the contribution aggregate
    keyed by dst (map-side partial sums absorb hub fan-in); the
    rank-to-edge join is keyed by src on the persisted degree-annotated
    edge table, so AQE broadcasts the |nodes|-sized rank side when small
    and reuses the src partitioning when not. The dangling mass is a
    one-ROW aggregate broadcast back into the same job (never a driver
    round-trip per iteration: exactly one Spark job per step, the
    localCheckpoint that materializes the new ranks). localCheckpoint per
    iteration keeps the plan O(1)-deep instead of O(n_iter).
    """
    spark = edges.sparkSession
    # pin the distinct edge table FIRST: nodes, degrees, and the
    # degree-annotated edges all derive from it — without the persist the
    # upstream plan (often an extraction scan) re-executes four times
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    e.count()
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        for df in (nodes, e):
            df.unpersist()
        # keep the NODE TYPE of the input: a hard-coded string schema made
        # the output type flip with data (bigint graphs returned bigint
        # ranks on every non-empty batch but string on the empty one,
        # breaking unions/joins downstream under ANSI)
        return nodes.select("node").withColumn(
            "rank", F.lit(0.0).cast("double")
        ).limit(0)
    out_deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    edges_deg = e.join(out_deg, "src").persist()
    edges_deg.count()  # materialize once; reused every iteration
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    dangling_nodes.count()

    # size the per-iteration shuffles to the GRAPH, not the session: a
    # host graph is often tiny next to the page corpus whose session conf
    # we inherit (≈100k nodes/partition; no-op when the graph is big,
    # restored on exit). The remaining per-iteration floor is one job's
    # scheduling + the localCheckpoint write.
    conf_key = "spark.sql.shuffle.partitions"
    saved_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, max(1, min(int(saved_parts), n // 100_000 + 1)))
    try:
        ranks = _pagerank_loop(
            nodes, edges_deg, dangling_nodes, n, n_iter, damping
        )
    finally:
        spark.conf.set(conf_key, saved_parts)
    edges_deg.unpersist()
    dangling_nodes.unpersist()
    nodes.unpersist()
    e.unpersist()
    return ranks


def _pagerank_loop(nodes, edges_deg, dangling_nodes, n: int, n_iter: int,
                   damping: float):
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_contrib"))
        )
        dangling = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))  # one row: scalar fan-in
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_contrib"), F.lit(0.0))
                       + F.col("_dangling") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """(source page, href target, anchor text) triples — native, no DOM.

    Pairs the href inventory with the anchor's inner text via aligned
    regexp_extract_all passes zipped positionally (the <a ...>text</a>
    shape; nested markup inside an anchor is out of scope for the fast
    path — the DOM extractor handles those pages). One pair pattern per
    quote style, extracted from the RAW markup — same rationale as
    extract_outlinks (the old normalize-rewrite corrupted two shapes).
    """
    html_str = F.col(html_col).cast("string")
    pair_res = [
        r'<a[^>]*\shref\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>',
        r"<a[^>]*\shref\s*=\s*'([^']*)'[^>]*>([^<]*)</a>",
        r"""<a[^>]*\shref\s*=\s*([^'"\s>][^\s>]*)[^>]*>([^<]*)</a>""",
    ]
    pairs = F.concat(*[
        F.arrays_zip(
            F.regexp_extract_all(html_str, F.lit(p), F.lit(1)).alias("out_url"),
            F.regexp_extract_all(html_str, F.lit(p), F.lit(2)).alias("anchor"),
        )
        for p in pair_res
    ])
    return pages.select(*id_cols, F.explode(pairs).alias("_p")).select(
        *id_cols,
        F.col("_p.out_url").alias("out_url"),
        F.col("_p.anchor").alias("anchor"),
    )


def host_anchor_rollup(anchors: DataFrame, src_col: str = "url",
                       out_col: str = "out_url",
                       anchor_col: str = "anchor",
                       top_k: int = 64) -> DataFrame:
    """Per target host: inbound anchor-text profile (the classic webgraph
    signal — anchor text describes the TARGET, Craswell et al. 2001).

    Returns (host, n_anchors, n_distinct_anchors, anchors_csv) where
    anchors_csv is the alphabetically sorted list of the host's top_k
    anchors by inbound count (ties toward the smaller string). The cap is
    load-bearing at crawl scale: a mega-host (wikipedia.org) or an
    adversarial one has an unbounded distinct-anchor vocabulary, and an
    uncapped collect_set would put all of it in ONE aggregate row.

    Scale shape: one (host, anchor) hash aggregate with map-side partials,
    then the per-host top-k as a row_number window over that already
    host×anchor-sized table — Spark plans it as WindowGroupLimit, so every
    partition prunes to top_k candidates per host BEFORE the window
    exchange; the counts rollup reuses the same aggregate. No row ever
    holds more than top_k anchor strings.
    """
    from pyspark.sql import Window

    h = anchors.select(
        weburls.host_col(F.col(out_col)).alias("host"),
        F.col(anchor_col).alias("anchor"),
    ).filter(F.col("host") != "")
    per_anchor = h.groupBy("host", "anchor").agg(F.count("*").alias("_n"))
    totals = per_anchor.groupBy("host").agg(
        F.sum("_n").alias("n_anchors"),
        F.count("*").alias("n_distinct_anchors"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("_n"), F.asc("anchor"))
    top = (
        per_anchor.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_k)
        .groupBy("host")
        .agg(
            F.array_join(F.array_sort(F.collect_list("anchor")), ",").alias(
                "anchors_csv"
            )
        )
    )
    return totals.join(top, "host").select(
        "host", "n_anchors", "n_distinct_anchors", "anchors_csv"
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014): every node u connects its
    strictly-LARGER neighbors to m(u) = min(Γ(u) ∪ {u})."""
    nb = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v")
    mins = nb.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least(F.col("_mn"), F.col("u")).alias("_m"))
    out = (
        nb.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node u (as the LARGER endpoint of its edges)
    connects itself and its smaller neighbors to the minimum of them.

    Input must be oriented u > v — which _large_star guarantees (it emits
    (v, m) with v > u ≥ m)."""
    mins = e.groupBy("u").agg(F.min("v").alias("_m"))
    moved = e.join(mins, "u").select(
        F.col("v").alias("n"), F.col("_m").alias("m")
    )
    selfed = mins.select(F.col("u").alias("n"), F.col("_m").alias("m"))
    out = moved.unionByName(selfed).select(
        F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v")
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _edge_checksum(e: DataFrame) -> tuple[int, int]:
    """(row count, sum of per-edge xxhash64) — equality across rounds means
    the edge set is unchanged (a 2^-64-per-pair collision risk, used only
    to DETECT the fixpoint; the labels themselves come from the edges)."""
    row = e.agg(
        F.count("*").alias("n"),
        # decimal(38,0) accumulator: a long sum overflows under ANSI mode
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iters: int = 25,
                         strict: bool = False,
                         _stats: dict | None = None) -> DataFrame:
    """Weakly connected components → (node, component).

    Alternating large-star / small-star contraction (Kiveris et al. 2014
    "Connected Components in MapReduce and Beyond" — public methodology):
    each round, large-star hangs every node's larger neighbors off its
    local minimum and small-star contracts each node's smaller neighbors
    onto theirs; the edge set converges to a star forest where every node
    points directly at its component's MINIMUM id — a deterministic
    canonical representative, for string or numeric ids. Convergence is
    O(log n) rounds in practice (paper bound O(log² n)), vs O(component
    diameter) for plain min-label propagation — a 10^6-long duplicate
    chain finishes in ~20 rounds instead of 10^6.

    Scale shape: each star phase is one min aggregate keyed by node + one
    equi-join of the edge table against that |nodes|-sized min table (both
    map-side-combinable, no collect_set of neighborhoods — hub nodes cost
    a shuffle key, not a row-width blowup); localCheckpoint per round
    keeps the plan O(1)-deep; the fixpoint test is a 2-number checksum
    aggregate, not a driver diff.

    On max_iters exhaustion the labels are a REFINEMENT (over-segmented):
    strict=True raises RuntimeError instead of warning — callers that
    silently lose semantics on refinement (near-dup curation keeps extra
    duplicates) should pass strict=True.
    """
    import warnings

    oriented = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    )
    e = (
        oriented.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # node set comes from the UNFILTERED input: a node whose only edge is a
    # self-loop is a singleton component and must still receive a label.
    # One explode pass, not a union of two projections — the union shape
    # re-executed the caller's edge derivation (often a banded candidate
    # join) once per branch.
    all_nodes = (
        oriented.select(F.explode(F.array("u", "v")).alias("node"))
        .distinct()
        .persist()
    )
    prev = _edge_checksum(e)
    rounds = 0
    converged = prev[0] == 0
    while not converged and rounds < max_iters:
        e = _small_star(_large_star(e)).localCheckpoint()
        rounds += 1
        cur = _edge_checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if _stats is not None:
        _stats["n_rounds"] = rounds
        _stats["converged"] = converged
    if not converged:
        msg = (
            f"connected_components: not converged after {max_iters} rounds; "
            "labels are a refinement (over-segmented components)"
        )
        if strict:
            all_nodes.unpersist()
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    # at the fixpoint each non-root node has exactly one edge (node, min);
    # the min() guard keeps labels single-valued even on a non-strict
    # refinement return
    parents = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("_comp")
    )
    labels = all_nodes.join(parents, "node", "left").select(
        "node", F.coalesce(F.col("_comp"), F.col("node")).alias("component")
    )
    out = labels.localCheckpoint()
    all_nodes.unpersist()
    return out
