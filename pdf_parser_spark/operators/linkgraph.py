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

_HREF_RE = r'href="([^"]*)"'


def extract_outlinks(pages: DataFrame, html_col: str = "html",
                     id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """One row per (source page, href target url) — native, no DOM pass.

    `html_col` may be string or binary (cast to string — the pages table's
    html column is utf-8 bytes). Relative links are kept verbatim; callers
    that only consume absolute links filter on a scheme match, which is
    what host_indegree does.
    """
    html_str = F.col(html_col).cast("string")
    return pages.select(
        *id_cols,
        F.explode(
            F.regexp_extract_all(html_str, F.lit(_HREF_RE), F.lit(1))
        ).alias("out_url"),
    )


def host_indegree(links: DataFrame, src_col: str = "url",
                  out_col: str = "out_url") -> DataFrame:
    """Per target host: total inbound links + distinct linking source pages.

    Absolute links only (a scheme-less href has no host). Both aggregates
    are a single hash exchange keyed by host; count(distinct src) is
    Spark's standard two-phase expand — fine because the key space is
    |hosts|, not |pages|.
    """
    h = links.select(
        F.col(src_col).alias("_src"),
        weburls.host_col(F.col(out_col)).alias("host"),
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
        weburls.host_col(F.col(out_col)).alias("dst"),
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
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        for df in (nodes, e):
            df.unpersist()
        return spark.createDataFrame([], "node string, rank double")
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

    Pairs the href inventory with the anchor's inner text via two aligned
    regexp_extract_all passes zipped positionally (the <a ...>text</a>
    shape; nested markup inside an anchor is out of scope for the fast
    path — the DOM extractor handles those pages).
    """
    html_str = F.col(html_col).cast("string")
    pair_re = r'<a[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(pair_re), F.lit(1)).alias("out_url"),
        F.regexp_extract_all(html_str, F.lit(pair_re), F.lit(2)).alias("anchor"),
    )
    return pages.select(*id_cols, F.explode(pairs).alias("_p")).select(
        *id_cols,
        F.col("_p.out_url").alias("out_url"),
        F.col("_p.anchor").alias("anchor"),
    )


def host_anchor_rollup(anchors: DataFrame, src_col: str = "url",
                       out_col: str = "out_url",
                       anchor_col: str = "anchor") -> DataFrame:
    """Per target host: inbound anchor-text profile (the classic webgraph
    signal — anchor text describes the TARGET, Craswell et al. 2001).

    Returns (host, n_anchors, n_distinct_anchors, anchors_csv) where
    anchors_csv is the sorted distinct anchor list — deterministic and
    oracle-comparable. One hash exchange keyed by host; collect_set is
    bounded by the distinct-anchor vocabulary per host (cap upstream for
    adversarial hosts).
    """
    h = anchors.select(
        weburls.host_col(F.col(out_col)).alias("host"),
        F.col(anchor_col).alias("anchor"),
    ).filter(F.col("host") != "")
    return h.groupBy("host").agg(
        F.count("*").alias("n_anchors"),
        F.countDistinct("anchor").alias("n_distinct_anchors"),
        F.array_join(F.array_sort(F.collect_set("anchor")), ",").alias(
            "anchors_csv"
        ),
    )


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iters: int = 25) -> DataFrame:
    """Weakly connected components → (node, component).

    Iterative min-label propagation (the standard large-graph WCC, e.g.
    Kiveris et al. 2014 "Connected Components in MapReduce and Beyond" —
    public methodology): every node starts labeled with itself; each round
    it takes the minimum label among itself and its neighbors; fixpoint
    when nothing changes. The label is the component's MINIMUM node id —
    a deterministic canonical representative, for string or numeric ids.

    Scale shape: each round is one equi-join of the (undirected,
    deduplicated) edge table against the label table + one
    map-side-combinable min aggregate; localCheckpoint per round keeps the
    plan O(1)-deep; convergence costs O(component diameter) rounds,
    bounded by max_iters (warns and returns a refinement if hit).
    """
    import warnings

    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"),
                                  F.col(src).alias("_d")))
        .distinct()
        .persist()
    )
    labels = (
        e.select(F.col("_s").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neigh_min = (
            e.join(labels, e["_d"] == labels["node"])
            .groupBy("_s")
            .agg(F.min("comp").alias("_nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["_s"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("_nmin"), F.col("comp"))
                ).alias("comp"),
                (F.col("_nmin") < F.col("comp")).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        warnings.warn(
            f"connected_components: not converged after {max_iters} rounds; "
            "labels are a refinement (over-segmented components)",
            stacklevel=2,
        )
    e.unpersist()
    return labels.select("node", F.col("comp").alias("component"))
