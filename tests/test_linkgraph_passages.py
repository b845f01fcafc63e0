"""Link-graph operators (outlinks, in-degree, PageRank) + passage dedup.

PageRank parity is asserted against an independent numpy power iteration
with the same damping and dangling-mass handling; passage dedup against a
pure-Python first-occurrence simulation (and its own hash/exact parity).
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark.operators import dedupe, linkgraph


# ---------------------------------------------------------------- outlinks


def _pages(spark):
    rows = [
        (
            "https://a.com/page1",
            '<html><body><a href="https://b.com/x">b</a>'
            '<a href="HTTP://C.com:80/y">c</a>'
            '<a href="/relative/path">rel</a>'
            '<p>no links here</p></body></html>',
        ),
        (
            "https://a.com/page2",
            '<html><a href="https://b.com/z">b again</a></html>',
        ),
        ("https://b.com/only-text", "<html><p>nothing</p></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_outlinks_native_and_complete(spark):
    links = linkgraph.extract_outlinks(_pages(spark))
    got = {(r["url"], r["out_url"]) for r in links.collect()}
    assert got == {
        ("https://a.com/page1", "https://b.com/x"),
        ("https://a.com/page1", "HTTP://C.com:80/y"),
        ("https://a.com/page1", "/relative/path"),
        ("https://a.com/page2", "https://b.com/z"),
    }
    # the hot path must be pure codegen: no Python eval in the plan
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_extract_outlinks_binary_html(spark):
    df = spark.createDataFrame(
        [("u1", '<a href="https://x.org/p">x</a>'.encode())],
        "url string, html binary",
    )
    assert linkgraph.extract_outlinks(df).collect()[0]["out_url"] == "https://x.org/p"


def test_host_indegree_counts_and_relative_links_dropped(spark):
    deg = {
        r["host"]: (r["n_links"], r["n_src_pages"])
        for r in linkgraph.host_indegree(linkgraph.extract_outlinks(_pages(spark))).collect()
    }
    # relative link has no host and must not appear
    assert deg == {"b.com": (2, 2), "c.com": (1, 1)}


# ---------------------------------------------------------------- pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += rank[idx[s]] / out[idx[s]]
        dangling = rank[out == 0].sum()
        rank = (1 - d) / n + d * (contrib + dangling / n)
    return dict(zip(nodes, rank))


def test_pagerank_matches_numpy_with_dangling_nodes(spark):
    # deterministic pseudo-random digraph with dangling nodes (f, g have no
    # out-edges) and a hub (everything points at a)
    edges = [
        ("b", "a"), ("c", "a"), ("d", "a"), ("e", "a"),
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
        ("d", "f"), ("e", "g"), ("b", "g"),
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in linkgraph.pagerank(edf, n_iter=10).collect()}
    want = _numpy_pagerank(edges, n_iter=10)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_duplicate_edges_collapse(spark):
    # the operator contracts on DISTINCT edges: repeating an edge must not
    # change the result
    edges = [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in linkgraph.pagerank(edf, n_iter=5).collect()}
    want = _numpy_pagerank([("a", "b"), ("b", "a"), ("a", "c")], n_iter=5)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_empty_graph(spark):
    edf = spark.createDataFrame([], "src string, dst string")
    assert linkgraph.pagerank(edf, n_iter=3).count() == 0


# ------------------------------------------------------------ passage dedup


def _py_passage_dedup(docs, k=8):
    """Independent first-occurrence-wins simulation."""
    seen = set()
    out = {}
    for doc_id, text in docs:
        ws = [w for w in text.split() if w]
        chunks = [" ".join(ws[i : i + k]) for i in range(0, len(ws), k)]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        out[doc_id] = (" ".join(kept), len(chunks), len(kept))
    return out


def _passage_docs():
    boiler = "all rights reserved contact us terms of service"  # 8 words
    return [
        (0, f"alpha beta gamma delta epsilon zeta eta theta {boiler}"),
        # doc 1 repeats doc 0's boilerplate passage → loses it
        (1, f"{boiler} one two three four five six seven eight"),
        # doc 2 is entirely passages already seen → reassembles to ''
        (2, boiler),
        # doc 3 repeats its OWN first passage → second copy removed too
        (3, "p q r s t u v w p q r s t u v w tail words here"),
        (4, ""),  # empty document survives with zero passages
    ]


def test_passage_dedup_first_occurrence_wins(spark):
    docs = _passage_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dedup_text"], r["n_passages"], r["n_kept"])
        for r in dedupe.passage_dedup(df, k=8).collect()
    }
    assert got == _py_passage_dedup(docs, k=8)


def test_passage_dedup_hash_exact_parity(spark):
    docs = _passage_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(dedupe.passage_dedup(df, k=8, hash_passages=True).collect())
    b = sorted(dedupe.passage_dedup(df, k=8, hash_passages=False).collect())
    assert a == b


def test_passage_dedup_idempotent(spark):
    """Deduping this already-deduped corpus is a no-op on the text (every
    surviving passage is unique, so a second pass keeps them all)."""
    df = spark.createDataFrame(_passage_docs(), "doc_id long, text string")
    once = {
        r["doc_id"]: r["dedup_text"]
        for r in dedupe.passage_dedup(df, k=8).collect()
    }
    again = dedupe.passage_dedup(
        spark.createDataFrame(sorted(once.items()), "doc_id long, text string"),
        k=8,
    )
    assert {r["doc_id"]: r["dedup_text"] for r in again.collect()} == once


def test_connected_components_vs_union_find(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),      # chain → one component
        ("x", "y"),                                # pair
        ("m", "m2"), ("m2", "m3"), ("m", "m3"),    # triangle
    ]

    def union_find(es):
        parent = {}
        def find(v):
            parent.setdefault(v, v)
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v
        for s, t in es:
            rs, rt = find(s), find(t)
            if rs != rt:
                parent[max(rs, rt)] = min(rs, rt)
        return {v: find(v) for v in parent}

    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"]
           for r in linkgraph.connected_components(edf).collect()}
    assert got == union_find(edges)
    # the canonical label is the minimum id in each component
    assert got["d"] == "a" and got["y"] == "x" and got["m3"] == "m"


def test_connected_components_chain_logarithmic_rounds(spark):
    """Large-star/small-star: a 1000-node chain converges in O(log n)
    rounds, not O(diameter) (VERDICT r3 #3)."""
    n = 1000
    edges = [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    stats = {}
    got = {r["node"]: r["component"]
           for r in linkgraph.connected_components(
               edf, max_iters=15, _stats=stats).collect()}
    assert stats["converged"]
    # ~log2(1000) = 10 contraction rounds + 1 round observing the fixpoint;
    # plain label propagation would need ~1000
    assert stats["n_rounds"] <= 12
    assert len(got) == n
    assert set(got.values()) == {"n0000"}


def test_connected_components_strict_raises_on_exhaustion(spark):
    import pytest as _pytest

    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(99)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    with _pytest.raises(RuntimeError, match="not converged"):
        linkgraph.connected_components(edf, max_iters=1, strict=True)


def test_connected_components_numeric_ids_and_empty(spark):
    edf = spark.createDataFrame([(5, 3), (3, 1), (10, 12)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in linkgraph.connected_components(edf).collect()}
    assert got == {1: 1, 3: 1, 5: 1, 10: 10, 12: 10}
    empty = spark.createDataFrame([], "src long, dst long")
    assert linkgraph.connected_components(empty).count() == 0


def test_extract_outlinks_quote_styles(spark):
    """Double-quoted, single-quoted, and unquoted hrefs extract identical
    link sets (VERDICT r3 #4)."""
    df = spark.createDataFrame(
        [
            ("s1", '<a href="https://t.com/a">x</a>'),
            ("s2", "<a href='https://t.com/a'>x</a>"),
            ("s3", "<a href=https://t.com/a>x</a>"),
            ("s4", '<a class="c" href = "https://t.com/a" rel="y">x</a>'),
        ],
        "url string, html string",
    )
    rows = linkgraph.extract_outlinks(df).collect()
    assert {r["out_url"] for r in rows} == {"https://t.com/a"}
    assert len(rows) == 4
    anchors = linkgraph.extract_anchors(df).collect()
    assert {(r["out_url"], r["anchor"]) for r in anchors} == {
        ("https://t.com/a", "x")
    }
    assert len(anchors) == 4


def test_host_anchor_rollup_topk_bounds_row_width(spark):
    """One host x 10^4 distinct anchors: the rollup row carries only the
    top_k most frequent, while the counts stay exact (VERDICT r3 #2)."""
    from pyspark.sql import functions as F

    rows = [("s", "https://t.com/p", f"anchor{i:05d}") for i in range(10_000)]
    rows += [("s", "https://t.com/p", "popular")] * 5
    anchors = spark.createDataFrame(rows, "url string, out_url string, anchor string")
    got = linkgraph.host_anchor_rollup(anchors, top_k=8).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_anchors"] == 10_005
    assert r["n_distinct_anchors"] == 10_001
    csv = r["anchors_csv"].split(",")
    assert len(csv) == 8
    assert "popular" in csv                      # count 5 beats count 1
    assert csv == sorted(csv)                    # alphabetical presentation
    # ties broken toward the smaller string: anchor00000..anchor00006
    assert csv[:7] == [f"anchor{i:05d}" for i in range(7)]


def test_connected_components_self_loop_singleton(spark):
    """A node whose only edge is a self-loop is a singleton component —
    it must still be labeled (round-4 regression guard)."""
    edf = spark.createDataFrame(
        [("a", "b"), ("z", "z")], "src string, dst string"
    )
    got = {r["node"]: r["component"]
           for r in linkgraph.connected_components(edf).collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_href_value_text_inside_other_attributes_is_not_a_link(spark):
    """href= text inside ANOTHER attribute's value must not fabricate a
    phantom outlink, and quoted values keep embedded other-quotes."""
    pages = spark.createDataFrame(
        [
            ("u1", "<a title='href=evil' href='real'>t</a>"),
            ("u2", '<a href=\'say"hi"\'>q</a>'),
            ("u3", '<div data-x="href=nope"><a href=bare>b</a></div>'),
        ],
        "url string, html string",
    )
    got = {(r["url"], r["out_url"])
           for r in linkgraph.extract_outlinks(pages).collect()}
    assert got == {("u1", "real"), ("u2", 'say"hi"'), ("u3", "bare")}
    anchors = {(r["url"], r["out_url"], r["anchor"])
               for r in linkgraph.extract_anchors(pages).collect()}
    assert ("u1", "real", "t") in anchors
    assert all("evil" not in a[1] and "nope" not in a[1] for a in anchors)


def test_protocol_relative_links_count_toward_indegree(spark):
    links = spark.createDataFrame(
        [("https://a.com/p", "//cdn.example.com/lib.js"),
         ("https://a.com/p", "https://b.com/x"),
         ("https://a.com/p", "/relative/path")],
        "url string, out_url string",
    )
    hosts = {r["host"]: r["n_links"]
             for r in linkgraph.host_indegree(links).collect()}
    assert hosts == {"cdn.example.com": 1, "b.com": 1}


def test_pagerank_empty_graph_keeps_node_type(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = linkgraph.pagerank(edges)
    assert out.count() == 0
    assert dict(out.dtypes)["node"] == "bigint"  # not a hard-coded string
