"""URL canonicalization, PII scrub, repetition signals, as-of join tests."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.operators import asof, pii, textstats, weburls

# ---------------------------------------------------------------------------
# weburls
# ---------------------------------------------------------------------------

CANON_CASES = [
    # case + default port + tracking params
    ("HTTP://Example.COM:80/A/B?utm_source=x&id=3", "http://example.com/A/B?id=3"),
    # https default port, fragment
    ("https://Example.com:443/x#frag", "https://example.com/x"),
    # non-default port preserved
    ("http://h.example.org:8080/p", "http://h.example.org:8080/p"),
    # empty path → /
    ("https://example.com", "https://example.com/"),
    # all params tracking → no query
    ("https://example.com/p?utm_a=1&gclid=2&fbclid=3&ref=4", "https://example.com/p"),
    # param order preserved, 'ref' dropped mid-list
    ("https://example.com/p?b=2&ref=tw&a=1", "https://example.com/p?b=2&a=1"),
    # '?' inside fragment is NOT a query
    ("https://example.com/p#sec?x=1", "https://example.com/p"),
    # path case preserved; 'refresh' param is not 'ref'
    ("https://example.com/CaseSensitive?refresh=1", "https://example.com/CaseSensitive?refresh=1"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i long, url string")
    got = {
        r["i"]: r["canonical_url"]
        for r in weburls.with_canonical_url(df).collect()
    }
    for i, (_, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_host_rollup_counts_canonical_pages(spark):
    urls = [
        "HTTP://A.com:80/x?utm_source=1",
        "http://a.COM/x",          # same canonical page
        "http://a.com/y",
        "https://b.org/z#f1",
        "https://B.ORG/z#f2",      # same canonical page
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["host"]: (r["n_fetches"], r["n_pages"]) for r in weburls.host_rollup(df).collect()}
    assert got == {"a.com": (3, 2), "b.org": (2, 1)}


# ---------------------------------------------------------------------------
# pii
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (1, "mail alice.smith@example.com and ops@EXAMPLE.COM today"),
        (2, "call +1 (555) 123-4567 or 555-867-5309 now"),
        (3, "no pii, just v1.2.3 build 2024 and ext. 4567"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii.scrub_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert got[1]["text"] == "mail [EMAIL] and [EMAIL] today"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert got[2]["text"] == "call [PHONE] or [PHONE] now"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (0, 0)
    assert got[3]["text"] == rows[2][1]
    assert (got[4]["n_emails"], got[4]["n_phones"]) == (0, 0)


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_hand_computed(spark):
    text_dup = "spam line\nspam line\nunique one\nspam line"  # 3 of 4 lines dup
    text_gram = "buy now buy now buy now"  # bigrams: 'buy now'×3, 'now buy'×2
    df = spark.createDataFrame(
        [(1, text_dup), (2, text_gram), (3, ""), (4, "single")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.repetition_signals(df).collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == pytest.approx(0.75)
    # dup chars = 3·9 = 27 of total 27 + 10 = 37
    assert got[1]["dup_line_char_frac"] == pytest.approx(round(27 / 37, 4))
    assert got[2]["n_bigrams"] == 5
    assert got[2]["top_bigram_frac"] == pytest.approx(0.6)
    # empty and single-word docs survive with zeroed signals
    assert got[3]["n_lines"] == 0 and got[3]["top_bigram_frac"] == 0.0
    assert got[4]["n_bigrams"] == 0


# ---------------------------------------------------------------------------
# asof join
# ---------------------------------------------------------------------------


def _t(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(5)), (2, 10, _t(1)), (3, 20, _t(9)), (4, 30, _t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _t(2)),
            (101, 10, _t(4)),   # latest ≤ day 5 for user 10
            (102, 10, _t(6)),   # after left ts — never matched
            (103, 20, _t(9)),   # exactly equal ts matches (<= convention)
            # user 30 has no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof.asof_join(
        left,
        right.select("user_id", "ts", "event_id"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        payload_cols=["ts", "event_id"],
    )
    got = {r["event_id"]: r["asof_event_id"] for r in out.collect()}
    assert got == {1: 101, 2: None, 3: 103, 4: None}


def test_asof_join_tie_breaks_by_greatest_right_id(spark):
    left = spark.createDataFrame([(1, 7, _t(3))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(200, 7, _t(3)), (201, 7, _t(3))],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof.asof_join(
        left,
        right.select("user_id", "ts", "event_id"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
    )
    assert out.collect()[0]["asof_event_id"] == 201


def test_asof_join_is_partitioning_invariant(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, i % 5, _t(1 + i % 20, i % 23)) for i in range(200)],
        "event_id long, user_id long, ts timestamp",
    )
    rows = [(1000 + i, i % 5, _t(1 + (i * 3) % 20, (i * 7) % 23)) for i in range(60)]
    rng.shuffle(rows)
    right = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    r_sel = right.select("user_id", "ts", "event_id")
    a = asof.asof_join(left, r_sel, "user_id", "ts", "ts", "event_id")
    b = asof.asof_join(
        left.repartition(7, "ts"), r_sel.repartition(3, "event_id"),
        "user_id", "ts", "ts", "event_id",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_page_metadata_extraction(spark):
    from pdf_parser_spark.operators import weburls

    df = spark.createDataFrame(
        [
            ("a", '<head><title>Hi</title><meta name="description" '
                  'content="sum"><link rel="canonical" href="https://x/y">'
                  "</head>"),
            ("b", "<head><title>Only title</title></head>"),
            ("c", "<p>nothing</p>"),
        ],
        "url string, html string",
    )
    got = {
        r["url"]: (r["title"], r["meta_description"], r["canonical_url"])
        for r in weburls.with_page_metadata(df).collect()
    }
    assert got == {
        "a": ("Hi", "sum", "https://x/y"),
        "b": ("Only title", "", ""),
        "c": ("", "", ""),
    }


def test_robots_decisions_rfc_semantics(spark):
    from pdf_parser_spark.operators import weburls

    urls = spark.createDataFrame(
        [
            ("https://e.com/a/b/c",),   # longest match /a/b (disallow)
            ("https://e.com/a/x",),     # /a only (allow)
            ("https://e.com/free",),    # no rule -> allowed
            ("https://e.com/tie",),     # equal-length allow+disallow -> allow
            ("https://other.org/a/b",), # rules are per host
            ("https://e.com",),         # empty path treated as '/'
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("e.com", "/a", True),
            ("e.com", "/a/b", False),
            ("e.com", "/tie", True),
            ("e.com", "/tie", False),
            ("e.com", "/", True),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {
        r["url"]: (r["matched_prefix"], r["allowed"])
        for r in weburls.robots_decisions(urls, rules).collect()
    }
    assert got == {
        "https://e.com/a/b/c": ("/a/b", False),
        "https://e.com/a/x": ("/a", True),
        "https://e.com/free": ("/", True),
        "https://e.com/tie": ("/tie", True),
        "https://other.org/a/b": ("", True),
        "https://e.com": ("/", True),
    }


def test_asof_join_string_right_id_tie_break(spark):
    """Non-numeric right ids must keep the greatest-right_id tie-break
    (ADVICE r3: a cast-to-long nulled them out)."""
    left = spark.createDataFrame(
        [(1, 7, _t(3))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("sig-b", 7, _t(3)), ("sig-a", 7, _t(3)), ("sig-c", 7, _t(3))],
        "sig_id string, user_id long, ts timestamp",
    )
    out = asof.asof_join(
        left,
        right.select("user_id", "ts", "sig_id"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="sig_id",
    )
    assert out.collect()[0]["asof_sig_id"] == "sig-c"


# ---------------------------------------------------- fetch scheduling


def test_schedule_fetches_matches_duckdb(spark):
    """Politeness schedule vs an independent DuckDB formulation of the
    same rule (rank per host, offset = rank*delay, wave = floor/cycle)."""
    import duckdb

    rows = [(f"https://h{i % 3}.com/p{j:02d}",) for i in range(3) for j in range(7)]
    urls = spark.createDataFrame(rows, "url string")
    delays = spark.createDataFrame(
        [("h0.com", 30.0), ("h1.com", 5.0)], "host string, crawl_delay_s double"
    )  # h2.com missing -> default 1.0
    got = {
        (r["url"], r["host"], r["fetch_seq"], r["offset_s"], r["wave"])
        for r in weburls.schedule_fetches(
            urls, delays, per_host_cap=5, cycle_s=60.0
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table u(url varchar)")
    con.executemany("insert into u values (?)", [(r[0],) for r in rows])
    con.execute("create table d(host varchar, delay double)")
    con.executemany("insert into d values (?, ?)",
                    [("h0.com", 30.0), ("h1.com", 5.0)])
    expect = {
        (u, h, s, o, w)
        for u, h, s, o, w in con.execute("""
            with ranked as (
              select url,
                     regexp_extract(url, '^[a-z]+://([^/]+)', 1) as host,
                     row_number() over (partition by regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                                        order by url) - 1 as seq
              from u
            )
            select r.url, r.host, r.seq,
                   r.seq * coalesce(d.delay, 1.0) as offset_s,
                   cast(floor(r.seq * coalesce(d.delay, 1.0) / 60.0) as int) as wave
            from ranked r left join d on r.host = d.host
            where r.seq < 5
        """).fetchall()
    }
    assert got == expect
    # politeness arithmetic: h0 (30s delay) spreads 5 urls over 3 waves,
    # h2 (default 1s) keeps all its capped urls in wave 0
    waves = {h: sorted(w for (_, hh, _, _, w) in got if hh == h) for h in
             ("h0.com", "h1.com", "h2.com")}
    assert waves["h0.com"] == [0, 0, 1, 1, 2]
    assert waves["h2.com"] == [0] * 5


def test_schedule_fetches_priority_and_plan(spark):
    urls = spark.createDataFrame(
        [("https://a.com/x", 1.0), ("https://a.com/y", 9.0),
         ("https://a.com/z", 5.0)],
        "url string, score double",
    )
    delays = spark.createDataFrame([("a.com", 2.0)], "host string, crawl_delay_s double")
    out = weburls.schedule_fetches(urls, delays, priority_col="score",
                                   per_host_cap=2)
    rows = {r["url"]: r["fetch_seq"] for r in out.collect()}
    # highest score fetches first; the cap drops the lowest
    assert rows == {"https://a.com/y": 0, "https://a.com/z": 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_schedule_fetches_duplicate_delay_rows_collapse(spark):
    """Robots tables carry one Crawl-delay per user-agent group; the
    schedule must emit each url once, at the most conservative rate."""
    urls = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/2",)], "url string"
    )
    delays = spark.createDataFrame(
        [("a.com", 5.0), ("a.com", 30.0)], "host string, crawl_delay_s double"
    )
    rows = weburls.schedule_fetches(urls, delays).collect()
    assert len(rows) == 2  # no fan-out
    by_url = {r["url"]: r["offset_s"] for r in rows}
    assert by_url == {"https://a.com/1": 0.0, "https://a.com/2": 30.0}


def test_sitemap_entries_urlset_and_index(spark):
    urlset = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> https://a.com/p1 </loc><lastmod>2026-01-02</lastmod></url>"
        "<url><loc>https://a.com/p2</loc></url>"
        "<url><lastmod>2026-01-03</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.com/sitemap-1.xml</loc>"
        "<lastmod>2026-02-01T10:00:00+00:00</lastmod></sitemap></sitemapindex>"
    )
    docs = spark.createDataFrame(
        [("https://a.com/sitemap.xml", urlset),
         ("https://a.com/sitemap_index.xml", index),
         ("https://a.com/not-a-sitemap.xml", "<html>no</html>")],
        "url string, xml string",
    )
    rows = {(r["url"], r["loc"], r["kind"], r["lastmod"])
            for r in weburls.sitemap_entries(docs).collect()}
    assert rows == {
        ("https://a.com/sitemap.xml", "https://a.com/p1", "urlset", "2026-01-02"),
        ("https://a.com/sitemap.xml", "https://a.com/p2", "urlset", None),
        ("https://a.com/sitemap_index.xml", "https://a.com/sitemap-1.xml",
         "sitemapindex", "2026-02-01T10:00:00+00:00"),
    }
    out = weburls.sitemap_entries(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
