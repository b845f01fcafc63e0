"""Cross-document host-boilerplate stripping (operators/boilerplate).

Parity is asserted against an independent pure-Python simulation of the
frequency rule (document-frequency per (host, trimmed line), threshold
max(min_docs, ceil(frac * host_pages)), strip matching lines keeping
order) — the Spark side must reproduce it row for row, plus plan-shape
assertions: the strip path is native (no Python eval) and the candidate
explode feeds exactly one (host, line_hash) exchange.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.operators import boilerplate

NAV = "Home | Products | About Us"
FOOT = "(c) 2026 Example Corp. All rights reserved."
COOKIE = "We use cookies to improve your experience."


def _docs(spark):
    """Three hosts: a.com has chrome on most pages, b.com is two pages
    sharing one line (below min_docs), c.com is a single page whose
    every line must survive (the self-erase guard)."""
    rows = []
    for i in range(6):
        body = [NAV, f"article {i} headline", f"unique text {i} " + "x" * i, FOOT]
        if i != 0:
            body.insert(2, COOKIE)  # 5/6 pages
        rows.append(("a.com", f"https://a.com/{i}", "\n".join(body)))
    rows += [
        ("b.com", "https://b.com/1", "shared line here\nalpha"),
        ("b.com", "https://b.com/2", "shared line here\nbeta"),
        ("c.com", "https://c.com/only", "lonely page\nwith two lines"),
    ]
    return spark.createDataFrame(rows, "host string, url string, text string")


def _py_strip(rows, min_docs=3, frac=0.5, min_line_chars=4):
    """Independent simulation on (host, url, text) tuples."""
    from collections import Counter, defaultdict

    df = defaultdict(Counter)
    pages = Counter()
    for host, _url, text in rows:
        pages[host] += 1
        cand = {
            ln.strip()
            for ln in (text or "").split("\n")
            if len(ln.strip()) >= min_line_chars
        }
        for ln in cand:
            df[host][ln] += 1
    out = {}
    for host, _url, text in rows:
        th = max(min_docs, math.ceil(frac * pages[host]))
        boiler = {ln for ln, n in df[host].items() if n >= th}
        kept = [
            ln
            for ln in (text or "").split("\n")
            if not (len(ln.strip()) >= min_line_chars and ln.strip() in boiler)
        ]
        out[_url] = ("\n".join(kept), len((text or "").split("\n")) - len(kept))
    return out


def test_strip_matches_python_reference(spark):
    docs = _docs(spark)
    rows = [(r["host"], r["url"], r["text"]) for r in docs.collect()]
    expect = _py_strip(rows)
    got = {
        r["url"]: (r["clean_text"], r["n_stripped_lines"])
        for r in boilerplate.strip_host_boilerplate(docs).collect()
    }
    assert got == expect
    # the chrome actually came out of a.com's pages...
    assert NAV not in got["https://a.com/3"][0]
    assert FOOT not in got["https://a.com/3"][0]
    assert COOKIE not in got["https://a.com/3"][0]
    # ...but unique content and order survived
    assert got["https://a.com/3"][0] == "article 3 headline\nunique text 3 xxx"
    # below-min_docs host untouched; single-page host untouched
    assert got["https://b.com/1"] == ("shared line here\nalpha", 0)
    assert got["https://c.com/only"] == ("lonely page\nwith two lines", 0)


def test_cookie_line_needs_frac_of_pages(spark):
    # frac=1.0: only lines on EVERY page are chrome — the 5/6 cookie line
    # survives while nav/footer (6/6) still go
    got = {
        r["url"]: r["clean_text"]
        for r in boilerplate.strip_host_boilerplate(_docs(spark), frac=1.0).collect()
    }
    assert COOKIE in got["https://a.com/3"]
    assert NAV not in got["https://a.com/3"]


def test_short_lines_and_nulls_pass_through(spark):
    rows = [
        ("h.com", "u1", "ab\ncontent one\n\nab"),
        ("h.com", "u2", "ab\ncontent two\n\nab"),
        ("h.com", "u3", None),
        (None, "u4", "ab\nno host\n\nab"),
    ]
    docs = spark.createDataFrame(rows, "host string, url string, text string")
    got = {
        r["url"]: (r["clean_text"], r["n_stripped_lines"])
        for r in boilerplate.strip_host_boilerplate(docs, min_docs=2).collect()
    }
    # "ab" is under min_line_chars on every page: never a candidate, and
    # blank lines never reflow
    assert got["u1"] == ("ab\ncontent one\n\nab", 0)
    assert got["u3"] == ("", 0)  # null text → empty, not a crash
    assert got["u4"] == ("ab\nno host\n\nab", 0)  # null host joins nothing


def test_top_k_bounds_the_per_host_row(spark):
    # one host, 10 pages, 40 shared lines — top_k=8 must bound the array
    shared = [f"shared boilerplate line number {i:02d}" for i in range(40)]
    rows = [
        ("big.com", f"u{p}", "\n".join(shared + [f"own {p}"])) for p in range(10)
    ]
    docs = spark.createDataFrame(rows, "host string, url string, text string")
    bl = boilerplate.host_boilerplate_lines(docs, top_k=8).collect()
    assert len(bl) == 1
    assert bl[0]["n_boiler_lines"] == 8
    assert len(bl[0]["boiler_hashes"]) == 8
    # deterministic tie-break: all 40 lines tie on df=10, kept set is the
    # 8 smallest hashes
    full = boilerplate.host_boilerplate_lines(docs, top_k=64).collect()[0]
    assert bl[0]["boiler_hashes"] == sorted(full["boiler_hashes"])[:8]


def test_plan_is_native_and_single_build_exchange(spark):
    docs = _docs(spark)
    out = boilerplate.strip_host_boilerplate(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the rank filter must reach the window as a group-limit prune
    assert "WindowGroupLimit" in plan


def test_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        boilerplate.host_boilerplate_lines(docs, frac=0.0)
    with pytest.raises(ValueError):
        boilerplate.host_boilerplate_lines(docs, min_docs=1)


def test_strip_is_idempotent(spark):
    """Stripping only removes lines; remaining lines' document frequency
    is unchanged and thresholds depend only on page counts — so a second
    pass must be a no-op. Checked on randomized corpora."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        lines_pool = [f"line {i} with some words" for i in range(30)]
        rows = []
        for h in range(3):
            for p in range(rng.randint(1, 8)):
                body = rng.sample(lines_pool, rng.randint(1, 10))
                rows.append((f"h{h}.com", f"u{h}-{p}", "\n".join(body)))
        docs = spark.createDataFrame(rows, "host string, url string, text string")
        once = boilerplate.strip_host_boilerplate(docs).select(
            "host", "url", F.col("clean_text").alias("text")
        )
        twice = boilerplate.strip_host_boilerplate(once)
        assert twice.filter(F.col("n_stripped_lines") > 0).count() == 0, seed
        assert {(r["url"], r["clean_text"]) for r in twice.collect()} == {
            (r["url"], r["text"]) for r in once.collect()
        }, seed
