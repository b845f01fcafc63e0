"""Mirror-host detection: planted mirrors found, unrelated hosts not
paired, the candidate stage is banded (never all-pairs), and the
wide-bucket guard drops universal-boilerplate fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.operators.mirrors import host_sketches, mirror_hosts


def _corpus(spark):
    """a.com and a-mirror.net share 90% of pages; b.org shares ~30% with
    a.com; c.io and d.dev are disjoint."""
    rows = []
    for i in range(100):
        text = f"article {i} body with the usual words and number {i * 7}"
        rows.append(("a.com", text))
        if i < 90:
            rows.append(("a-mirror.net", text))
    for i in range(80, 110):  # 20 overlap with a.com's 0..99 range
        rows.append(("b.org", f"article {i} body with the usual words and number {i * 7}"))
    for i in range(100):
        rows.append(("c.io", f"completely different page {i}"))
        rows.append(("d.dev", f"another unrelated site {i}"))
    return spark.createDataFrame(rows, "host string, text string")


def test_planted_mirror_found(spark):
    out = mirror_hosts(_corpus(spark), k=64, m=8, threshold=0.5)
    got = {(r["host_a"], r["host_b"]): r["jaccard_est"] for r in out.collect()}
    assert ("a-mirror.net", "a.com") in got
    j = got[("a-mirror.net", "a.com")]
    assert 0.7 < j <= 1.0  # true J = 90/100 = 0.9
    # nothing else passes 0.5
    assert set(got) == {("a-mirror.net", "a.com")}


def test_partial_overlap_below_threshold_excluded(spark):
    out = mirror_hosts(_corpus(spark), k=64, m=8, threshold=0.1)
    got = {(r["host_a"], r["host_b"]): r["jaccard_est"] for r in out.collect()}
    # b.org overlaps a.com (J = 20/110 ≈ 0.18) — visible at low threshold
    assert ("a.com", "b.org") in got
    assert got[("a.com", "b.org")] < 0.5
    # disjoint hosts never pair
    assert not any("c.io" in p or "d.dev" in p for p in got)


def test_wide_bucket_guard(spark):
    # 50 hosts all serving ONE identical page: every sketch is the same
    # single hash; without the guard that bucket yields 50*49/2 pairs
    rows = [(f"h{i}.net", "the parked domain page") for i in range(50)]
    docs = spark.createDataFrame(rows, "host string, text string")
    out = mirror_hosts(docs, k=16, m=4, threshold=0.1, max_hosts_per_hash=10)
    assert out.isEmpty()  # bucket width 50 > 10 → dropped
    # raising the cap surfaces them again
    out2 = mirror_hosts(docs, k=16, m=4, threshold=0.1, max_hosts_per_hash=64)
    assert out2.count() == 50 * 49 // 2


def test_sketch_determinism(spark):
    docs = _corpus(spark)
    s1 = {r["host"]: r["kmv"] for r in host_sketches(docs, k=32).collect()}
    s2 = {r["host"]: r["kmv"] for r in host_sketches(docs, k=32).collect()}
    assert s1 == s2
