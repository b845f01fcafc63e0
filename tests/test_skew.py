"""Salted two-phase aggregation: exact equality with the naive plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.fixtures import pages_spark
from pdf_parser_spark.operators import skew


def test_host_of(spark):
    got = spark.range(1).select(
        skew.host_of(F.lit("https://host7.example/stmt/123")).alias("h")
    ).collect()[0]["h"]
    assert got == "host7.example"


def test_salted_equals_naive_on_skewed_corpus(spark):
    pages = pages_spark(spark, n_docs=400, partitions=8)
    salted = skew.host_stats_salted(pages).orderBy("host").collect()
    naive = (
        pages.withColumn("host", skew.host_of(F.col("url")))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length(F.col("html"))).alias("total_bytes"),
            F.sum(F.length(F.col("text"))).alias("total_chars"),
        )
        .orderBy("host")
        .collect()
    )
    assert [r.asDict() for r in salted] == [r.asDict() for r in naive]
    # fixture skew really is present: host0 owns ~30%
    by_host = {r["host"]: r["n_pages"] for r in naive}
    assert by_host["host0.example"] >= 0.25 * 400


def test_salt_column_is_deterministic_and_bounded(spark):
    pages = pages_spark(spark, n_docs=100, partitions=4)
    s1 = skew.with_salt(pages, "url", 16).select("url", "_salt").collect()
    s2 = skew.with_salt(pages, "url", 16).select("url", "_salt").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert all(0 <= r["_salt"] < 16 for r in s1)
    # salt spreads the hot host across many buckets
    host0 = [r["_salt"] for r in s1 if "host0" in r["url"]]
    assert len(set(host0)) > 4
