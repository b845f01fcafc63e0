"""Shared pytest fixtures: one local SparkSession per test run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_parser_spark.session import get_spark

    s = get_spark(app_name="pdf_parser_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_tiny(spark):
    """100-doc deterministic corpus (FIXTURES.md F1 tiny scale)."""
    from pdf_parser_spark.fixtures import pages_spark

    df = pages_spark(spark, n_docs=100, partitions=4).cache()
    df.count()
    return df
