"""Z-order layout: Morton key correctness and the pruning payoff it
exists for — a z-clustered table prunes on BOTH columns, a linearly
sorted one only on its sort column."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_parser_spark.operators.layout import zorder_bucket_col, zorder_key_col
from pdf_parser_spark.plans.snapshots import SnapshotTable


def _grid(spark, n=64):
    """n*n rows over an (x, y) grid, shuffled arrival order."""
    return (
        spark.range(n * n)
        .select(
            (F.xxhash64("id") % 97).alias("noise"),
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("int").cast("double").alias("y"),
            F.col("id").alias("row_id"),
        )
        .repartition(8)
    )


def test_zorder_key_orders_locality(spark):
    """Morton property on an exact power-of-two grid: the key equals the
    reference bit-interleave of the coordinates."""
    df = _grid(spark, 16)
    got = (
        df.withColumn("z", zorder_key_col(df, ["x", "y"], bits=4))
        .select("x", "y", "z")
        .collect()
    )

    def ref(x, y):
        z = 0
        for j in range(4):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    for r in got:
        assert r["z"] == ref(int(r["x"]), int(r["y"])), (r["x"], r["y"])


def test_zorder_prunes_both_columns(spark, tmp_path):
    df = _grid(spark, 64)
    n_files = 16

    zt = SnapshotTable(
        spark, str(tmp_path / "z"), partition_col="bucket",
        stats_cols=("x", "y"),
    )
    clustered = df.withColumn(
        "bucket", zorder_bucket_col(df, ["x", "y"], num_buckets=n_files)
    )
    zt.append(clustered)
    assert len(zt.plan_entries()) >= n_files - 1  # buckets pin file count

    lt = SnapshotTable(
        spark, str(tmp_path / "lin"), partition_col="bucket",
        stats_cols=("x", "y"),
    )
    # linear layout twin: same file count, clustered by x alone
    x_bounds = [4.0 * i for i in range(1, n_files)]
    linear = df.withColumn(
        "bucket",
        F.size(
            F.filter(
                F.array(*[F.lit(b) for b in x_bounds]),
                lambda b: F.col("x") > b,
            )
        ).cast("int"),
    )
    lt.append(linear)

    def n_kept(table, col, lo, hi):
        return len(table.plan_entries(min_max={col: (lo, hi)}))

    # narrow slice on each axis: z-order prunes most files on BOTH
    assert n_kept(zt, "x", 3.0, 4.0) <= n_files // 2
    assert n_kept(zt, "y", 3.0, 4.0) <= n_files // 2
    # linear layout: perfect on x, useless on y (every file spans all y)
    assert n_kept(lt, "x", 3.0, 4.0) <= 2
    assert n_kept(lt, "y", 3.0, 4.0) == n_files
    # pruning stays correct: the kept files contain every matching row
    rows = (
        zt.read(min_max={"x": (3.0, 4.0)})
        .filter((F.col("x") >= 3.0) & (F.col("x") <= 4.0))
        .count()
    )
    assert rows == 2 * 64  # two x columns of the 64-grid


def test_zorder_rejects_oversized_keys(spark):
    df = _grid(spark, 8)
    try:
        zorder_key_col(df, ["x", "y"], bits=32)
    except ValueError:
        return
    raise AssertionError("expected ValueError for bits*cols > 63")
