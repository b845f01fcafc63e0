"""Z-order (Morton-curve) data layout — multi-column file clustering.

At 100 TB the scan you avoid is the fastest scan: footer min/max pruning
(plans/snapshots.plan_entries, parquet row-group stats) only prunes on
columns the FILE LAYOUT is clustered by. A linear sort clusters one
column perfectly and leaves every other column's per-file range full-
width; interleaving the bits of several rank-normalized columns (the
Z-order curve — public methodology, Morton 1966; the same layout Delta
Lake's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite expose) makes
every clustered column's per-file range ~|domain| / files^(1/d), so a
selective predicate on ANY of them prunes most files.

Everything is native Spark SQL: quantile boundaries come from one
approxQuantile pass per column (driver gets num_buckets floats, never
rows), the bucket id is the usual sorted-boundary count (the
with_global_index idiom), and the bit interleave is a fold over bit
positions in codegen (shiftleft / shiftright / bitwise AND-OR) — no UDF,
no shuffle beyond the final range partition by the key itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key_col(df: DataFrame, cols: list[str], bits: int = 8):
    """Column: the Morton interleave of the rank-normalized ``cols``.

    Each column is mapped to a ``bits``-bit bucket id by its own
    approxQuantile boundaries (rank space, so skewed distributions still
    spread evenly across buckets); bit j of column c lands at position
    j * len(cols) + c. Null values bucket to 0 (sort first). Returns a
    long column valid for up to bits * len(cols) <= 63 total bits.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    keys = []
    for c in cols:
        bounds = sorted(set(df.stat.approxQuantile(c, probs, 1.0 / (4 * n_buckets))))
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(c).cast("double")
        keys.append(
            F.coalesce(
                F.size(F.filter(barr, lambda b: v > b)), F.lit(0)
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for ci, key in enumerate(keys):
        bit_positions = range(bits)
        z = reduce(
            lambda acc, j: acc.bitwiseOR(
                F.shiftleft(
                    F.shiftright(key, j).bitwiseAND(F.lit(1)),
                    j * len(cols) + ci,
                )
            ),
            bit_positions,
            z,
        )
    return z


def cluster_by_zorder(df: DataFrame, cols: list[str], num_files: int,
                      bits: int = 8, key_col: str = "_zorder") -> DataFrame:
    """Range-partition and sort ``df`` by its Z-order key.

    The returned frame, written as-is (one file per partition), yields
    files whose footer min/max are tight on EVERY column in ``cols`` —
    feed it to SnapshotTable.append with those columns in stats_cols and
    plan_entries prunes on any of them. One range exchange (sampled
    boundaries), sort within partitions only. Note AQE may coalesce the
    range exchange when partitions are small, merging files — at real
    scale that is the right call (it only merges files below the shuffle
    target size); for guaranteed file boundaries use
    :func:`zorder_bucket_col` and a partitioned write instead.
    """
    z = zorder_key_col(df, cols, bits)
    return (
        df.withColumn(key_col, z)
        .repartitionByRange(num_files, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )


def zorder_bucket_col(df: DataFrame, cols: list[str], num_buckets: int,
                      bits: int = 8):
    """Column: a balanced bucket id (0..num_buckets-1) along the Z-curve.

    approxQuantile over the Morton key splits the curve into
    ``num_buckets`` equal-population ranges; writing with this column as
    the partition key (SnapshotTable partition_col / partitionBy) pins
    file boundaries to curve ranges EXACTLY — every file covers a
    contiguous Z-range, so footer min/max stay tight on every clustered
    column no matter how the write is tasked or coalesced.
    """
    z = zorder_key_col(df, cols, bits)
    zdf = df.select(z.alias("_z"))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(zdf.stat.approxQuantile("_z", probs, 1.0 / (4 * num_buckets))))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    zd = z.cast("double")
    return F.size(F.filter(barr, lambda b: zd > b)).cast("int")
