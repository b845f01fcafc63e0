"""Deterministic stratified sampling — k rows per stratum, hash-ranked.

Training-data pipelines need reproducible samples (eval slices, human
review batches, per-domain caps) that do NOT depend on row order, executor
count, or a seed store: rank rows inside each stratum by a cryptographic
hash of their id and keep the k smallest. The same corpus always yields
the same sample on any cluster size, and adding documents only perturbs
the sample locally (hash ranks are stable — a bounded form of consistent
sampling).

Scale shape: one hash projection + one row_number window per stratum key —
a single shuffle on the stratum columns; no sort of the full table beyond
the per-partition window sort. For heavily-skewed strata at 10^12 rows,
pre-filter with an approximate per-stratum hash threshold before the exact
window (not needed at bench scales; documented escape hatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep the k hash-smallest rows of every stratum.

    Rank key = md5 of the UTF-8 string form of ``id_col`` (hex compares
    lexicographically the same everywhere), tie-broken by the id itself.
    """
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    w = Window.partitionBy(*strata_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
