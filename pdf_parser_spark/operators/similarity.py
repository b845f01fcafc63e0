"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (pure native expressions —
zip_with/aggregate dot products, no Python in the hot path), and a
random-hyperplane LSH bucketed variant as the scale path (signature via a
seeded, deterministic projection; candidate generation by bucket equi-join).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def with_cosine_to(embeddings: DataFrame, query_vec: list[float],
                   vec_col: str = "embedding") -> DataFrame:
    """cosine(row, query) as a native column (JVM-side, codegen)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot(F.col(vec_col).cast("array<double>"), q) / (
        _norm(F.col(vec_col).cast("array<double>")) * F.lit(qnorm)
    )
    return embeddings.withColumn("cosine", cos)


def cosine_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_vec: list | None = None) -> DataFrame:
    """Exact top-k by cosine to the query row (excluded), deterministic ties.

    ``query_vec`` skips the collect when the caller already holds the
    query's vector: the ANN wrappers pass ``embeddings`` as a candidate
    FRAME whose lineage includes the whole bucket/cluster chain, and
    collecting the query row out of it re-runs that chain once more."""
    if query_vec is None:
        qrow = embeddings.filter(F.col(id_col) == query_id).select(vec_col).collect()
        if not qrow:
            return embeddings.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
        query_vec = [float(x) for x in qrow[0][0]]
    return (
        with_cosine_to(embeddings, query_vec, vec_col)
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the 10^12-scale path
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)  # fixed seed ⇒ same planes on every executor
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_table(embeddings: DataFrame, dim: int, n_planes: int = 16,
                     seed: int = 42, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — sign-pattern bucket of each vector."""
    planes = _planes(dim, n_planes, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (mat @ planes.T) > 0  # (n, planes)
            buckets = signs.dot(1 << np.arange(n_planes)).astype("int64")
            yield pd.DataFrame({id_col: pdf[id_col].values, "bucket": buckets})

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"`{id_col}` long, bucket long"
    )


def cosine_near_duplicates(embeddings: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           max_rows: int = 1_000_000) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (a < b, cosine >= threshold).

    Broadcast nested loop with a vectorized kernel: the full matrix (one
    broadcast, n x dim float64 — fine up to ~10^6 vectors) ships to every
    executor; each Arrow batch of the distributed side computes one
    `A_batch @ B.T` matmul and emits its qualifying pairs. This replaces a
    2M-row cross join evaluating interpreted array-lambda expressions
    (~10x faster at sf0.1). O(n²) work by definition — the exact baseline;
    `cosine_near_duplicates_lsh` is the 10^12-scale path, and the hard
    `max_rows` guard below refuses to collect an unbounded table to the
    driver (fail fast instead of OOM-ing a 100 TB job).
    """
    pdf = embeddings.select(id_col, vec_col).limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"cosine_near_duplicates is the exact (driver-collected) baseline, "
            f"capped at {max_rows} vectors; use cosine_near_duplicates_lsh for "
            f"larger tables"
        )
    b_ids = pdf[id_col].to_numpy()
    b_mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
    # zero-norm guard (failed embedder / padding rows): dividing by 0 makes
    # every comparison with that row NaN — silently unreported pairs. A
    # unit divisor leaves the zero vector at cosine 0 to everything, the
    # same guard the semdedup/PQ kernels use.
    _nb = np.linalg.norm(b_mat, axis=1, keepdims=True)
    b_mat = b_mat / np.where(_nb == 0.0, 1.0, _nb)
    bc = embeddings.sparkSession.sparkContext.broadcast((b_ids, b_mat))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b = bc.value
        for batch in batches:
            a_ids = batch[id_col].to_numpy()
            a_mat = np.stack(batch[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            _na = np.linalg.norm(a_mat, axis=1, keepdims=True)
            a_mat = a_mat / np.where(_na == 0.0, 1.0, _na)
            sims = np.round(a_mat @ mat_b.T, 6)
            out_a, out_b, out_c = [], [], []
            for i, aid in enumerate(a_ids):
                mask = (ids_b > aid) & (sims[i] >= threshold)
                hits = np.nonzero(mask)[0]
                out_a.extend([int(aid)] * len(hits))
                out_b.extend(int(x) for x in ids_b[hits])
                out_c.extend(float(x) for x in sims[i][hits])
            yield pd.DataFrame({"a_id": out_a, "b_id": out_b, "cosine": out_c})

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema="a_id long, b_id long, cosine double"
    )


def cosine_near_duplicates_lsh(embeddings: DataFrame, threshold: float = 0.95,
                               dim: int = 64, n_planes: int = 8, seed: int = 42,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               n_tables: int = 3) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates share a hyperplane bucket in
    at least one of ``n_tables`` independent tables (OR-amplification).

    Per table, P[same bucket] = (1 - θ/π)^n_planes; over R tables recall is
    1 - (1 - p)^R — the same AND/OR construction as MinHash banding, so
    recall is tuned without coarsening any single table. Every emitted pair
    is exact-verified, so precision is 1.0 regardless. Candidate generation
    is an equi-join on (table, bucket): O(n·R) shuffled rows, never the
    O(n²) cross product.

    All R tables' buckets come from ONE pass over the embeddings: the R
    plane sets concatenate into a single (R·n_planes, dim) matrix, so each
    Arrow batch pays one transfer and one matmul and emits (id, table,
    bucket) rows for every table. The previous per-table union ran the
    bucket UDF R times per join side (R separate Arrow transfers of the
    full vector column); bucket values are identical — each table still
    uses its own seeded planes.
    """
    plane_sets = np.concatenate(
        [_planes(dim, n_planes, seed + 1009 * t) for t in range(n_tables)]
    )  # (R * n_planes, dim)
    weights = 1 << np.arange(n_planes)

    def bucket_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (mat @ plane_sets.T) > 0  # (n, R * planes)
            bucket_mat = signs.reshape(len(mat), n_tables, n_planes).dot(weights)
            ids = pdf[id_col].values
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "table": np.tile(np.arange(n_tables, dtype="int32"), len(ids)),
                    "bucket": bucket_mat.astype("int64").ravel(),
                }
            )

    buckets = embeddings.select(id_col, vec_col).mapInPandas(
        bucket_all, schema=f"`{id_col}` long, table int, bucket long"
    )
    a = buckets.select(F.col("table"), F.col("bucket"), F.col(id_col).alias("a_id"))
    b = buckets.select(F.col("table"), F.col("bucket"), F.col(id_col).alias("b_id"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    v = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_n"),
    )
    cos = _dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n"))
    return (
        cand.join(
            v.select(F.col(id_col).alias("a_id"), F.col("_v").alias("a_v"),
                     F.col("_n").alias("a_n")),
            "a_id",
        )
        .join(
            v.select(F.col(id_col).alias("b_id"), F.col("_v").alias("b_v"),
                     F.col("_n").alias("b_n")),
            "b_id",
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + cluster-probe search
# ---------------------------------------------------------------------------


def _seeded_centroids(dim: int, k: int, seed: int) -> "np.ndarray":
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(embeddings: DataFrame, centroids: "np.ndarray",
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster): nearest centroid by cosine, one matmul per batch.

    The id column keeps the caller's name so downstream joins on id_col work
    for any id column, not just the default 'vec_id'."""
    bc = embeddings.sparkSession.sparkContext.broadcast(centroids)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for batch in batches:
            mat = np.stack(batch[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            # zero-norm guard: an all-NaN score row would argmax to cluster
            # 0, silently piling every degenerate vector there and dragging
            # its centroid toward zero
            _n = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(_n == 0.0, 1.0, _n)
            yield pd.DataFrame(
                {id_col: batch[id_col].values, "cluster": (mat @ cents.T).argmax(axis=1)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"`{id_col}` long, cluster int"
    )


def ivf_train(embeddings: DataFrame, n_centroids: int = 16, dim: int = 64,
              iters: int = 3, seed: int = 42, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "np.ndarray":
    """Deterministic distributed Lloyd iterations (the iterative-algorithm
    shape SQL can't express — hence the IVF queries are rows-only).

    Each round: assignment is a broadcast matmul map; the update is a native
    posexplode → groupBy(cluster, dim) → avg (map-side combinable — only
    k x dim aggregate rows ever reach the driver). Empty clusters keep their
    previous centroid, so the result is a pure function of (data, seed).
    """
    cents = _seeded_centroids(dim, n_centroids, seed)
    for _ in range(iters):
        assigned = ivf_assign(embeddings, cents, id_col, vec_col)
        sums = (
            embeddings.join(assigned, id_col)
            .select("cluster", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("mean"))
            .collect()
        )
        new = cents.copy()
        seen = set()
        for r in sums:
            new[r["cluster"], r["pos"]] = r["mean"]
            seen.add(r["cluster"])
        for c in seen:
            n = np.linalg.norm(new[c])
            if n > 0:
                new[c] = new[c] / n
        cents = new
    return cents


def ann_topk_ivf(embeddings: DataFrame, query_id: int, k: int = 10, dim: int = 64,
                 n_centroids: int = 16, n_probe: int = 4, iters: int = 3,
                 seed: int = 42, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF search: probe the n_probe nearest clusters, exact re-rank inside.

    At 10^12 scale the cluster table is bucket-partitioned by `cluster`, so a
    probe reads n_probe/n_centroids of the data (partition pruning), versus
    LSH's hash-bucket equi-join — the two standard ANN layouts.
    """
    cents = ivf_train(embeddings, n_centroids, dim, iters, seed, id_col, vec_col)
    qrow = embeddings.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not qrow:
        return embeddings.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    q = np.asarray([float(x) for x in qrow[0][0]], dtype=np.float64)
    q = q / np.linalg.norm(q)
    probe = [int(c) for c in (cents @ q).argsort()[::-1][:n_probe]]
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    cand_ids = assigned.filter(F.col("cluster").isin(probe)).select(
        F.col(id_col).alias("_cand_id")
    )
    cands = embeddings.join(cand_ids, embeddings[id_col] == cand_ids["_cand_id"], "left_semi")
    # q is already in hand (collected above, pre-normalization copy below):
    # letting cosine_topk re-collect it would re-run the assign chain
    return cosine_topk(cands, query_id, k, id_col, vec_col,
                       query_vec=[float(x) for x in qrow[0][0]])


def _multiprobe_buckets(q_bucket: int, n_planes: int, multiprobe: int) -> list[int]:
    """All bucket codes within hamming ≤ multiprobe of the query's bucket."""
    from itertools import combinations

    probes = [q_bucket]
    for m in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), m):
            mask = 0
            for b in bits:
                mask |= 1 << b
            probes.append(q_bucket ^ mask)
    return probes


def ann_topk_lsh(embeddings: DataFrame, query_id: int, k: int = 10, dim: int = 64,
                 n_planes: int = 8, seed: int = 42, id_col: str = "vec_id",
                 vec_col: str = "embedding", multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: candidates from the query's bucket, exact cosine
    re-rank on the candidate set only. At scale the bucket join replaces the
    full scan; recall is tuned by n_planes (fewer planes → bigger buckets)
    and by `multiprobe` (also probe buckets whose sign pattern differs from
    the query's in ≤ multiprobe planes — the standard multi-probe LSH trick:
    a true neighbour near a hyperplane lands one sign flip away, so probing
    the 1-flip shell recovers most of the recall a single bucket loses,
    without coarsening the whole table). Probed bucket count is
    sum_{m<=multiprobe} C(n_planes, m) — tiny; candidates stay
    O(n/2^n_planes) per probe."""
    buckets = lsh_bucket_table(embeddings, dim, n_planes, seed, id_col, vec_col)
    qrow = buckets.filter(F.col(id_col) == query_id).select("bucket").collect()
    if not qrow:
        return embeddings.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    probes = _multiprobe_buckets(int(qrow[0][0]), n_planes, multiprobe)
    cand_ids = buckets.filter(F.col("bucket").isin(probes)).select(
        F.col(id_col).alias("_cand_id")
    )
    cands = embeddings.join(cand_ids, embeddings[id_col] == cand_ids["_cand_id"], "left_semi")
    # fetch the query vector from the BASE table (narrow scan) — collecting
    # it through `cands` would re-run the full-corpus bucket UDF once more
    qvec = embeddings.filter(F.col(id_col) == query_id).select(vec_col).collect()
    return cosine_topk(cands, query_id, k, id_col, vec_col,
                       query_vec=[float(x) for x in qvec[0][0]])


def semdedup(embeddings: DataFrame, threshold: float = 0.92,
             n_centroids: int = 16, dim: int = 64, iters: int = 3,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             max_cluster_rows: int = 100_000) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public methodology):
    k-means-cluster the embeddings, then deduplicate WITHIN each cluster;
    cross-cluster near-dups are intentionally never compared (that is the
    algorithm's recall-for-cost trade, not a shortcut here).

    Keep rule inside a cluster: deterministic greedy maximal independent
    set in ascending id order — a vector is dropped iff its cosine to an
    already-KEPT vector is >= threshold, so exactly one representative
    per semantic group survives and reruns/repartitionings agree.
    Returns (id_col, cluster, keep).

    Scale shape: centroids come from the distributed Lloyd trainer
    (ivf_train — only k x dim aggregate rows reach the driver), assignment
    is the broadcast-matmul map (ivf_assign), and the dedup pass is ONE
    applyInPandas exchange keyed by cluster. The kernel avoids the |C|²
    similarity matrix: each row takes one vectorized dot against the
    kept-set matrix (O(|C|·kept) memory). The paper sizes k ~ sqrt(n)
    (50k clusters for 5B embeddings) so clusters stay bounded;
    max_cluster_rows raises loudly instead of silently OOMing — resize
    n_centroids rather than lifting the guard.
    """
    cents = ivf_train(embeddings, n_centroids, dim, iters, seed, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    joined = embeddings.select(id_col, vec_col).join(assigned, id_col)

    def dedupe_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster {int(pdf['cluster'].iloc[0])} has "
                f"{len(pdf)} rows > max_cluster_rows={max_cluster_rows}; "
                "increase n_centroids"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mat = mat / norms
        kept_rows: list[int] = []
        keep = np.zeros(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            if kept_rows and (mat[kept_rows] @ mat[i] >= threshold).any():
                continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "cluster": pdf["cluster"].values,
                "keep": keep,
            }
        )

    return joined.groupBy("cluster").applyInPandas(
        dedupe_cluster, schema=f"`{id_col}` long, cluster int, keep boolean"
    )


# --- product quantization (PQ) ------------------------------------------------


def pq_train(embeddings: DataFrame, m: int = 8, n_codes: int = 16,
             dim: int = 64, iters: int = 3, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> "np.ndarray":
    """Per-subspace codebooks (m, n_codes, dim/m) — Jégou et al. 2011
    product quantization (public methodology): split the (normalized)
    vector into m subvectors, k-means each subspace independently, so m
    one-byte-ish codes replace dim floats.

    The distributed Lloyd shape improves on ivf_train's join+explode
    update: each round is ONE Arrow pass that assigns codes AND
    accumulates per-(subspace, code) vector sums with np.add.at inside
    the batch, emitting at most m * n_codes * dim/m partial rows per
    batch — so the exchange carries codebook-sized partials, never
    per-row data, and nothing joins back on the id. Deterministic
    (seeded init, empty codes keep their previous centroid).
    """
    if dim % m != 0:
        raise ValueError("dim must divide evenly into m subspaces")
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m, n_codes, d_sub))

    def partials(books_bc):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            B = books_bc.value  # (m, k, d_sub)
            acc = np.zeros((m, n_codes, d_sub))
            cnt = np.zeros((m, n_codes), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
                sub = mat.reshape(len(mat), m, d_sub)  # (n, m, d_sub)
                # ||x - c||^2 argmin == (||c||^2 - 2 x.c) argmin
                ip = np.einsum("nmd,mkd->nmk", sub, B)
                dist = (B * B).sum(axis=2)[None, :, :] - 2.0 * ip
                codes = dist.argmin(axis=2)  # (n, m)
                for s in range(m):
                    np.add.at(acc[s], codes[:, s], sub[:, s, :])
                    np.add.at(cnt[s], codes[:, s], 1)
            s_idx, c_idx = np.nonzero(cnt)
            if len(s_idx):
                yield pd.DataFrame(
                    {
                        "sub": s_idx.astype("int32"),
                        "code": c_idx.astype("int32"),
                        "vsum": list(acc[s_idx, c_idx]),
                        "cnt": cnt[s_idx, c_idx],
                    }
                )
        return run

    sc = embeddings.sparkSession.sparkContext
    for _ in range(iters):
        bc = sc.broadcast(books)
        rows = (
            embeddings.select(vec_col)
            .mapInPandas(
                partials(bc),
                schema="sub int, code int, vsum array<double>, cnt long",
            )
            .groupBy("sub", "code")
            .agg(
                F.array(
                    *[F.sum(F.element_at("vsum", i + 1)) for i in range(d_sub)]
                ).alias("vsum"),
                F.sum("cnt").alias("cnt"),
            )
            .collect()
        )
        new = books.copy()
        for r in rows:
            new[r["sub"], r["code"]] = np.asarray(r["vsum"]) / r["cnt"]
        books = new
    return books


def pq_encode(embeddings: DataFrame, books: "np.ndarray",
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>) — each vector's per-subspace code ids.

    The narrow table PQ search scans: m ints (m bytes in a real uint8
    layout) instead of dim floats — a 32-64x scan-width cut at dim=64."""
    m, _, d_sub = books.shape
    bc = embeddings.sparkSession.sparkContext.broadcast(books)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sub = mat.reshape(len(mat), m, d_sub)
            ip = np.einsum("nmd,mkd->nmk", sub, B)
            dist = (B * B).sum(axis=2)[None, :, :] - 2.0 * ip
            yield pd.DataFrame(
                {id_col: pdf[id_col].values,
                 "codes": list(dist.argmin(axis=2).astype("int32"))}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>"
    )


def ann_topk_pq(embeddings: DataFrame, query_id: int, k: int = 10,
                m: int = 8, n_codes: int = 16, dim: int = 64,
                iters: int = 3, seed: int = 42, rerank: int = 4,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """PQ search with asymmetric-distance (ADC) scan + exact re-rank.

    The query builds an (m, n_codes) inner-product lookup table once;
    the scan approximates cosine as m table lookups per CODE row (never
    touching the float vectors), keeps the top rerank*k candidates, and
    exact-cosine re-ranks only those — so precision of the returned
    ordering is 1.0 over the candidate set, recall is governed by the
    codebook resolution (asserted against brute force in tests).

    Scale shape: the ADC scan reads the codes table (m ints/row), the
    lookup is numpy fancy-indexing inside Arrow batches, TakeOrdered
    keeps rerank*k per partition before the single reduce, and the
    re-rank joins the tiny candidate set back to the wide vectors —
    the wide table is read once for encoding, then never scanned again.
    """
    books = pq_train(embeddings, m, n_codes, dim, iters, seed, id_col, vec_col)
    d_sub = dim // m
    qrow = embeddings.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not qrow:
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} long, cosine double"
        )
    q = np.asarray([float(x) for x in qrow[0][0]], dtype=np.float64)
    q = q / np.linalg.norm(q)
    table = np.einsum("md,mkd->mk", q.reshape(m, d_sub), books)  # (m, k)
    codes = pq_encode(embeddings, books, id_col, vec_col)
    bc = embeddings.sparkSession.sparkContext.broadcast(table)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = bc.value
        cols = np.arange(T.shape[0])
        for pdf in batches:
            C = np.stack(pdf["codes"].values)  # (n, m)
            approx = T[cols[None, :], C].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].values, "approx_ip": approx})

    scored = codes.mapInPandas(adc, schema=f"{id_col} long, approx_ip double")
    cand = scored.filter(F.col(id_col) != query_id).orderBy(
        F.desc("approx_ip")
    ).limit(rerank * k)
    cands = embeddings.join(
        cand.select(id_col), id_col, "left_semi"
    ).unionByName(embeddings.filter(F.col(id_col) == query_id))
    # q is already in hand: letting cosine_topk re-collect it would re-run
    # the train/encode/ADC chain once more
    return cosine_topk(cands, query_id, k, id_col, vec_col,
                       query_vec=[float(x) for x in qrow[0][0]])
