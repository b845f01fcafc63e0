"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data pipeline staples over the `documents` table. Design points:
- exact dedupe is a pure hash-groupBy (native md5, oracle-checkable);
- MinHash/SimHash signatures are Arrow-batched pandas UDFs built on
  deterministic digests (zlib.crc32 / blake2b — NEVER Python hash(), which is
  randomized per process) so any executor reproduces any signature;
- LSH banding turns all-pairs similarity into equi-joins on (band, hash)
  keys — candidate generation never goes quadratic; only verified candidate
  pairs pay the exact-similarity cost. This is the scale path: at 10^12 docs
  the band join shuffles O(n·bands) small keys instead of O(n²) comparisons.
"""

from __future__ import annotations

import zlib
from hashlib import blake2b
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MinHash parameters (64 permutations, 16 bands × 4 rows ⇒ catches J≳0.5)
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1
# deterministic permutation coefficients (seeded once, constants thereafter)
_AS = [(2 * i + 1) * 0x9E3779B1 % _MERSENNE for i in range(1, N_HASHES + 1)]
_BS = [(i * 0x85EBCA77 + 0x165667B1) % _MERSENNE for i in range(1, N_HASHES + 1)]


def word_shingles(text: str | None, k: int = 3) -> set[int]:
    """k-word shingles → crc32 ints (deterministic across processes)."""
    tokens = (text or "").lower().split()
    if len(tokens) < k:
        return {zlib.crc32(" ".join(tokens).encode())} if tokens else set()
    return {
        zlib.crc32(" ".join(tokens[i : i + k]).encode())
        for i in range(len(tokens) - k + 1)
    }


import numpy as _np

# permutation family for the vectorized path: multiply-add over Z/2^64
# (numpy uint64 wraparound is well-defined and identical on every executor);
# coefficients are the same deterministic constants, odd multipliers
_AS_ARR = _np.array([a | 1 for a in _AS], dtype=_np.uint64)
_BS_ARR = _np.array(_BS, dtype=_np.uint64)


def minhash_signature(text: str | None, k: int = 3) -> list[int]:
    """64 min-hashes of the shingle set, vectorized.

    (shingles, 1) x (64,) uint64 broadcast with wraparound multiply-add —
    one numpy kernel instead of shingles*64 Python-int modmuls. Signed int64
    at the end so the values survive a Spark `array<long>` column.
    """
    sh = word_shingles(text, k)
    if not sh:
        return [0] * N_HASHES
    s = _np.fromiter(sh, dtype=_np.uint32, count=len(sh)).astype(_np.uint64)[:, None]
    sig = (s * _AS_ARR + _BS_ARR).min(axis=0)
    return [int(x) for x in sig.astype(_np.int64)]


def band_hashes(sig: list[int]) -> list[int]:
    """Band the signature: 16 band-hash ints (blake2b over the band bytes)."""
    out = []
    for b in range(N_BANDS):
        chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        h = blake2b(repr(chunk).encode(), digest_size=8).digest()
        out.append(int.from_bytes(h, "big", signed=True))
    return out


def simhash64(text: str | None) -> int:
    """64-bit SimHash over whitespace tokens (weight = term frequency)."""
    tokens = (text or "").lower().split()
    if not tokens:
        return 0
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    acc = [0] * 64
    for t, w in counts.items():
        h = int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "big")
        for bit in range(64):
            acc[bit] += w if (h >> bit) & 1 else -w
    v = 0
    for bit in range(64):
        if acc[bit] > 0:
            v |= 1 << bit
    return v - (1 << 64) if v >= (1 << 63) else v  # signed int64


def jaccard(a: str | None, b: str | None, k: int = 3) -> float:
    sa, sb = word_shingles(a, k), word_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Exact dedupe by normalized-text md5: keeper = min id per group."""
    normalized = F.md5(F.lower(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")))
    return (
        docs.select(F.col(id_col).alias("doc_id"), normalized.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("group_size"),
        )
    )


def minhash_band_table(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, band, band_hash) — the LSH index table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for band, h in enumerate(band_hashes(minhash_signature(text))):
                    rows.append({"doc_id": did, "band": band, "band_hash": h})
            yield pd.DataFrame(rows, columns=["doc_id", "band", "band_hash"])

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, band int, band_hash long"
    )


def minhash_candidate_pairs(band_table: DataFrame) -> DataFrame:
    """Equi-join on (band, band_hash) → distinct candidate pairs (a < b)."""
    a = band_table.select(
        F.col("band"), F.col("band_hash"), F.col("doc_id").alias("a_id")
    )
    b = band_table.select(
        F.col("band"), F.col("band_hash"), F.col("doc_id").alias("b_id")
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, docs: DataFrame, threshold: float = 0.7,
                   id_col="doc_id", text_col="text") -> DataFrame:
    """Join candidate pairs back to texts; exact n-gram Jaccard filter."""
    texts = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    joined = (
        pairs.join(texts.withColumnRenamed("_id", "a_id").withColumnRenamed("_text", "a_text"), "a_id")
        .join(texts.withColumnRenamed("_id", "b_id").withColumnRenamed("_text", "b_text"), "b_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sim = [jaccard(a, b) for a, b in zip(pdf["a_text"], pdf["b_text"])]
            out = pdf[["a_id", "b_id"]].assign(jaccard=[round(s, 6) for s in sim])
            yield out[out["jaccard"] >= threshold]

    return joined.mapInPandas(run, schema="a_id long, b_id long, jaccard double")


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7,
                            id_col="doc_id", text_col="text") -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle→minhash→band→join→verify."""
    bands = minhash_band_table(docs, id_col, text_col)
    cands = minhash_candidate_pairs(bands)
    return verify_jaccard(cands, docs, threshold, id_col, text_col)


def simhash_table(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, simhash, 4×16-bit blocks) for hamming-LSH joins."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [simhash64(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "simhash": sigs,
                    "b0": [(s >> 0) & 0xFFFF for s in sigs],
                    "b1": [(s >> 16) & 0xFFFF for s in sigs],
                    "b2": [(s >> 32) & 0xFFFF for s in sigs],
                    "b3": [(s >> 48) & 0xFFFF for s in sigs],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, simhash long, b0 int, b1 int, b2 int, b3 int"
    )


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col="doc_id", text_col="text") -> DataFrame:
    """SimHash near-dups: any pair within hamming ≤ max_hamming shares at
    least one identical 16-bit block (pigeonhole over 4 blocks) — so the
    candidate join is 4 equi-joins, then an exact popcount filter."""
    t = simhash_table(docs, id_col, text_col).cache()
    pieces = []
    for blk in ("b0", "b1", "b2", "b3"):
        a = t.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sig"), F.col(blk).alias("k"))
        b = t.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sig"), F.col(blk).alias("k"))
        pieces.append(a.join(b, "k").filter(F.col("a_id") < F.col("b_id")).drop("k"))
    cands = pieces[0]
    for p in pieces[1:]:
        cands = cands.unionByName(p)
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
