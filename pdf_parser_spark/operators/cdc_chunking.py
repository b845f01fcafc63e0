"""Content-defined chunking: rolling-hash boundaries instead of fixed
strides.

Fixed-stride chunking (operators/chunking.py) shifts every boundary when
one token is inserted upstream — identical content in two documents (or
two crawls of one page) lands in different chunks and exact chunk-level
dedup finds nothing. Content-defined chunking (the FastCDC/LBFS idea:
Muthitacharoen et al. 2001, Xia et al. 2016) cuts wherever a rolling
hash of the local bytes hits a mask, so boundaries move WITH the
content: an edit changes only the chunks it touches, and every shared
run of text re-aligns after at most one chunk. That is what makes
chunk-hash dedup across near-identical documents work.

Implementation: a gear-style rolling hash over the normalized text —
one 64-entry random-looking (but deterministically seeded) table, hash
= (hash << 1) + gear[byte], cut when ``hash & mask == 0`` with
min/max-size clamps (the standard guards against degenerate tiny/huge
chunks). Pure per-document Python (numpy-free but O(n) single pass)
wrapped in ONE mapInPandas stage — zero shuffles, embarrassingly
parallel, the same scale shape as every other extraction-side operator.

The companion ``chunk_dedup_stats`` shows the payoff: group the emitted
chunks by content hash and measure the duplicated fraction — the
storage-dedup ratio a content-addressable store would achieve.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_boundaries", "cdc_chunks", "with_cdc_chunks", "chunk_dedup_stats"]

_WS = re.compile(r"\s+")

# deterministic gear table: splitmix64 over 0..255 (public-domain mixer)
def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


_GEAR = [_splitmix64(i) for i in range(256)]


def cdc_boundaries(
    data: bytes,
    avg_size: int = 256,
    min_size: int | None = None,
    max_size: int | None = None,
) -> list[int]:
    """Cut positions (exclusive ends) over ``data``. avg_size must be a
    power of two; expected chunk length ≈ avg_size with [min, max]
    clamps (defaults avg/4 and avg*4)."""
    if avg_size < 16 or avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two >= 16")
    min_size = min_size or avg_size // 4
    max_size = max_size or avg_size * 4
    mask = avg_size - 1
    out: list[int] = []
    h = 0
    start = 0
    n = len(data)
    for i in range(n):
        h = ((h << 1) + _GEAR[data[i]]) & 0xFFFFFFFFFFFFFFFF
        length = i - start + 1
        if (length >= min_size and (h & mask) == 0) or length >= max_size:
            out.append(i + 1)
            start = i + 1
            h = 0
    if start < n:
        out.append(n)
    return out


def cdc_chunks(text: str | None, avg_size: int = 256) -> list[tuple[int, int, str]]:
    """(start, end, chunk_text) over the whitespace-normalized text.
    Deterministic: a pure function of the content, so identical content
    always yields identical chunks regardless of the document around it
    (after at most one boundary re-alignment at an edit site)."""
    s = _WS.sub(" ", (text or "")).strip()
    if not s:
        return []
    raw = s.encode("utf-8")
    cuts = cdc_boundaries(raw, avg_size=avg_size)
    out = []
    start = 0
    for end in cuts:
        # slice on the byte level, decode leniently at the seam (a cut can
        # land inside a multi-byte sequence; the seam chars re-appear in
        # the neighbor via errors="ignore" being applied symmetrically is
        # NOT guaranteed — so shift cuts to codepoint-safe positions)
        e = end
        while e < len(raw) and (raw[e] & 0xC0) == 0x80:  # continuation byte
            e += 1
        out.append((start, e, raw[start:e].decode("utf-8")))
        start = e
        if start >= len(raw):
            break
    # merge a possible empty tail produced by the shift
    return [(a, b, t) for a, b, t in out if b > a]


def with_cdc_chunks(
    docs: DataFrame,
    avg_size: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per content-defined chunk: (<id_col>, chunk_idx, start,
    end, n_bytes, chunk_hash, chunk_text). One mapInPandas stage. The id
    column keeps its own name AND type (a string url id works)."""
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    # chunk hashing happens with Spark's native xxhash64 AFTER the python
    # pass (JVM-side, vectorized) — the UDF only finds boundaries
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: dict[str, list] = {
                id_col: [], "chunk_idx": [], "start": [], "end": [],
                "chunk_text": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for i, (a, b, t) in enumerate(cdc_chunks(text, avg_size)):
                    rows[id_col].append(did)
                    rows["chunk_idx"].append(i)
                    rows["start"].append(a)
                    rows["end"].append(b)
                    rows["chunk_text"].append(t)
            yield pd.DataFrame(rows)

    out = docs.select(id_col, text_col).mapInPandas(
        gen,
        f"{id_col} {id_type}, chunk_idx int, start long, end long, chunk_text string",
    )
    return out.select(
        id_col, "chunk_idx", "start", "end",
        (F.col("end") - F.col("start")).alias("n_bytes"),
        F.xxhash64("chunk_text").alias("chunk_hash"),
        "chunk_text",
    )


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Storage-dedup payoff: one row — total chunks/bytes, distinct
    chunks/bytes, and the duplicated-byte fraction a content-addressable
    store would save. One hash exchange keyed by chunk_hash with
    map-side partials."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("copies"),
        F.first("n_bytes").alias("n_bytes"),
    )
    return per_hash.agg(
        F.sum("copies").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.col("copies") * F.col("n_bytes")).alias("total_bytes"),
        F.sum("n_bytes").alias("distinct_bytes"),
        F.round(
            1.0 - F.sum("n_bytes") / F.sum(F.col("copies") * F.col("n_bytes")), 4
        ).alias("dup_byte_frac"),
    )
