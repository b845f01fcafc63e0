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


def lsh_plan(threshold: float, n_hashes: int = N_HASHES,
             recall_floor: float = 0.95) -> dict:
    """Pick the (bands, rows) split of an ``n_hashes`` signature for a
    target Jaccard ``threshold`` (the MMDS ch.3 S-curve — Leskovec,
    Rajaraman & Ullman; public methodology).

    A pair with Jaccard J shares at least one band with probability
    P(J) = 1 − (1 − J^rows)^bands. Among the divisor splits
    bands·rows == n_hashes, take the LARGEST rows whose P(threshold) ≥
    ``recall_floor``: larger rows steepens the curve, so this is the
    split with the fewest below-threshold candidate pairs (verify-join
    work) that still guarantees the floor at the threshold itself. If no
    split reaches the floor (tiny signatures), fall back to the max-P
    split. Returns {"bands", "rows", "p_at_threshold"}.

    The fixed module default (16×4) is exactly this plan's answer for
    thresholds in ~[0.62, 0.88]; outside that range a fixed 16×4 either
    leaks recall (0.6 ⇒ P=0.89, while 32×2 gives ≈1.0) or wastes verify
    work (0.9 ⇒ 8×8 keeps P=0.99 with ~8× sharper candidate pruning).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    splits = [
        (r, n_hashes // r, 1.0 - (1.0 - threshold ** r) ** (n_hashes // r))
        for r in range(1, n_hashes + 1)
        if n_hashes % r == 0
    ]
    ok = [s for s in splits if s[2] >= recall_floor]
    rows, bands, p = max(ok) if ok else max(splits, key=lambda s: (s[2], s[0]))
    return {"bands": bands, "rows": rows, "p_at_threshold": p}


def band_hashes(sig: list[int], bands: int = N_BANDS) -> list[int]:
    """Band the signature: ``bands`` band-hash ints (blake2b over the
    band bytes). ``bands`` must divide the signature length."""
    rows = len(sig) // bands
    if bands * rows != len(sig):
        raise ValueError(f"bands={bands} must divide signature length {len(sig)}")
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
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
    """Exact dedupe by normalized-text md5: keeper = min id per group.

    Normalization trims BEFORE collapsing internal whitespace: without the
    trim, 'foo bar\\n' and 'foo bar' fingerprint differently ('foo bar '
    vs 'foo bar') and trailing-newline scrapes — the norm in web text —
    silently leak exact duplicates."""
    normalized = F.md5(
        F.lower(
            F.trim(
                F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")
            )
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), normalized.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("group_size"),
        )
    )


def minhash_band_table(docs: DataFrame, id_col="doc_id", text_col="text",
                       bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, band_hash) — the LSH index table."""
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # empty/whitespace docs short-circuit: they all share the
                # constant [0]*64 signature, so ONE degenerate band key
                # would collect every empty doc — bands*E^2 self-join rows
                # on a single hot key (quadratic, the exact thing banding
                # exists to avoid). Empty docs are byte-identical anyway:
                # the exact-dedup path groups them.
                if not (text or "").strip():
                    continue
                for band, h in enumerate(band_hashes(minhash_signature(text), bands)):
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
            # memoize shingle sets per doc id within the batch: a hub doc
            # appearing in P candidate pairs otherwise re-shingles its full
            # text P times — verify CPU must scale with distinct docs, not
            # pairs
            cache: dict = {}

            def shingles(did, text):
                s = cache.get(did)
                if s is None:
                    s = cache[did] = word_shingles(text)
                return s

            sim = []
            for aid, bid, a, b in zip(
                pdf["a_id"], pdf["b_id"], pdf["a_text"], pdf["b_text"]
            ):
                sa, sb = shingles(aid, a), shingles(bid, b)
                if not sa and not sb:
                    sim.append(1.0)
                else:
                    inter = len(sa & sb)
                    union = len(sa | sb)
                    sim.append(inter / union if union else 0.0)
            out = pdf[["a_id", "b_id"]].assign(jaccard=[round(s, 6) for s in sim])
            yield out[out["jaccard"] >= threshold]

    return joined.mapInPandas(run, schema="a_id long, b_id long, jaccard double")


def near_duplicates_minhash(docs: DataFrame, threshold: float = 0.7,
                            id_col="doc_id", text_col="text",
                            bands: int | None = None) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle→minhash→band→join→verify.

    ``bands=None`` (default) picks the banding from the threshold via
    lsh_plan, so candidate recall tracks the threshold the exact verify
    enforces instead of being pinned to the 16×4 ≈-0.5-knee curve: a
    0.6 threshold gets 32×2 (16×4 would silently leak ~11% of true
    pairs), a 0.9 threshold gets 8×8 (same guaranteed recall, far fewer
    below-threshold candidates through the verify join). Pass an
    explicit divisor of 64 to pin it (e.g. to match a persisted index)."""
    if bands is None:
        bands = lsh_plan(threshold)["bands"]
    band_tbl = minhash_band_table(docs, id_col, text_col, bands)
    cands = minhash_candidate_pairs(band_tbl)
    return verify_jaccard(cands, docs, threshold, id_col, text_col)


def simhash_table(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, simhash) — the signature table; banding happens natively."""
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "simhash": [simhash64(t) for t in pdf[text_col]],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, simhash long"
    )


def _block_bounds(n_blocks: int, n_bits: int = 64) -> list[tuple[int, int]]:
    """Split n_bits into n_blocks contiguous (start, width) runs, widths
    differing by at most 1 (e.g. 9 blocks of 64 → 8,7,7,7,7,7,7,7,7)."""
    base, extra = divmod(n_bits, n_blocks)
    bounds, start = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        bounds.append((start, w))
        start += w
    return bounds


def _simhash_band_keys(sig_table: DataFrame, max_hamming: int,
                       n_blocks: int | None = None) -> DataFrame:
    """(doc_id, simhash, band, band_val) — AND-of-block-combinations keys.

    The 64 bits are split into ``n_blocks`` (default max_hamming+1)
    contiguous blocks and every combination of ``n_blocks - max_hamming``
    blocks is packed into one 64-bit band key. Pigeonhole: max_hamming
    flipped bits touch at most max_hamming blocks, so at least
    n_blocks - max_hamming blocks agree — and those agreeing blocks contain
    at least one full combination, whose packed key both docs share.
    Recall is therefore exactly 1.0 for ANY n_blocks > max_hamming.

    n_blocks trades key width against keys-per-doc: the default (k=1 block
    per key, max_hamming+1 keys/doc) is cheapest but at max_hamming=8 its
    ~7-bit keys hash the whole corpus into ~2^7 buckets — near-quadratic
    candidates at web scale. Raising n_blocks to max_hamming+2 doubles the
    key width (2-block ~13-bit keys, C(10,2)=45 keys/doc at h=8): ~64x
    fewer collisions per bucket for 5x more band rows, the right trade
    at 10^12 docs (candidate sub-quadraticity asserted in
    tests/test_trainingdata_ops.py).
    """
    from itertools import combinations

    nb = n_blocks if n_blocks is not None else max_hamming + 1
    if nb <= max_hamming:
        raise ValueError(
            f"n_blocks={nb} cannot pigeonhole max_hamming={max_hamming}: "
            f"need n_blocks > max_hamming"
        )
    if nb > 64:
        raise ValueError("n_blocks > 64 leaves empty blocks (64-bit simhash)")
    k = nb - max_hamming
    bounds = _block_bounds(nb)
    block_cols = [
        F.shiftrightunsigned(F.col("simhash"), start).bitwiseAND(
            # width == 64 (n_blocks=1, i.e. max_hamming=0 exact match):
            # (1<<64)-1 overflows the int64 literal — all-ones is -1 in
            # two's complement
            F.lit((1 << width) - 1 if width < 64 else -1).cast("long")
        )
        for start, width in bounds
    ]
    # pack each k-combination into one long: blocks partition 64 bits, so
    # any subset fits; shift-accumulate in combination order
    combo_cols = []
    for combo in combinations(range(nb), k):
        key, shift = F.lit(0).cast("long"), 0
        for bi in combo:
            key = key.bitwiseOR(F.shiftleft(block_cols[bi], shift))
            shift += bounds[bi][1]
        combo_cols.append(key)
    return sig_table.select(
        F.col("doc_id"),
        F.col("simhash"),
        F.posexplode(F.array(*combo_cols)).alias("band", "band_val"),
    )


def simhash_candidates(sig_table: DataFrame, max_hamming: int,
                       n_blocks: int | None = None) -> DataFrame:
    """Distinct candidate pairs (a_id, b_id, a_sig, b_sig) from the band join."""
    bands = _simhash_band_keys(sig_table, max_hamming, n_blocks)
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sig"),
        "band", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sig"),
        "band", "band_val",
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col="doc_id", text_col="text",
                            n_blocks: int | None = None) -> DataFrame:
    """SimHash near-dups with a SOUND pigeonhole (see _simhash_band_keys):
    candidate generation is ONE equi-join on packed (band, band_val) keys
    after a posexplode (O(n·keys) shuffled rows, never all-pairs), then an
    exact popcount filter. Recall is exactly 1.0 by construction
    (brute-force parity asserted in tests/test_trainingdata_ops.py). For
    max_hamming ≥ 4 pass n_blocks ≥ max_hamming+2 so the join keys stay
    wide enough for web-scale corpora.
    """
    t = simhash_table(docs, id_col, text_col)
    return (
        simhash_candidates(t, max_hamming, n_blocks)
        .withColumn("hamming", F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def duplicate_passage_stats(docs: DataFrame, k: int = 8, min_docs: int = 2,
                            id_col: str = "doc_id", text_col: str = "text",
                            hash_grams: bool = True) -> DataFrame:
    """Per-document duplicated-passage level: the fraction of a document's
    DISTINCT k-word grams that also occur in >= min_docs distinct documents.

    Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — public methodology) removes passages
    repeated across a corpus; in the fixed-k formulation the suffix-array
    machinery reduces to counting, per k-gram, how many documents contain
    it. This operator reports that as per-doc gating stats:
    (doc_id, n_grams, n_dup_grams, dup_frac).

    Scale shape — this is the one dedup operator that MUST shuffle the
    corpus by gram: corpus-internal duplication is a self-aggregation, so
    unlike decontamination there is no small side to broadcast. Mitigations:
    - grams are row-local and per-doc DISTINCT before the exchange (a doc
      repeating its own boilerplate contributes each gram once);
    - with hash_grams=True the exchange carries xxhash64 keys (8 bytes)
      instead of raw k-word strings — ~10x narrower shuffles at k=8. A
      collision needs two distinct grams on one 64-bit key: any FIXED pair
      collides w.p. 2⁻⁶⁴, so expect ~n_grams²/2⁶⁵ collisions corpus-wide —
      at 10^12 grams that is ~2.7×10⁴ miscounted grams out of 10^12
      (a 3×10⁻⁸ relative error, negligible for a ≥min_docs gate;
      deterministic either way);
    - (gram, doc) rows are already distinct, so docs-per-gram is a plain
      count(*) hash aggregate — map-side partials absorb Zipfian grams;
    - the duplicated-gram table (count >= min_docs) is far smaller than the
      gram table on web text (most grams are unique) and sort-merge-joins
      back on the same gram key — AQE reuses the exchange partitioning.
    """
    from pdf_parser_spark.operators.decontam import with_kgrams

    # three plan branches read the gram stream (dup counts, the join
    # back, per-doc totals): persist the NARROW exploded table — 16
    # bytes/row hashed vs the fat per-doc gram arrays — so gram
    # construction runs once per action (the r01 barrier pattern; spills
    # to disk at scale). The cache lives until LRU eviction / session end:
    # the returned DataFrame still references it, so there is no safe
    # unpersist point inside this function.
    exploded = with_kgrams(docs, k, text_col, id_col).select(
        "doc_id", F.explode("_grams").alias("gram")
    )
    if hash_grams:
        exploded = exploded.select("doc_id", F.xxhash64("gram").alias("gram"))
    exploded = exploded.persist()
    dup_grams = (
        exploded.groupBy("gram")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    matched = (
        exploded.join(dup_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_grams"))
    )
    # per-doc totals from the SAME cached table (grams are distinct per
    # doc); docs whose text is too short for any gram zero-fill from the
    # raw id column — a cheap pruned scan
    totals = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            exploded.groupBy("doc_id").agg(F.count("*").alias("n_grams")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        )
    )
    out = totals.join(matched, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias("n_dup_grams"),
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_dup_grams") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id", "n_grams", "n_dup_grams", F.round(frac, 4).alias("dup_frac")
    )


def passage_dedup(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text",
                  hash_passages: bool = True) -> DataFrame:
    """C4-style exact passage dedup WITH document reassembly.

    Split each document into NON-overlapping k-word passages; across the
    whole corpus keep only the FIRST occurrence of each distinct passage
    (first = smallest (doc, position)); rebuild every document from its
    surviving passages. This is the removal counterpart of
    :func:`duplicate_passage_stats` — the C4/"Deduplicating Training Data"
    fixed-span formulation (Raffel et al. 2020 dedup three-sentence spans;
    Lee et al. 2022 remove repeated substrings — public methodology), where
    the suffix-array machinery reduces to a first-occurrence argmin per
    distinct passage.

    Returns (doc_id, dedup_text, n_passages, n_kept) — one row per input
    document; a document whose every passage occurred earlier comes back
    with dedup_text='' (C4 semantics: spans are removed, documents remain).

    Scale shape (the corpus MUST shuffle by passage — corpus-internal
    duplication has no small side to broadcast):
    - passages are built row-local (split + slice inside codegen, one
      Generate), so the only wide edges are the dedup exchange and the
      reassembly exchange;
    - the dedup aggregate is min(struct(doc, idx, passage)) keyed by the
      passage (xxhash64-narrowed when hash_passages=True — 8-byte shuffle
      keys, same collision budget as duplicate_passage_stats): a map-side
      partial keeps ONE candidate struct per key per mapper, so Zipfian
      boilerplate passages collapse before the exchange;
    - reassembly is one groupBy(doc_id) over the SURVIVORS only (on web
      text most passages are unique, so this input is ≤ the corpus, and
      each group is ≤ the original document);
    - the final stitch joins survivors back to the per-doc totals on
      doc_id — AQE broadcasts or reuses the reassembly partitioning.
    """
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws")).select(
        "doc_id",
        "_ws",
        F.when(F.size("_ws") > 0, F.floor((F.size("_ws") - 1) / k) + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_passages"),
    )
    chunks = base.filter(F.col("n_passages") > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_passages") - 1).cast("int")),
                lambda i: F.array_join(F.slice("_ws", i * k + 1, k), " "),
            )
        ).alias("idx", "passage"),
    )
    key = F.xxhash64("passage") if hash_passages else F.col("passage")
    firsts = (
        chunks.groupBy(key.alias("_pk"))
        .agg(F.min(F.struct("doc_id", "idx", "passage")).alias("_f"))
        .select(
            F.col("_f.doc_id").alias("doc_id"),
            F.col("_f.idx").alias("idx"),
            F.col("_f.passage").alias("passage"),
        )
    )
    kept = (
        firsts.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "passage"))).alias("_ps"))
        .select(
            "doc_id",
            F.array_join(
                F.transform("_ps", lambda p: p["passage"]), " "
            ).alias("dedup_text"),
            F.size("_ps").cast("long").alias("n_kept"),
        )
    )
    return (
        base.select("doc_id", "n_passages")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def span_dedup(docs: DataFrame, k: int = 16, id_col: str = "doc_id",
               text_col: str = "text", hash_grams: bool = True) -> DataFrame:
    """ExactSubstr-style dedup: remove every NON-FIRST occurrence of any
    duplicated word span of length >= k, at word-position resolution.

    The sliding-window counterpart of :func:`passage_dedup` (which tiles).
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better" — public methodology) build a suffix array to find substrings
    of >= 50 tokens that occur twice anywhere in the corpus and cut all
    but one occurrence. At fixed word granularity the suffix-array
    machinery reduces to anchor grams: a span of >= k words is duplicated
    iff every one of its sliding k-grams is duplicated, so marking the
    duplicated gram START positions and merging overlapping [p, p+k)
    windows recovers exactly the maximal duplicated spans.

    Retention is globally deterministic: each duplicated gram keeps its
    min (doc_id, position) occurrence (the same argmin contract as
    passage_dedup), every other occurrence's window is cut. Within-doc
    repeats count — a doc that repeats its own boilerplate keeps the
    first copy only.

    Returns (doc_id, dedup_text, n_tokens, n_removed) — one row per input
    document; dedup_text is whitespace-normalized (single spaces), like
    passage_dedup.

    Scale shape — one gram-keyed exchange plus one doc-keyed exchange:
    - grams are built row-local in codegen (one Generate, 24-byte rows
      when hash_grams=True; the stream is k x larger than the tiled
      passage stream — the price of position resolution);
    - the duplicated-gram argmin is a min(struct) hash aggregate with
      map-side partials (Zipfian boilerplate collapses per mapper);
    - on web text most grams are unique, so the dup table that joins back
      is far smaller than the gram stream and reuses its partitioning;
    - interval merge and text stitching are row-local higher-order
      functions (F.aggregate) — no window over the corpus, no Python.
    """
    from pdf_parser_spark.operators.parallelism import ensure_parallelism

    docs = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws")).persist()

    wcol = F.col("_ws")
    gram_at = (
        (lambda i: F.xxhash64(F.array_join(F.slice(wcol, i, k), " ")))
        if hash_grams
        else (lambda i: F.array_join(F.slice(wcol, i, k), " "))
    )
    grams = base.filter(F.size(wcol) >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(1), F.size(wcol) - (k - 1)), gram_at)
        ).alias("_zp", "gram"),
    ).select("doc_id", (F.col("_zp") + 1).alias("pos"), "gram").persist()

    dups = (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("_n"),
            F.min(F.struct("doc_id", "pos")).alias("_first"),
        )
        .filter(F.col("_n") >= 2)
        .select("gram", "_first")
    )
    removals = (
        grams.join(dups, "gram")
        .filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("pos") != F.col("_first.pos"))
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("_ps"))
    )

    # row-local interval merge + stitch: fold the sorted duplicated start
    # positions with a (cursor, kept-intervals, removed-count) accumulator;
    # cursor = first not-yet-emitted 1-based word index. The fold collects
    # (start, len) INTERVAL structs and the text is sliced+joined ONCE in
    # finish — accumulating the output string itself would re-copy the
    # whole accumulated document on every removal position (quadratic in
    # removals × doc length; a boilerplate-heavy 200k-word doc turned into
    # a multi-minute straggler).
    acc0 = F.struct(
        F.lit(1).alias("cur"),
        F.array().cast("array<struct<s:int,l:int>>").alias("keeps"),
        F.lit(0).alias("rm"),
    )

    def step(acc, p):
        keeps = F.when(
            p > acc["cur"],
            F.array_append(
                acc["keeps"],
                F.struct(
                    acc["cur"].alias("s"), (p - acc["cur"]).alias("l")
                ),
            ),
        ).otherwise(acc["keeps"])
        new_cur = F.greatest(acc["cur"], p + k)
        rm = acc["rm"] + (new_cur - F.greatest(acc["cur"], p))
        return F.struct(new_cur.alias("cur"), keeps.alias("keeps"), rm.alias("rm"))

    def finish(acc):
        keeps = F.when(
            F.size(wcol) >= acc["cur"],
            F.array_append(
                acc["keeps"],
                F.struct(
                    acc["cur"].alias("s"),
                    (F.size(wcol) - acc["cur"] + 1).alias("l"),
                ),
            ),
        ).otherwise(acc["keeps"])
        text = F.array_join(
            F.flatten(F.transform(keeps, lambda kp: F.slice(wcol, kp["s"], kp["l"]))),
            " ",
        )
        return F.struct(text.alias("text"), acc["rm"].alias("rm"))

    stitched = (
        base.join(removals, "doc_id", "left")
        .withColumn(
            "_r",
            F.aggregate(
                F.coalesce(F.col("_ps"), F.array().cast("array<int>")),
                acc0,
                step,
                finish,
            ),
        )
        .select(
            "doc_id",
            F.col("_r.text").alias("dedup_text"),
            F.size(wcol).cast("long").alias("n_tokens"),
            F.col("_r.rm").cast("long").alias("n_removed"),
        )
    )
    return stitched
