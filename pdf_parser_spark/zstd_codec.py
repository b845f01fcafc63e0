"""From-scratch Zstandard codec (RFC 8878) — decode full, encode subset.

A web-scale crawl engine meets zstd in two places: ``.warc.zst`` archives
(the IIPC-standard successor to per-record-gzip WARC) and HTTP payloads
with ``Content-Encoding: zstd`` (RFC 9659). This module implements the
format from the public spec alone:

- DECODER: complete RFC 8878 frame decoding — raw/RLE/compressed blocks,
  Huffman-coded literals (direct 4-bit weights AND FSE-compressed weights,
  1-stream and 4-stream variants, treeless reuse), sequences in all four
  table modes (predefined / RLE / FSE-compressed / repeat), the three-slot
  repeat-offset history with the literals-length-0 quirk, sliding-window
  back-references, skippable frames, XXH64 content checksums, and raw
  (content-only) dictionaries.
- ENCODER (tests/fixtures — the decoder's round-trip oracle when the real
  library is absent): raw and RLE blocks plus genuinely compressed blocks
  — greedy hash-chain LZ77, Huffman-compressed literals with direct-weight
  headers, and sequences coded with the spec's predefined FSE tables via a
  real FSE encoder (reverse-order state interleaving per §4.1).
- ENGINE DISPATCH: like pdf_layout's alt-engine pattern, `decompress()`
  prefers the system ``libzstd`` through ctypes when loadable (the 100 TB
  hot path should run native) and falls back to the pure-Python decoder;
  tests pin the pure path and also cross-verify both against each other.

No third-party imports; ctypes use is optional and gated. The pure
decoder is the reference implementation; the native path is an
optimization with identical observable behavior.

Reference provenance: the reference repo (acstumler/pdf_parser) has no
compression layer at all — this module exists for the crawl-archive
source (sources/warc.py), which SURVEY §2 row A1 maps to the pages table.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from collections.abc import Iterator

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F
DICT_MAGIC = 0xEC30A437

_BLOCK_MAX = 128 << 10


class ZstdError(ValueError):
    """Malformed or unsupported zstd stream."""


# =====================================================================
# XXH64 (needed for the optional content checksum; public algorithm)
# =====================================================================

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — zstd's Content_Checksum is its low 32 bits."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        lim = n - 32
        while pos <= lim:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1 = _round(v1, a)
            v2 = _round(v2, b)
            v3 = _round(v3, c)
            v4 = _round(v4, d)
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# =====================================================================
# Bit I/O
# =====================================================================


class _BackBits:
    """RFC 8878 backward bitstream: written LSB-first forward, read from
    the end. The last byte's highest set bit is a sentinel marking the
    write position; reads return the most-recently-written bits first."""

    __slots__ = ("val", "avail")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("bitstream has no sentinel bit")
        self.val = int.from_bytes(data, "little")
        # drop the sentinel: total usable bits
        self.avail = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.avail:
            raise ZstdError("bitstream underrun")
        self.avail -= n
        return (self.val >> self.avail) & ((1 << n) - 1)

    def read_padded(self, n: int) -> int:
        """Read n bits, zero-filling past the start (FSE tail flushes)."""
        if n == 0:
            return 0
        if n <= self.avail:
            return self.read(n)
        short = n - self.avail
        out = (self.val & ((1 << self.avail) - 1)) << short
        self.avail = 0
        return out


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions, §4.1.1)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def peek(self, n: int) -> int:
        byte0 = self.pos >> 3
        chunk = self.data[byte0 : byte0 + ((self.pos & 7) + n + 7) // 8]
        v = int.from_bytes(chunk, "little") >> (self.pos & 7)
        return v & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BitWriter:
    """Forward LSB-first accumulator; `close()` adds the sentinel bit and
    byte-pads, producing a valid backward bitstream for _BackBits."""

    __slots__ = ("val", "nbits")

    def __init__(self):
        self.val = 0
        self.nbits = 0

    def add(self, value: int, n: int) -> None:
        if n:
            self.val |= (value & ((1 << n) - 1)) << self.nbits
            self.nbits += n

    def close(self) -> bytes:
        self.val |= 1 << self.nbits  # sentinel
        self.nbits += 1
        return self.val.to_bytes((self.nbits + 7) >> 3, "little")


# =====================================================================
# FSE — table description, decode tables, encode tables (§4.1)
# =====================================================================


def read_fse_ncount(
    data: bytes, max_symbol: int, max_accuracy: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description → (normalized counts, accuracy_log,
    bytes consumed). Counts use -1 for 'less than 1' probabilities."""
    bits = _FwdBits(data)
    accuracy = bits.read(4) + 5
    if accuracy > max_accuracy:
        raise ZstdError(f"FSE accuracy {accuracy} > max {max_accuracy}")
    table_size = 1 << accuracy
    remaining = table_size + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbol:
        if prev_zero:
            rep = bits.read(2)
            while rep == 3:
                counts.extend([0, 0, 0])
                rep = bits.read(2)
            counts.extend([0] * rep)
            prev_zero = False
            if len(counts) > max_symbol + 1:
                raise ZstdError("FSE zero-repeat overflow")
            continue
        # threshold-coded value in [0, remaining], stored as count+1:
        # values below `max_small` fit in nb-1 bits (FSE_readNCount shape)
        nb = remaining.bit_length()
        low_mask = (1 << (nb - 1)) - 1
        max_small = ((1 << nb) - 1) - remaining
        v = bits.peek(nb)
        if (v & low_mask) < max_small:
            value = v & low_mask
            bits.skip(nb - 1)
        else:
            value = v & ((1 << nb) - 1)
            if value >= (1 << (nb - 1)):
                value -= max_small
            bits.skip(nb)
        count = value - 1  # -1 .. remaining-1
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
    if remaining != 1:
        raise ZstdError("FSE counts do not sum to table size")
    while len(counts) <= max_symbol:
        counts.append(0)
    return counts, accuracy, bits.bytes_consumed()


def _fse_spread(counts: list[int], accuracy: int) -> list[int]:
    """Spread symbols over the table per §4.1.1: -1 probs take the tail
    cells; the rest spread with the (5/8·size + 3) step, skipping the
    tail region."""
    size = 1 << accuracy
    table = [-1] * size
    hi = size - 1
    for sym, c in enumerate(counts):
        if c == -1:
            table[hi] = sym
            hi -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for sym, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            table[pos] = sym
            pos = (pos + step) & mask
            while pos > hi:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE spread did not terminate at position 0")
    return table


class FseDecodeTable:
    __slots__ = ("accuracy", "symbols", "nbits", "newstate")

    def __init__(self, counts: list[int], accuracy: int):
        size = 1 << accuracy
        spread = _fse_spread(counts, accuracy)
        nxt = [c if c > 0 else 1 for c in counts]
        self.accuracy = accuracy
        self.symbols = spread
        self.nbits = [0] * size
        self.newstate = [0] * size
        for i in range(size):
            s = spread[i]
            x = nxt[s]
            nxt[s] = x + 1
            nb = accuracy - (x.bit_length() - 1)
            self.nbits[i] = nb
            self.newstate[i] = (x << nb) - size

    @classmethod
    def rle(cls, symbol: int) -> "FseDecodeTable":
        t = cls.__new__(cls)
        t.accuracy = 0
        t.symbols = [symbol]
        t.nbits = [0]
        t.newstate = [0]
        return t


class _FseState:
    __slots__ = ("table", "state")

    def __init__(self, table: FseDecodeTable, bits: _BackBits):
        self.table = table
        self.state = bits.read(table.accuracy)

    def symbol(self) -> int:
        return self.table.symbols[self.state]

    def update(self, bits: _BackBits) -> None:
        t = self.table
        self.state = t.newstate[self.state] + bits.read_padded(t.nbits[self.state])


class FseEncodeTable:
    """§4.1 encoder side: deltaNbBits/deltaFindState transforms plus the
    state table, built from the same normalized counts as decode."""

    __slots__ = ("accuracy", "state_table", "delta_nbbits", "delta_findstate")

    def __init__(self, counts: list[int], accuracy: int):
        size = 1 << accuracy
        spread = _fse_spread(counts, accuracy)
        cumul = [0] * (len(counts) + 1)
        for s, c in enumerate(counts):
            cumul[s + 1] = cumul[s] + (1 if c == -1 else max(c, 0))
        fill = cumul[:]  # running fill pointer per symbol
        self.state_table = [0] * size
        for pos in range(size):
            s = spread[pos]
            self.state_table[fill[s]] = size + pos
            fill[s] += 1
        self.accuracy = accuracy
        self.delta_nbbits = [0] * len(counts)
        self.delta_findstate = [0] * len(counts)
        for s, c in enumerate(counts):
            eff = 1 if c == -1 else c
            if eff == 0:
                continue
            # FSE_buildCTable: maxBitsOut = tableLog - highbit(c-1); for
            # c == 1 a state always emits all tableLog bits
            if eff >= 2:
                max_bits_out = accuracy - ((eff - 1).bit_length() - 1)
            else:
                max_bits_out = accuracy
            min_state_plus = eff << max_bits_out
            self.delta_nbbits[s] = (max_bits_out << 16) - min_state_plus
            self.delta_findstate[s] = cumul[s] - eff


class _FseEncState:
    __slots__ = ("table", "value")

    def __init__(self, table: FseEncodeTable, first_symbol: int):
        # FSE_initCState2: pick the cheapest state encoding first_symbol
        t = table
        nbits_out = (t.delta_nbbits[first_symbol] + (1 << 15)) >> 16
        base = (nbits_out << 16) - t.delta_nbbits[first_symbol]
        self.table = t
        self.value = t.state_table[(base >> nbits_out) + t.delta_findstate[first_symbol]]

    def encode(self, writer: _BitWriter, symbol: int) -> None:
        t = self.table
        nbits_out = (self.value + t.delta_nbbits[symbol]) >> 16
        writer.add(self.value, nbits_out)
        self.value = t.state_table[
            (self.value >> nbits_out) + t.delta_findstate[symbol]
        ]

    def flush(self, writer: _BitWriter) -> None:
        writer.add(self.value, self.table.accuracy)


# =====================================================================
# Huffman literals (§4.2.1)
# =====================================================================

_HUF_MAX_BITS = 11


class HufTable:
    __slots__ = ("max_bits", "symbols", "nbits", "weights")

    def __init__(self, weights: list[int]):
        """weights[i] for symbols 0..len-1 (last weight already present)."""
        total = sum(1 << (w - 1) for w in weights if w > 0)
        if total == 0 or total & (total - 1):
            raise ZstdError("Huffman weights do not sum to a power of two")
        max_bits = total.bit_length() - 1
        if max_bits > _HUF_MAX_BITS:
            raise ZstdError("Huffman code exceeds 11 bits")
        size = 1 << max_bits
        self.max_bits = max_bits
        self.weights = weights
        self.symbols = [0] * size
        self.nbits = [0] * size
        # lower weights (longer codes) fill the low table indices first,
        # symbols ascending within a weight — RFC 8878 code assignment
        pos = 0
        for w in range(1, max_bits + 1):
            for sym, sw in enumerate(weights):
                if sw != w:
                    continue
                span = 1 << (w - 1)
                nb = max_bits + 1 - w
                for i in range(pos, pos + span):
                    self.symbols[i] = sym
                    self.nbits[i] = nb
                pos += span
        if pos != size:
            raise ZstdError("Huffman table underfilled")

    def decode_stream(self, stream: bytes, regen: int) -> bytearray:
        bits = _BackBits(stream)
        mask = (1 << self.max_bits) - 1
        acc = bits.read_padded(self.max_bits)
        out = bytearray(regen)
        syms = self.symbols
        nbits = self.nbits
        for i in range(regen):
            out[i] = syms[acc]
            acc = ((acc << nbits[acc]) | bits.read_padded(nbits[acc])) & mask
        return out


def _read_huf_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description → (weights incl. the implied last, bytes
    consumed). header >= 128: direct 4-bit weights; else FSE-compressed."""
    header = data[0]
    if header >= 128:
        n = header - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        weights = []
        for i in range(n):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        consumed = 1 + nbytes
    else:
        comp = data[1 : 1 + header]
        counts, accuracy, tail_start = read_fse_ncount(comp, 255, 6)
        table = FseDecodeTable(counts, accuracy)
        bits = _BackBits(comp[tail_start:])
        s1 = _FseState(table, bits)
        s2 = _FseState(table, bits)
        weights = []
        # two interleaved states; an overflowing update emits the other
        # state's symbol and stops (§4.2.1.2)
        while True:
            weights.append(s1.symbol())
            if bits.avail < s1.table.nbits[s1.state]:
                s1.update(bits)
                weights.append(s2.symbol())
                break
            s1.update(bits)
            weights.append(s2.symbol())
            if bits.avail < s2.table.nbits[s2.state]:
                s2.update(bits)
                weights.append(s1.symbol())
                break
            s2.update(bits)
            if len(weights) > 255:
                raise ZstdError("too many Huffman weights")
        consumed = 1 + header
    # implied last weight completes the Kraft sum to a power of two
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("all-zero Huffman weights")
    nxt = 1 << total.bit_length()
    rest = nxt - total
    if rest & (rest - 1):
        raise ZstdError("invalid implied Huffman weight")
    weights.append(rest.bit_length())
    return weights, consumed


# =====================================================================
# Sequences: predefined tables & code baselines (§4.2.2)
# =====================================================================

_LL_DEFAULTS = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
     2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULTS = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULTS = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, -1, -1, -1, -1, -1],
    5,
)

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]

_MAX_LL_SYMBOL = 35
_MAX_ML_SYMBOL = 52
_MAX_OF_SYMBOL = 31  # spec allows up to 31 (offsets beyond predefined 28)


def _predef(kind: str) -> FseDecodeTable:
    counts, acc = {"ll": _LL_DEFAULTS, "ml": _ML_DEFAULTS, "of": _OF_DEFAULTS}[kind]
    return FseDecodeTable(counts, acc)


# =====================================================================
# Decoder
# =====================================================================


class ZstdDict:
    """A parsed zstd dictionary (RFC 8878 §5).

    Structured dictionaries (magic 0xEC30A437) carry a dict id, initial
    entropy tables (literals Huffman, then OF/ML/LL FSE), initial repeat
    offsets, and content; anything else is a raw content dictionary."""

    __slots__ = ("dict_id", "content", "huf", "of", "ml", "ll", "reps", "raw")

    def __init__(self, data: bytes):
        self.dict_id = 0
        self.huf = self.of = self.ml = self.ll = None
        self.reps = None
        self.raw = data  # the undigested bytes (native path feeds libzstd)
        if int.from_bytes(data[:4], "little") != DICT_MAGIC:
            self.content = data
            return
        self.dict_id = int.from_bytes(data[4:8], "little")
        pos = 8
        weights, consumed = _read_huf_weights(data[pos:])
        self.huf = HufTable(weights)
        pos += consumed
        for kind, max_sym, max_acc in (
            ("of", _MAX_OF_SYMBOL, 8),
            ("ml", _MAX_ML_SYMBOL, 9),
            ("ll", _MAX_LL_SYMBOL, 9),
        ):
            counts, acc, used = read_fse_ncount(data[pos:], max_sym, max_acc)
            setattr(self, kind, FseDecodeTable(counts, acc))
            pos += used
        reps = [
            int.from_bytes(data[pos + 4 * i : pos + 4 * (i + 1)], "little")
            for i in range(3)
        ]
        if any(r == 0 for r in reps):
            raise ZstdError("dictionary repeat offset of zero")
        self.reps = reps
        pos += 12
        self.content = data[pos:]


class _FrameCtx:
    """Per-frame entropy state: Huffman table + sequence tables persist
    across blocks (treeless literals, Repeat_Mode); repeat offsets do too."""

    __slots__ = ("huf", "ll", "ml", "of", "reps", "window_size")

    def __init__(self, window_size: int, zdict: "ZstdDict | None" = None):
        self.huf: HufTable | None = None
        self.ll: FseDecodeTable | None = None
        self.ml: FseDecodeTable | None = None
        self.of: FseDecodeTable | None = None
        self.reps = [1, 4, 8]
        self.window_size = window_size
        if zdict is not None:
            self.huf = zdict.huf
            self.of = zdict.of
            self.ml = zdict.ml
            self.ll = zdict.ll
            if zdict.reps:
                self.reps = list(zdict.reps)


def _decode_literals(block: bytes, ctx: _FrameCtx) -> tuple[bytes, int]:
    """Literals section → (literal bytes, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 3
    fmt = (b0 >> 2) & 3
    if ltype <= 1:  # Raw / RLE
        if fmt in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif fmt == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            return bytes(block[hdr : hdr + regen]), hdr + regen
        return bytes([block[hdr]]) * regen, hdr + 1
    # Compressed / Treeless
    if fmt == 0:
        streams, szbits, hdr = 1, 10, 3
    elif fmt == 1:
        streams, szbits, hdr = 4, 10, 3
    elif fmt == 2:
        streams, szbits, hdr = 4, 14, 4
    else:
        streams, szbits, hdr = 4, 18, 5
    h = int.from_bytes(block[:hdr], "little")
    regen = (h >> 4) & ((1 << szbits) - 1)
    comp = (h >> (4 + szbits)) & ((1 << szbits) - 1)
    body = bytes(block[hdr : hdr + comp])
    pos = 0
    if ltype == 2:  # new Huffman table
        weights, consumed = _read_huf_weights(body)
        ctx.huf = HufTable(weights)
        pos = consumed
    elif ctx.huf is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    huf = ctx.huf
    if streams == 1:
        out = huf.decode_stream(body[pos:], regen)
    else:
        if comp - pos < 6:
            raise ZstdError("4-stream literals too short for jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, pos)
        pos += 6
        part = (regen + 3) // 4
        sizes = [s1, s2, s3, comp - pos - s1 - s2 - s3]
        regens = [part, part, part, regen - 3 * part]
        if regens[3] < 0 or sizes[3] < 0:
            raise ZstdError("bad 4-stream layout")
        out = bytearray()
        for sz, rg in zip(sizes, regens):
            out += huf.decode_stream(body[pos : pos + sz], rg)
            pos += sz
    if len(out) != regen:
        raise ZstdError("literal regeneration size mismatch")
    return bytes(out), hdr + comp


def _seq_table(
    mode: int,
    data: bytes,
    pos: int,
    kind: str,
    max_symbol: int,
    max_acc: int,
    prev: FseDecodeTable | None,
) -> tuple[FseDecodeTable, int]:
    if mode == 0:
        return _predef(kind), pos
    if mode == 1:
        sym = data[pos]
        if sym > max_symbol:
            raise ZstdError(f"RLE {kind} symbol {sym} out of range")
        return FseDecodeTable.rle(sym), pos + 1
    if mode == 2:
        counts, acc, consumed = read_fse_ncount(bytes(data[pos:]), max_symbol, max_acc)
        return FseDecodeTable(counts, acc), pos + consumed
    if prev is None:
        raise ZstdError(f"repeat mode for {kind} with no previous table")
    return prev, pos


def _decode_sequences_exec(
    block: bytes,
    pos: int,
    literals: bytes,
    ctx: _FrameCtx,
    history: bytearray,
) -> None:
    """Parse + execute the sequences section, appending to history."""
    if pos >= len(block):
        raise ZstdError("missing sequences section")
    b0 = block[pos]
    if b0 == 0:
        history += literals
        return
    if b0 < 128:
        nseq = b0
        pos += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | block[pos + 1]
        pos += 2
    else:
        nseq = block[pos + 1] | (block[pos + 2] << 8) | 0x7F00
        pos += 3
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence-mode bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ctx.ll, pos = _seq_table(ll_mode, block, pos, "ll", _MAX_LL_SYMBOL, 9, ctx.ll)
    ctx.of, pos = _seq_table(of_mode, block, pos, "of", _MAX_OF_SYMBOL, 8, ctx.of)
    ctx.ml, pos = _seq_table(ml_mode, block, pos, "ml", _MAX_ML_SYMBOL, 9, ctx.ml)
    bits = _BackBits(bytes(block[pos:]))
    ll_state = _FseState(ctx.ll, bits)
    of_state = _FseState(ctx.of, bits)
    ml_state = _FseState(ctx.ml, bits)
    reps = ctx.reps
    lit_pos = 0
    base_len = len(history)
    for i in range(nseq):
        of_code = of_state.symbol()
        if of_code > 31:
            raise ZstdError("offset code too large")
        of_value = (1 << of_code) + bits.read(of_code) if of_code else 1
        ml_code = ml_state.symbol()
        match_len = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_state.symbol()
        lit_len = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        # repeat-offset resolution (§3.1.1.5)
        if of_value > 3:
            offset = of_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_value - 1 + (1 if lit_len == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_len:
            history += literals[lit_pos : lit_pos + lit_len]
            lit_pos += lit_len
        if offset > len(history):
            raise ZstdError("match offset beyond decoded history")
        # spec: a block regenerates at most min(window, 128 KiB) — this is
        # also the decompression-bomb bound for one block
        if len(history) - base_len + match_len > _BLOCK_MAX:
            raise ZstdError("block regenerates past the 128 KiB block cap")
        if match_len:
            start = len(history) - offset
            if offset >= match_len:
                history += history[start : start + match_len]
            else:  # overlapping copy
                for j in range(match_len):
                    history.append(history[start + j])
        if i < nseq - 1:
            ll_state.update(bits)
            ml_state.update(bits)
            of_state.update(bits)
    history += literals[lit_pos:]


def _parse_frame_header(data: bytes, pos: int) -> tuple[dict, int]:
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ZstdError("reserved frame-header bit set")
    single = bool(fhd & 0x20)
    fcs_flag = fhd >> 6
    did_flag = fhd & 3
    checksum = bool(fhd & 0x04)
    window_size = None
    if not single:
        wd = data[pos]
        pos += 1
        exp = wd >> 3
        mant = wd & 7
        base = 1 << (10 + exp)
        window_size = base + (base >> 3) * mant
    did_bytes = (0, 1, 2, 4)[did_flag]
    dict_id = int.from_bytes(data[pos : pos + did_bytes], "little") if did_bytes else 0
    pos += did_bytes
    fcs_bytes = (1 if single else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_bytes:
        fcs = int.from_bytes(data[pos : pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            fcs += 256
        pos += fcs_bytes
    if single:
        window_size = fcs if fcs is not None else 0
    return (
        {"window": window_size, "fcs": fcs, "dict_id": dict_id, "checksum": checksum},
        pos,
    )


def decompress_frame(
    data: bytes,
    pos: int = 0,
    dict_content: "bytes | ZstdDict" = b"",
    max_output: int | None = None,
) -> tuple[bytes, int]:
    """Decode one zstd frame at `pos` → (content, end position).

    dict_content: raw history bytes OR a parsed ZstdDict (structured
    dictionaries carry entropy tables and repeat offsets too).
    max_output bounds the decoded size — a crawl engine must treat every
    compressed payload as a potential decompression bomb."""
    magic = int.from_bytes(data[pos : pos + 4], "little")
    if magic != ZSTD_MAGIC:
        raise ZstdError(f"bad zstd magic 0x{magic:08x}")
    hdr, pos = _parse_frame_header(data, pos + 4)
    if max_output is not None and hdr["fcs"] is not None and hdr["fcs"] > max_output:
        raise ZstdError(f"frame content size {hdr['fcs']} exceeds cap")
    zdict: ZstdDict | None
    if isinstance(dict_content, ZstdDict):
        zdict = dict_content
    elif dict_content:
        zdict = ZstdDict(dict_content)
    else:
        zdict = None
    if (
        zdict is not None
        and hdr["dict_id"]
        and zdict.dict_id
        and hdr["dict_id"] != zdict.dict_id
    ):
        raise ZstdError(
            f"frame wants dictionary {hdr['dict_id']}, got {zdict.dict_id}"
        )
    window = hdr["window"] if hdr["window"] is not None else _BLOCK_MAX
    ctx = _FrameCtx(max(window, 1), zdict)
    history = bytearray(zdict.content if zdict is not None else b"")
    dict_len = len(history)
    if dict_len:
        ctx.window_size += dict_len  # dict counts as preloaded history
    while True:
        if max_output is not None and len(history) - dict_len > max_output:
            raise ZstdError("decoded output exceeds cap")
        if pos + 3 > len(data):
            # int.from_bytes(b'') would read as an endless raw block
            raise ZstdError("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ZstdError("truncated raw block")
            history += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ZstdError("truncated RLE block")
            history += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            block = memoryview(data)[pos : pos + bsize]
            literals, consumed = _decode_literals(block, ctx)
            _decode_sequences_exec(block, consumed, literals, ctx, history)
            pos += bsize
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    content = bytes(history[dict_len:])
    if hdr["fcs"] is not None and len(content) != hdr["fcs"]:
        raise ZstdError(
            f"frame content size mismatch: {len(content)} != {hdr['fcs']}"
        )
    if hdr["checksum"]:
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        got = xxh64(content) & 0xFFFFFFFF
        if got != want:
            raise ZstdError("content checksum mismatch")
    return content, pos


def iter_frames(
    data: bytes,
    dict_content: bytes = b"",
    tolerant: bool = True,
    native: bool = True,
    max_output: int | None = None,
) -> Iterator[bytes]:
    """Iterate zstd frames in a multi-frame stream (e.g. .warc.zst),
    skipping skippable frames.

    tolerant=True mirrors the WARC gzip-member reader: a corrupt or
    truncated frame ENDS the iteration (every frame already decoded
    survives; the partial one is dropped). tolerant=False raises.

    native=True decodes each frame with the system libzstd when loadable
    — the hot path: a crawl archive is ~1 GB of frames, and the pure
    decoder is for correctness, not throughput. Per-frame fallback to
    the pure decoder keeps behavior identical (tests assert equality)."""
    if isinstance(dict_content, ZstdDict):
        raw_dict: bytes = dict_content.raw
    else:
        raw_dict = dict_content
        if dict_content:
            dict_content = ZstdDict(dict_content)
    lib = _load_native() if native else None
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        magic = int.from_bytes(data[pos : pos + 4], "little")
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            if pos + 8 > n:
                return
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            pos += 8 + size
            continue
        if magic != ZSTD_MAGIC:
            if tolerant:
                return
            raise ZstdError(f"bad zstd magic 0x{magic:08x}")
        if lib is not None:
            got = _native_frame(lib, data, pos, max_output, raw_dict)
            if got is not None:
                content, pos = got
                yield content
                continue
            # fall through to the pure decoder for this frame (unknown
            # content size or native error — pure gives the real verdict)
        try:
            content, pos = decompress_frame(data, pos, dict_content, max_output)
        except (ZstdError, IndexError, struct.error):
            if tolerant:
                return
            raise
        yield content


def decompress_pure(
    data: bytes, dict_content: bytes = b"", max_output: int | None = None
) -> bytes:
    """Pure-Python decode of a (possibly multi-frame) zstd stream.
    Strict: any corruption raises ZstdError."""
    return _decompress_all(data, dict_content, native=False, max_output=max_output)


def _decompress_all(
    data: bytes, dict_content: bytes, native: bool, max_output: int | None = None
) -> bytes:
    out = bytearray()
    saw = False
    try:
        for content in iter_frames(
            data, dict_content, tolerant=False, native=native, max_output=max_output
        ):
            out += content
            saw = True
            if max_output is not None and len(out) > max_output:
                raise ZstdError("decoded output exceeds cap")
    except (IndexError, struct.error) as exc:  # truncation reads
        raise ZstdError(f"truncated zstd stream: {exc}") from exc
    if not saw:
        raise ZstdError("no zstd frame found")
    return bytes(out)


# =====================================================================
# Encoder (tests/fixtures; raw+RLE+compressed blocks)
# =====================================================================


def _huffman_lengths(freqs: dict[int, int], max_len: int = _HUF_MAX_BITS) -> dict[int, int]:
    """Depth-limited Huffman code lengths (complete code, Kraft sum 1)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    f = dict(freqs)
    while True:
        import heapq

        heap = [(f[s], i, (s,)) for i, s in enumerate(syms)]
        heapq.heapify(heap)
        i = len(syms)
        depth: dict[int, int] = {s: 0 for s in syms}
        while len(heap) > 1:
            w1, _, g1 = heapq.heappop(heap)
            w2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, i, g1 + g2))
            i += 1
        if max(depth.values()) <= max_len:
            return depth
        f = {s: max(1, c >> 2) for s, c in f.items()}  # flatten and retry


def _encode_huf_literals(literals: bytes) -> tuple[bytes, HufTable] | None:
    """Huffman-compress literals with a direct-weight header; None when
    not expressible (symbol > 127) or not profitable."""
    if not literals:
        return None
    freqs: dict[int, int] = {}
    for b in literals:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return None
    last_sym = max(freqs)
    if last_sym > 128:
        return None  # direct weight header caps at 128 weights
    lengths = _huffman_lengths(freqs)
    max_bits = max(lengths.values())
    if max_bits > _HUF_MAX_BITS:
        return None
    weights = [0] * (last_sym + 1)
    for s, ln in lengths.items():
        weights[s] = max_bits + 1 - ln
    table = HufTable(weights)
    # header: all weights except the implied last
    n = last_sym  # weights[0..last_sym-1] explicit, last implied
    hdr = bytearray([127 + n])
    for i in range(0, n, 2):
        hi = weights[i] << 4
        lo = weights[i + 1] if i + 1 < n else 0
        hdr.append(hi | lo)
    # encode: per-symbol (code, nbits) from the decode table layout
    codes: dict[int, tuple[int, int]] = {}
    pos = 0
    size = 1 << table.max_bits
    while pos < size:
        sym = table.symbols[pos]
        nb = table.nbits[pos]
        codes[sym] = (pos >> (table.max_bits - nb), nb)
        pos += 1 << (table.max_bits - nb)
    streams: list[bytes] = []
    part = (len(literals) + 3) // 4
    four = len(literals) >= 256
    chunks = (
        [literals[i * part : (i + 1) * part] for i in range(4)]
        if four
        else [literals]
    )
    for chunk in chunks:
        w = _BitWriter()
        # the decoder reads the backward stream newest-bits-first, so
        # symbols are written in reverse source order (HUF_compress1X)
        for b in reversed(chunk):
            code, nb = codes[b]
            w.add(code, nb)
        streams.append(w.close())
    if four:
        jump = struct.pack("<HHH", len(streams[0]), len(streams[1]), len(streams[2]))
        body = bytes(hdr) + jump + b"".join(streams)
        fmt = 1 if len(literals) < (1 << 10) and len(body) < (1 << 10) else 2
    else:
        body = bytes(hdr) + streams[0]
        fmt = 0
    regen = len(literals)
    comp = len(body)
    if comp + 5 >= regen:
        return None  # not profitable
    if fmt == 0 or fmt == 1:
        if regen >= (1 << 10) or comp >= (1 << 10):
            fmt = 2
    if fmt in (0, 1):
        h = 2 | (fmt << 2) | (regen << 4) | (comp << 14)
        header = h.to_bytes(3, "little")
    elif regen < (1 << 14) and comp < (1 << 14):
        h = 2 | (2 << 2) | (regen << 4) | (comp << 18)
        header = h.to_bytes(4, "little")
    else:
        h = 2 | (3 << 2) | (regen << 4) | (comp << 22)
        header = h.to_bytes(5, "little")
    return header + body, table


def _raw_literals_section(literals: bytes) -> bytes:
    n = len(literals)
    if n < 32:
        return bytes([(n << 3) | 0]) + literals
    if n < (1 << 12):
        h = 0 | (1 << 2) | (n << 4)
        return h.to_bytes(2, "little") + literals
    h = 0 | (3 << 2) | (n << 4)
    return h.to_bytes(3, "little") + literals


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    for c in range(_MAX_LL_SYMBOL, 15, -1):
        if v >= _LL_BASE[c]:
            return c
    return 15


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    for c in range(_MAX_ML_SYMBOL, 31, -1):
        if v >= _ML_BASE[c]:
            return c
    return 31


def _find_sequences(data: bytes) -> tuple[list[tuple[int, int, int]], bytes]:
    """Greedy hash-table LZ77 → ([(lit_len, offset, match_len)], literals).
    Offsets are plain distances (repeat-offset codes are not emitted)."""
    n = len(data)
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    table: dict[bytes, int] = {}
    i = 0
    anchor = 0
    while i + 4 <= n:
        key = bytes(data[i : i + 4])
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= (1 << 17):
            mlen = 4
            maxm = n - i
            while mlen < maxm and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            if mlen >= 4:
                lits += data[anchor:i]
                seqs.append((i - anchor, i - cand, mlen))
                i += mlen
                anchor = i
                continue
        i += 1
    lits += data[anchor:]
    return seqs, bytes(lits)


def _encode_sequences(seqs: list[tuple[int, int, int]]) -> bytes:
    """Sequences section with predefined FSE tables (mode 0 everywhere)."""
    nseq = len(seqs)
    if nseq < 128:
        out = bytearray([nseq])
    elif nseq < 0x7F00:
        out = bytearray([128 + (nseq >> 8), nseq & 0xFF])
    else:
        rem = nseq - 0x7F00
        out = bytearray([255, rem & 0xFF, rem >> 8])
    if nseq == 0:
        return bytes(out)
    out.append(0)  # all predefined
    ll_t = FseEncodeTable(*_LL_DEFAULTS)
    ml_t = FseEncodeTable(*_ML_DEFAULTS)
    of_counts, of_acc = _OF_DEFAULTS
    of_t = FseEncodeTable(of_counts, of_acc)
    codes = []
    for lit_len, offset, match_len in seqs:
        of_value = offset + 3
        of_code = of_value.bit_length() - 1
        if of_code > 28:
            raise ZstdError("offset beyond predefined table range")
        codes.append(
            (
                _ll_code(lit_len),
                lit_len,
                of_code,
                of_value - (1 << of_code),
                _ml_code(match_len),
                match_len,
            )
        )
    w = _BitWriter()
    llc, llv, ofc, ofx, mlc, mlv = codes[-1]
    ml_state = _FseEncState(ml_t, mlc)
    of_state = _FseEncState(of_t, ofc)
    ll_state = _FseEncState(ll_t, llc)
    w.add(llv - _LL_BASE[llc], _LL_BITS[llc])
    w.add(mlv - _ML_BASE[mlc], _ML_BITS[mlc])
    w.add(ofx, ofc)
    for i in range(len(codes) - 2, -1, -1):
        llc, llv, ofc, ofx, mlc, mlv = codes[i]
        of_state.encode(w, ofc)
        ml_state.encode(w, mlc)
        ll_state.encode(w, llc)
        w.add(llv - _LL_BASE[llc], _LL_BITS[llc])
        w.add(mlv - _ML_BASE[mlc], _ML_BITS[mlc])
        w.add(ofx, ofc)
    ml_state.flush(w)
    of_state.flush(w)
    ll_state.flush(w)
    return bytes(out) + w.close()


def _compress_block(chunk: bytes) -> bytes | None:
    """One compressed-block body, or None when raw is smaller."""
    seqs, literals = _find_sequences(chunk)
    lit_sec = None
    enc = _encode_huf_literals(literals)
    if enc is not None:
        lit_sec = enc[0]
    if lit_sec is None:
        lit_sec = _raw_literals_section(literals)
    seq_sec = _encode_sequences(seqs)
    body = lit_sec + seq_sec
    if len(body) >= len(chunk):
        return None
    return body


def compress(
    data: bytes,
    level: str = "lz",
    checksum: bool = True,
    frame_content_size: bool = True,
) -> bytes:
    """Encode `data` as one zstd frame.

    level: 'raw' (stored blocks only), 'rle' (RLE where possible, else
    raw) or 'lz' (compressed blocks — Huffman literals + predefined-FSE
    sequences, falling back per block when not profitable).
    """
    out = bytearray()
    out += struct.pack("<I", ZSTD_MAGIC)
    n = len(data)
    fhd = 0x20  # single-segment
    if checksum:
        fhd |= 0x04
    # single-segment requires an FCS field; choose width by size
    if n >= (1 << 32):
        fhd |= 3 << 6
        fcs = struct.pack("<Q", n)
    elif n > 0xFFFF + 256 or not frame_content_size:
        fhd |= 2 << 6
        fcs = struct.pack("<I", n)
    elif n >= 256:
        fhd |= 1 << 6
        fcs = struct.pack("<H", n - 256)
    else:
        fcs = bytes([n])
    out.append(fhd)
    out += fcs
    if n == 0:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")
    else:
        pos = 0
        while pos < n:
            chunk = bytes(data[pos : pos + _BLOCK_MAX])
            pos += len(chunk)
            last = 1 if pos >= n else 0
            body = None
            if level == "rle" and len(set(chunk)) == 1:
                out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
                out.append(chunk[0])
                continue
            if level == "lz":
                if len(set(chunk)) == 1:
                    out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
                    out.append(chunk[0])
                    continue
                body = _compress_block(chunk)
            if body is not None:
                out += (last | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
                out += body
            else:
                out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
                out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(bytes(data)) & 0xFFFFFFFF)
    return bytes(out)


def write_skippable_frame(payload: bytes, magic_low_nibble: int = 0) -> bytes:
    """A skippable frame (e.g. the .warc.zst index/dictionary carriers)."""
    magic = SKIPPABLE_MAGIC_MIN + (magic_low_nibble & 0xF)
    return struct.pack("<II", magic, len(payload)) + payload


WARC_DICT_MAGIC = 0x184D2A5D  # the IIPC .warc.zst dictionary carrier


def extract_warc_dictionary(data: bytes) -> bytes:
    """The shared dictionary from a .warc.zst archive's leading skippable
    frames (magic 0x184D2A5D), per the IIPC layout. The carried payload
    may itself be zstd-compressed. b'' when no dictionary frame exists."""
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        magic = int.from_bytes(data[pos : pos + 4], "little")
        if not SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            return b""
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + size]
        if magic == WARC_DICT_MAGIC and len(payload) == size:
            if payload[:4] == b"\x28\xb5\x2f\xfd":
                try:
                    return decompress(payload)
                except ZstdError:
                    return b""
            return bytes(payload)
        pos += 8 + size
    return b""


# =====================================================================
# Engine dispatch: prefer the native library, fall back to pure Python
# =====================================================================

_NATIVE: ctypes.CDLL | None | bool = False  # False = not probed yet


def _load_native() -> ctypes.CDLL | None:
    global _NATIVE
    if _NATIVE is not False:
        return _NATIVE  # type: ignore[return-value]
    lib = None
    for name in ("libzstd.so.1", "libzstd.so", ctypes.util.find_library("zstd")):
        if not name:
            continue
        try:
            cand = ctypes.CDLL(name)
            cand.ZSTD_isError.restype = ctypes.c_uint
            cand.ZSTD_decompress.restype = ctypes.c_size_t
            cand.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
            lib = cand
            break
        except OSError:
            continue
    _NATIVE = lib
    return lib


def _native_frame(
    lib: ctypes.CDLL,
    data: bytes,
    pos: int,
    max_output: int | None = None,
    raw_dict: bytes = b"",
) -> tuple[bytes, int] | None:
    """Decode ONE frame at `pos` via libzstd; None → pure fallback."""
    frame = data[pos:]
    size = lib.ZSTD_getFrameContentSize(frame, len(frame))
    if size in ((1 << 64) - 1, (1 << 64) - 2):  # unknown/error
        return None
    if max_output is not None and int(size) > max_output:
        raise ZstdError(f"frame content size {int(size)} exceeds cap")
    lib.ZSTD_findFrameCompressedSize.restype = ctypes.c_size_t
    csize = lib.ZSTD_findFrameCompressedSize(frame, len(frame))
    if lib.ZSTD_isError(csize):
        return None
    buf = ctypes.create_string_buffer(max(int(size), 1))
    if raw_dict:
        lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        lib.ZSTD_decompress_usingDict.restype = ctypes.c_size_t
        # explicit prototypes: size_t args passed as c_int corrupt the
        # stack on some ABIs (observed as a segfault)
        lib.ZSTD_decompress_usingDict.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        dctx = lib.ZSTD_createDCtx()
        if not dctx:
            return None
        try:
            r = lib.ZSTD_decompress_usingDict(
                ctypes.c_void_p(dctx), ctypes.cast(buf, ctypes.c_void_p),
                int(size), bytes(frame), int(csize), raw_dict, len(raw_dict),
            )
        finally:
            lib.ZSTD_freeDCtx(ctypes.c_void_p(dctx))
    else:
        r = lib.ZSTD_decompress(buf, int(size), frame, int(csize))
    if lib.ZSTD_isError(r):
        return None
    return buf.raw[: int(r)], pos + int(csize)


def decompress(
    data: bytes, dict_content: bytes = b"", max_output: int | None = None
) -> bytes:
    """Decode a zstd stream: native libzstd per frame when loadable (the
    hot path), pure from-scratch decoder otherwise or on fallback.
    Behavior-identical by test. max_output caps the total decoded size
    (decompression-bomb guard)."""
    return _decompress_all(data, dict_content, native=True, max_output=max_output)
