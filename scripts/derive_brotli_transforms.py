"""Derive RFC 7932 Appendix B's 121 word transforms from libbrotli.

The brotli static-dictionary transforms are spec constants. This script
recovers them empirically instead of transcribing 121 table rows by hand:
it hand-crafts minimal valid brotli streams — one compressed meta-block
holding a single insert-and-copy command whose distance addresses a known
dictionary word under transform_id k — and feeds them to the SYSTEM
libbrotlidec. The decoder's output for several words of several lengths
pins down each transform as (prefix, op, suffix), where op is one of
Identity / OmitFirst1-9 / OmitLast1-9 / FermentFirst / FermentAll
(UTF-8-aware uppercasing per §8).

The derived table is hard-coded in pdf_parser_spark/brotli_codec.py;
tests/test_brotli_codec.py re-runs this derivation when libbrotli is
present and asserts the hard-coded table matches, so the constant can
never drift from the reference implementation.

Run: python scripts/derive_brotli_transforms.py
"""

from __future__ import annotations

import ctypes
import gzip
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


class _BitWriter:
    """LSB-first bit accumulator (brotli's bit order)."""

    def __init__(self):
        self.val = 0
        self.n = 0

    def add(self, value: int, bits: int) -> None:
        self.val |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits

    def bytes(self) -> bytes:
        return self.val.to_bytes((self.n + 7) // 8 or 1, "little")


# copy-length code table (§5): code -> (base, extra_bits)
_COPY = (
    [(i + 2, 0) for i in range(8)]
    + [(10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4), (54, 4)]
    + [(70, 5), (102, 5), (134, 6), (198, 7), (326, 8), (582, 9), (1094, 10), (2118, 24)]
)


def _copy_code(length: int) -> tuple[int, int, int]:
    for code in range(23, -1, -1):
        base, extra = _COPY[code]
        if length >= base and length - base < (1 << extra):
            return code, extra, length - base
    raise ValueError(length)


def _distance_code(distance: int) -> tuple[int, int, int]:
    """NPOSTFIX=0, NDIRECT=0 long distance code for a given distance."""
    target = distance - 1  # distance = offset + extra + 1
    for hcode in range(0, 48):
        ndistbits = 1 + (hcode >> 1)
        offset = ((2 + (hcode & 1)) << ndistbits) - 4
        if offset <= target < offset + (1 << ndistbits):
            return 16 + hcode, ndistbits, target - offset
    raise ValueError(distance)


def _simple_code_1(w: _BitWriter, symbol: int, alphabet_bits: int) -> None:
    """Simple prefix code with one symbol (zero bits per emitted symbol)."""
    w.add(1, 2)  # HSKIP==1 -> simple
    w.add(0, 2)  # NSYM-1 == 0
    w.add(symbol, alphabet_bits)


def build_dict_ref_stream(copy_len: int, address: int, mlen: int) -> bytes:
    """One last meta-block, one command: insert 0 literals, copy copy_len
    at a distance addressing static-dictionary `address` from position 0."""
    w = _BitWriter()
    w.add(0, 1)  # WBITS = 16
    w.add(1, 1)  # ISLAST
    w.add(0, 1)  # ISLASTEMPTY = 0
    w.add(0, 2)  # MNIBBLES code 0 -> 4 nibbles
    w.add(mlen - 1, 16)
    w.add(0, 1)  # NBLTYPESL = 1
    w.add(0, 1)  # NBLTYPESI = 1
    w.add(0, 1)  # NBLTYPESD = 1
    w.add(0, 2)  # NPOSTFIX = 0
    w.add(0, 4)  # NDIRECT = 0
    w.add(0, 2)  # context mode for the single literal block type (LSB6)
    w.add(0, 1)  # NTREESL = 1
    w.add(0, 1)  # NTREESD = 1
    _simple_code_1(w, ord("x"), 8)  # literal code (never used)
    ccode, cextra_bits, cextra = _copy_code(copy_len)
    # command symbol with explicit distance: cell index 0 of the >=128
    # range has insert range 0, copy range 0; cell 1 copy range 8
    if ccode < 8:
        cmd = (2 << 6) | (0 << 3) | ccode
    else:
        cmd = (3 << 6) | (0 << 3) | (ccode - 8)
    _simple_code_1(w, cmd, 10)
    distance = address + 1  # position 0: max_backward = 0
    dcode, dextra_bits, dextra = _distance_code(distance)
    _simple_code_1(w, dcode, 6)  # distance alphabet 16+0+48 = 64 -> 6 bits
    # the one command: cmd symbol (0 bits), insert extra (none: code 0 has
    # 0 extra), copy extra, no literals, distance symbol (0 bits) + extra
    w.add(cextra, cextra_bits)
    w.add(dextra, dextra_bits)
    return w.bytes()


def _libs():
    dec = ctypes.CDLL("libbrotlidec.so.1")
    dec.BrotliDecoderDecompress.restype = ctypes.c_int
    common = ctypes.CDLL("libbrotlicommon.so.1")
    common.BrotliGetDictionary.restype = ctypes.c_void_p
    return dec, common


def _decode(dec, comp: bytes, max_out: int = 4096) -> bytes | None:
    buf = ctypes.create_string_buffer(max_out)
    n = ctypes.c_size_t(max_out)
    r = dec.BrotliDecoderDecompress(len(comp), comp, ctypes.byref(n), buf)
    if r != 1:
        return None
    return buf.raw[: n.value]


def load_dictionary() -> tuple[bytes, list[int], list[int]]:
    _, common = _libs()

    class D(ctypes.Structure):
        _fields_ = [
            ("size_bits", ctypes.c_uint8 * 32),
            ("offsets", ctypes.c_uint32 * 32),
            ("n", ctypes.c_size_t),
            ("data", ctypes.c_void_p),
        ]

    d = D.from_address(common.BrotliGetDictionary())
    return (
        ctypes.string_at(d.data, d.n),
        list(d.size_bits),
        list(d.offsets),
    )


def transform_outputs(word_len: int, word_index: int, num_tids: int):
    """Decode the same dictionary word under every transform id; returns
    {tid: transformed_bytes or None} (None = no MLEN decodes, e.g. the
    transform empties a short word and brotli forbids empty meta-blocks)."""
    dec, _ = _libs()
    _, size_bits, _ = load_dictionary()
    out: dict[int, bytes | None] = {}
    for tid in range(num_tids):
        address = word_index + (tid << size_bits[word_len])
        got = None
        # output length unknown a priori: scan candidate MLENs
        for mlen in range(max(1, word_len - 9), word_len + 24):
            comp = build_dict_ref_stream(word_len, address, mlen)
            got = _decode(dec, comp)
            if got is not None:
                break
        out[tid] = got
    return out


def count_transforms(max_tid: int = 256) -> int:
    """Number of valid transform ids, probed with a long word (every
    transform of a long word is non-empty, so failures mean out-of-range)."""
    dec, _ = _libs()
    _, size_bits, _ = load_dictionary()
    n = 0
    for tid in range(max_tid):
        address = 3 + (tid << size_bits[10])
        if any(
            _decode(dec, build_dict_ref_stream(10, address, mlen)) is not None
            for mlen in range(1, 34)
        ):
            n = tid + 1
        else:
            break
    return n


def classify(word: bytes, outputs: dict[int, bytes]) -> list[tuple[bytes, str, bytes]]:
    """Infer (prefix, op, suffix) per transform from one word's outputs."""

    def ferment(buf: bytearray, pos: int) -> int:
        c = buf[pos]
        if c < 192:
            if 97 <= c <= 122:
                buf[pos] ^= 32
            return 1
        if c < 224:
            if pos + 1 < len(buf):
                buf[pos + 1] ^= 32
            return 2
        if pos + 2 < len(buf):
            buf[pos + 2] ^= 5
        return 3

    def apply_op(op: str) -> bytes:
        if op == "Identity":
            return word
        if op.startswith("OmitFirst"):
            k = int(op[9:])
            return word[k:] if k <= len(word) else b""
        if op.startswith("OmitLast"):
            k = int(op[8:])
            return word[:-k] if k < len(word) else b""
        buf = bytearray(word)
        if op == "FermentFirst":
            ferment(buf, 0)
        else:  # FermentAll
            i = 0
            while i < len(buf):
                i += ferment(buf, i)
        return bytes(buf)

    ops = (
        ["Identity", "FermentFirst", "FermentAll"]
        + [f"OmitFirst{k}" for k in range(1, 10)]
        + [f"OmitLast{k}" for k in range(1, 10)]
    )
    table: list[set[tuple[bytes, str, bytes]] | None] = []
    for tid in sorted(outputs):
        got = outputs[tid]
        if got is None:
            table.append(None)
            continue
        matches: set[tuple[bytes, str, bytes]] = set()
        for op in ops:
            core = apply_op(op)
            # every placement of the core is a consistent interpretation
            idx = got.find(core)
            while idx != -1:
                matches.add((got[:idx], op, got[idx + len(core):]))
                idx = got.find(core, idx + 1)
        if not matches:
            raise AssertionError(f"tid {tid}: cannot classify {got!r}")
        table.append(matches)
    return table


def derive() -> list[tuple[bytes, str, bytes]]:
    data, size_bits, offsets = load_dictionary()
    n = count_transforms()
    # several probe words to disambiguate op vs fixed affix text; a probe
    # abstains (None) when a transform empties its word
    probes = [(8, 0), (8, 7), (10, 3), (10, 11), (12, 2)]
    candidates: list[list[tuple[bytes, str, bytes] | None]] = []
    for wlen, widx in probes:
        word = data[offsets[wlen] + widx * wlen : offsets[wlen] + (widx + 1) * wlen]
        outs = transform_outputs(wlen, widx, n)
        candidates.append(classify(word, outs))
    # consensus: one word can admit several interpretations (the word may
    # itself contain the affix text); the true transform is the one
    # consistent with EVERY probe word — intersect the candidate sets
    table = []
    for i in range(n):
        common: set | None = None
        for c in candidates:
            if c[i] is None:
                continue
            common = c[i] if common is None else (common & c[i])
        assert common, (i, [c[i] for c in candidates])
        if len(common) > 1:
            # residual tie (e.g. empty word): shortest total affix wins,
            # Identity preferred over Omit*
            op_rank = {"Identity": 0, "FermentFirst": 1, "FermentAll": 1}
            common = {
                min(
                    common,
                    key=lambda t: (len(t[0]) + len(t[2]), op_rank.get(t[1], 2)),
                )
            }
        table.append(next(iter(common)))
    return table


if __name__ == "__main__":
    table = derive()
    print(f"NUM_TRANSFORMS = {len(table)}")
    print("_TRANSFORMS = [")
    for prefix, op, suffix in table:
        print(f"    ({prefix!r}, {op!r}, {suffix!r}),")
    print("]")
    sys.stdout.flush()
