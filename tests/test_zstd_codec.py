"""zstd codec (RFC 8878) — round-trip, spec-path, and native-oracle tests.

Two independent correctness sources:
1. SELF round-trip: our encoder's raw/RLE/compressed frames through our
   pure decoder (always runs — no external dependency).
2. NATIVE oracle (skip-if-absent): the system libzstd via ctypes. Real
   libzstd streams at levels 1/3/9/19 exercise decoder paths our encoder
   never emits (FSE-compressed sequence tables, treeless literals,
   repeat-mode tables, FSE-compressed Huffman weights, window frames),
   and libzstd decodes OUR frames, proving the encoder writes spec-valid
   streams rather than merely our-decoder-compatible ones.
"""

from __future__ import annotations

import ctypes
import random
import struct

import pytest

from pdf_parser_spark import zstd_codec as Z


def _native():
    try:
        lib = ctypes.CDLL("libzstd.so.1")
    except OSError:
        return None
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    return lib


_LIB = _native()
needs_native = pytest.mark.skipif(_LIB is None, reason="libzstd not loadable")


def _lib_compress(data: bytes, level: int) -> bytes:
    bound = _LIB.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    r = _LIB.ZSTD_compress(buf, bound, data, len(data), level)
    assert not _LIB.ZSTD_isError(r)
    return buf.raw[:r]


def _lib_decompress(comp: bytes, n: int) -> bytes | None:
    buf = ctypes.create_string_buffer(max(n, 1))
    r = _LIB.ZSTD_decompress(buf, n, comp, len(comp))
    if _LIB.ZSTD_isError(r):
        return None
    return buf.raw[:r]


def _corpus() -> dict[str, bytes]:
    rng = random.Random(42)
    words = [
        bytes(rng.choices(b"abcdefgh ", k=rng.randint(2, 9))) for _ in range(50)
    ]
    return {
        "empty": b"",
        "one": b"q",
        "short": b"hello world hello world hello",
        "text": b" ".join(rng.choices(words, k=5000)),
        "rle": b"\x00" * 70_000,
        "random": bytes(rng.getrandbits(8) for _ in range(4000)),
        "multiblock": b" ".join(rng.choices(words, k=150_000)),  # > 128 KiB
        "html": (b"<html><body><p>paragraph text</p></body></html>\n") * 4000,
        "highbytes": bytes(rng.choices([0xE9, 0xC3, 0x20, 0x61, 0x62], k=3000)),
    }


# ------------------------------------------------------------ self round-trip


@pytest.mark.parametrize("level", ["raw", "rle", "lz"])
def test_roundtrip_self(level):
    for name, data in _corpus().items():
        comp = Z.compress(data, level=level)
        assert Z.decompress_pure(comp) == data, (name, level)


def test_roundtrip_no_checksum_and_dispatch():
    data = _corpus()["text"]
    comp = Z.compress(data, level="lz", checksum=False)
    assert Z.decompress_pure(comp) == data
    # engine dispatch (native or pure — whichever loads) agrees
    assert Z.decompress(comp) == data


def test_checksum_detects_corruption():
    comp = bytearray(Z.compress(b"payload bytes " * 100, level="lz"))
    comp[-7] ^= 0x40  # flip a bit inside the last block's payload
    with pytest.raises(Z.ZstdError):
        Z.decompress_pure(bytes(comp))


def test_frame_content_size_enforced():
    comp = bytearray(Z.compress(b"abc", checksum=False))
    comp[5] += 1  # FCS byte (single-segment, 1-byte FCS)
    with pytest.raises(Z.ZstdError, match="content size"):
        Z.decompress_pure(bytes(comp))


def test_skippable_frames_and_multi_frame():
    a, b = b"first frame " * 50, b"second " * 99
    stream = (
        Z.write_skippable_frame(b"ignored metadata", 0xE)
        + Z.compress(a)
        + Z.write_skippable_frame(b"", 0)
        + Z.compress(b)
    )
    assert Z.decompress_pure(stream) == a + b
    assert list(Z.iter_frames(stream)) == [a, b]


def test_truncated_tail_stops_cleanly():
    good = Z.compress(b"complete " * 40)
    cut = Z.compress(b"lost " * 40)[:-9]
    assert list(Z.iter_frames(good + cut)) == [b"complete " * 40]


def test_no_frame_raises():
    with pytest.raises(Z.ZstdError):
        Z.decompress_pure(b"not zstd at all")


def test_raw_content_dictionary():
    dict_content = b"the quick brown fox jumps over the lazy dog. " * 10
    # hand-build a frame whose first sequence back-references the dict:
    # literals "AB", then a match of length 8 at offset len(dict)+2-? —
    # easiest honest test: our encoder can't emit dict refs, so verify
    # via the decode path directly with a crafted sequence.
    lit = Z._raw_literals_section(b"XY")
    # one sequence: lit_len 2, offset reaching 10 bytes into the dict
    off = len(dict_content) + 2 - 10  # absolute back-distance from end
    seqs = Z._encode_sequences([(2, off, 8)])
    body = lit + seqs
    frame = (
        struct.pack("<I", Z.ZSTD_MAGIC)
        + bytes([0x20, 12])  # single-segment, FCS=2+8=10? (2 lits + 8 match)
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body
    )
    # fix FCS: 2 literals + 8 matched = 10
    frame = frame[:4] + bytes([0x20, 10]) + frame[6:]
    out, _ = Z.decompress_frame(frame, 0, dict_content=dict_content)
    expect = b"XY" + (dict_content + b"XY")[-off:][:8]
    assert out == expect


def test_xxh64_known_vectors():
    # publicly known XXH64 vectors (seed 0)
    assert Z.xxh64(b"") == 0xEF46DB3751D8E999
    assert Z.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert Z.xxh64(b"abc") == 0x44BC2CF5AD770999


# ------------------------------------------------------------ native oracle


@needs_native
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_native_streams(level):
    for name, data in _corpus().items():
        comp = _lib_compress(data, level)
        assert Z.decompress_pure(comp) == data, (name, level)


@needs_native
def test_native_decodes_our_frames():
    for name, data in _corpus().items():
        for level in ("raw", "rle", "lz"):
            comp = Z.compress(data, level=level)
            assert _lib_decompress(comp, len(data)) == data, (name, level)


@needs_native
def test_dispatch_prefers_native_and_matches_pure():
    data = _corpus()["multiblock"]
    comp = _lib_compress(data, 19)
    assert Z.decompress(comp) == Z.decompress_pure(comp) == data


@needs_native
def test_decode_native_long_window_frame():
    # non-single-segment frame with a real window descriptor: stream API
    lib = _LIB
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_compressStream2.restype = ctypes.c_size_t
    data = _corpus()["multiblock"]
    cctx = lib.ZSTD_createCCtx()

    class Buf(ctypes.Structure):
        _fields_ = [
            ("dst", ctypes.c_void_p),
            ("size", ctypes.c_size_t),
            ("pos", ctypes.c_size_t),
        ]

    out = ctypes.create_string_buffer(len(data) * 2 + 1024)
    src = ctypes.create_string_buffer(data, len(data))
    ob = Buf(ctypes.cast(out, ctypes.c_void_p), len(out), 0)
    ib = Buf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
    r = lib.ZSTD_compressStream2(
        ctypes.c_void_p(cctx), ctypes.byref(ob), ctypes.byref(ib), 2
    )  # ZSTD_e_end
    assert r == 0 and not lib.ZSTD_isError(r)
    comp = out.raw[: ob.pos]
    lib.ZSTD_freeCCtx(ctypes.c_void_p(cctx))
    # streaming frames omit single-segment: window descriptor path
    assert Z.decompress_pure(comp) == data


@needs_native
def test_iter_frames_native_and_pure_agree():
    data = _corpus()
    stream = (
        Z.write_skippable_frame(b"idx")
        + _lib_compress(data["text"], 19)
        + Z.compress(data["rle"])
        + _lib_compress(data["random"], 1)
    )
    nat = list(Z.iter_frames(stream, native=True))
    pure = list(Z.iter_frames(stream, native=False))
    assert nat == pure == [data["text"], data["rle"], data["random"]]
    # truncated tail: both stop after the intact frames
    cut = stream[:-10]
    assert list(Z.iter_frames(cut, native=True)) == list(
        Z.iter_frames(cut, native=False)
    )


def _train_dict(samples: list[bytes], cap: int = 16384) -> bytes:
    lib = _LIB
    lib.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
    lib.ZDICT_trainFromBuffer.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_uint,
    ]
    lib.ZDICT_isError.restype = ctypes.c_uint
    blob = b"".join(samples)
    sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
    buf = ctypes.create_string_buffer(cap)
    r = lib.ZDICT_trainFromBuffer(buf, cap, blob, sizes, len(samples))
    assert not lib.ZDICT_isError(r)
    return buf.raw[:r]


def _compress_with_dict(msg: bytes, zdict: bytes, level: int = 3) -> bytes:
    lib = _LIB
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_compress_usingDict.restype = ctypes.c_size_t
    lib.ZSTD_compress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    cctx = lib.ZSTD_createCCtx()
    bound = _LIB.ZSTD_compressBound(len(msg))
    out = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress_usingDict(
        ctypes.c_void_p(cctx), ctypes.cast(out, ctypes.c_void_p), bound,
        msg, len(msg), zdict, len(zdict), level,
    )
    lib.ZSTD_freeCCtx(ctypes.c_void_p(cctx))
    assert not lib.ZSTD_isError(n)
    return out.raw[:n]


def _dict_samples() -> list[bytes]:
    rng = random.Random(9)
    words = [
        bytes(rng.choices(b"abcdefgh <>/=", k=rng.randint(3, 10)))
        for _ in range(60)
    ]
    return [
        b"<html><body>" + b" ".join(rng.choices(words, k=60)) + b"</body></html>"
        for _ in range(200)
    ]


@needs_native
def test_structured_dictionary_decode():
    """RFC 8878 §5 dictionaries: a real ZDICT-trained dictionary parses
    (id, entropy tables, rep offsets, content) and members compressed
    against it decode identically on the pure and native paths."""
    samples = _dict_samples()
    zdict_raw = _train_dict(samples)
    d = Z.ZstdDict(zdict_raw)
    assert d.dict_id != 0 and d.huf is not None and d.of is not None
    for msg in samples[:5]:
        comp = _compress_with_dict(msg, zdict_raw)
        hdr, _ = Z._parse_frame_header(comp, 4)
        assert hdr["dict_id"] == d.dict_id  # members reference the dict
        assert Z.decompress_pure(comp, dict_content=zdict_raw) == msg
        assert Z.decompress(comp, dict_content=zdict_raw) == msg
    # wrong dictionary id fails loudly, not garbage output
    other = bytearray(zdict_raw)
    other[4] ^= 0xFF  # change the dict id
    with pytest.raises(Z.ZstdError, match="dictionary"):
        Z.decompress_pure(
            _compress_with_dict(samples[0], zdict_raw), dict_content=bytes(other)
        )


@needs_native
def test_extract_warc_dictionary_frame():
    samples = _dict_samples()
    zdict_raw = _train_dict(samples)
    # plain carrier
    arch = Z.write_skippable_frame(zdict_raw, 0xD) + _compress_with_dict(
        samples[0], zdict_raw
    )
    assert Z.extract_warc_dictionary(arch) == zdict_raw
    assert list(Z.iter_frames(arch, dict_content=zdict_raw)) == [samples[0]]
    # compressed carrier (the IIPC layout allows a zstd-compressed dict)
    arch2 = Z.write_skippable_frame(Z.compress(zdict_raw), 0xD)
    assert Z.extract_warc_dictionary(arch2) == zdict_raw
    # no dictionary -> empty
    assert Z.extract_warc_dictionary(Z.compress(b"x")) == b""
