"""Decode-throughput measurement for the compression/media codecs.

Quantifies the engine-dispatch design: the pure-Python decoders are
correctness references (oracle-verified against the real C libraries),
while the hot path at crawl scale runs the native library via ctypes
when loadable. This script measures both sides on a representative
~4 MB web-text corpus so BENCH.md can quote numbers instead of
assertions.

Prints one JSON line:
  {"metric": "codec decode throughput", "unit": "MB/s", "codecs": {...}}
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdf_parser_spark import brotli_codec, zstd_codec  # noqa: E402


def _corpus(mb: float = 4.0) -> bytes:
    rng = random.Random(42)
    words = [
        bytes(rng.choices(b"abcdefghijklmnop <>/=\"", k=rng.randint(3, 11)))
        for _ in range(500)
    ]
    out = bytearray()
    target = int(mb * (1 << 20))
    while len(out) < target:
        out += b"<p>" + b" ".join(rng.choices(words, k=200)) + b"</p>\n"
    return bytes(out[:target])


def _throughput(fn, comp: bytes, plain_len: int, min_s: float = 1.0) -> float:
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_s:
        fn(comp)
        n += 1
    dt = time.perf_counter() - t0
    return plain_len * n / dt / (1 << 20)


def main() -> None:
    plain = _corpus()
    results: dict[str, float] = {}

    import ctypes

    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    bound = lib.ZSTD_compressBound(len(plain))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(buf, bound, plain, len(plain), 3)
    zcomp = buf.raw[:n]
    results["zstd_pure"] = _throughput(
        lambda c: zstd_codec.decompress_pure(c), zcomp, len(plain), 2.0
    )
    results["zstd_native"] = _throughput(
        lambda c: zstd_codec.decompress(c), zcomp, len(plain)
    )

    enc = ctypes.CDLL("libbrotlienc.so.1")
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    out = ctypes.create_string_buffer(len(plain) + 2048)
    m = ctypes.c_size_t(len(out))
    assert enc.BrotliEncoderCompress(5, 22, 0, len(plain), plain, ctypes.byref(m), out)
    bcomp = out.raw[: m.value]
    results["brotli_pure"] = _throughput(
        lambda c: brotli_codec.decompress_pure(c), bcomp, len(plain), 2.0
    )
    results["brotli_native"] = _throughput(
        lambda c: brotli_codec.decompress(c), bcomp, len(plain)
    )

    print(
        json.dumps(
            {
                "metric": "codec decode throughput (4 MB html-like corpus)",
                "unit": "MB/s",
                "codecs": {k: round(v, 2) for k, v in results.items()},
                "ratio_zstd": round(results["zstd_native"] / results["zstd_pure"], 1),
                "ratio_brotli": round(
                    results["brotli_native"] / results["brotli_pure"], 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
