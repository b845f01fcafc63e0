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

    # lossy VP8 (image): pure RFC 6386 decoder vs libwebp, measured in
    # megapixels/s on a 160x128 libwebp-encoded frame
    import numpy as np

    from pdf_parser_spark import vp8_codec

    webp = ctypes.CDLL("libwebp.so.7")
    webp.WebPEncodeRGB.restype = ctypes.c_size_t
    webp.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    webp.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    rng = np.random.default_rng(7)
    h, w = 128, 160
    base = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w]
    img = np.clip(img + rng.integers(-6, 7, (h, w, 3)), 0, 255).astype(np.uint8)
    pout = ctypes.POINTER(ctypes.c_uint8)()
    nb = webp.WebPEncodeRGB(img.tobytes(), w, h, w * 3, 75.0, ctypes.byref(pout))
    blob = ctypes.string_at(pout, nb)
    # locate the VP8 chunk
    pos, payload = 12, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            payload = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    mpix = w * h / (1 << 20)

    def _native_yuv(b: bytes) -> None:
        wv, hv = ctypes.c_int(), ctypes.c_int()
        u = ctypes.POINTER(ctypes.c_uint8)()
        v = ctypes.POINTER(ctypes.c_uint8)()
        s1, s2 = ctypes.c_int(), ctypes.c_int()
        webp.WebPFree(
            webp.WebPDecodeYUV(b, len(b), ctypes.byref(wv), ctypes.byref(hv),
                               ctypes.byref(u), ctypes.byref(v),
                               ctypes.byref(s1), ctypes.byref(s2))
        )

    results["vp8_pure_mpix"] = _throughput(
        lambda c: vp8_codec.decode_vp8(c), payload, int(mpix * (1 << 20)), 2.0
    )
    results["vp8_native_mpix"] = _throughput(_native_yuv, blob, int(mpix * (1 << 20)))

    # AV1: no pure reconstruction exists here (declared out of
    # from-scratch scope) — measure the two system decoders the dispatch
    # chooses between, through the full decode_av1 path (from-scratch OBU
    # layer included), to justify preferring dav1d
    from pdf_parser_spark import av1_codec

    if av1_codec.have_native_encoder():
        planes = [(img[:, :, 0], img[::2, ::2, 1], img[::2, ::2, 2])]
        av1_stream = av1_codec.encode_av1_native(planes, quantizer=80)
        for name in ("dav1d", "aom"):
            try:
                results[f"av1_{name}_mpix"] = _throughput(
                    lambda c, n=name: av1_codec.decode_av1(c, decoder=n),
                    av1_stream, int(mpix * (1 << 20)),
                )
            except NotImplementedError:
                pass

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
                "ratio_vp8": round(
                    results["vp8_native_mpix"] / results["vp8_pure_mpix"], 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
