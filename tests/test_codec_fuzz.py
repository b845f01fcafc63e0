"""Mutation fuzz across every from-scratch decoder.

A 100 TB crawl guarantees malformed payloads; decoders must degrade to a
TYPED error (their own *Error subclass of ValueError, or
NotImplementedError at a declared gate), never an unhandled IndexError /
KeyError / ZeroDivisionError / struct.error / numpy fault, and never
hang. Each codec gets deterministic seeded mutations of a valid stream:
single-byte flips, truncations, and short splices. Decodes that still
SUCCEED are fine (many flips land in don't-care bytes); what is asserted
is the failure MODE and a wall-clock bound per call.
"""

from __future__ import annotations

import signal
import zlib
from contextlib import contextmanager

import numpy as np
import pytest


@contextmanager
def _deadline(seconds: int):
    def _boom(signum, frame):
        raise TimeoutError("decoder exceeded fuzz deadline")

    old = signal.signal(signal.SIGALRM, _boom)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _mutations(base: bytes, rng: np.random.Generator, n: int):
    yield b""
    yield base[: len(base) // 2]
    for _ in range(n):
        kind = rng.integers(0, 3)
        buf = bytearray(base)
        if kind == 0 and buf:  # flip one byte
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
        elif kind == 1 and buf:  # truncate
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:  # splice random bytes into the middle
            i = int(rng.integers(0, len(buf) + 1))
            junk = bytes(rng.integers(0, 256, size=int(rng.integers(1, 9)), dtype=np.uint8))
            buf = buf[:i] + junk + buf[i:]
        yield bytes(buf)


def _fuzz(decode, base: bytes, allowed: tuple, seed: int, rounds: int = 150):
    rng = np.random.default_rng(seed)
    crashes = []
    for i, mut in enumerate(_mutations(base, rng, rounds)):
        try:
            with _deadline(20):
                decode(mut)
        except allowed:
            pass
        except TimeoutError:
            crashes.append((i, "TIMEOUT"))
        except Exception as exc:  # noqa: BLE001 — the point of the test
            crashes.append((i, f"{type(exc).__name__}: {exc}"))
        if len(crashes) >= 5:
            break
    assert not crashes, crashes


def test_fuzz_zstd():
    from pdf_parser_spark import zstd_codec as Z

    base = Z.compress(b"the quick brown fox " * 400, level="lz")
    _fuzz(lambda b: Z.decompress_pure(b, max_output=1 << 22), base, (Z.ZstdError,), 1)


def test_fuzz_brotli():
    from pdf_parser_spark import brotli_codec as B

    base = B.compress(b"payload bytes for the brotli fuzzer " * 200)
    _fuzz(lambda b: B.decompress_pure(b, max_output=1 << 22), base, (B.BrotliError,), 2)


def test_fuzz_webp():
    from pdf_parser_spark import webp_codec as W

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(24, 31, 4), dtype=np.uint8)
    base = W.encode_webp_lossless(img)
    _fuzz(W.decode_webp, base, (W.WebpError, NotImplementedError), 3)


def test_fuzz_flac():
    from pdf_parser_spark import flac_codec as F

    pcm = (9000 * np.sin(np.arange(8000) * 0.02)).astype(np.int16)
    base = F.encode_flac(pcm, 16000)
    _fuzz(F.decode_flac, base, (F.FlacError,), 4)


def test_fuzz_bmp_and_ico():
    from pdf_parser_spark import bmp_codec as B

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 4), dtype=np.uint8)
    _fuzz(B.decode_bmp, B.encode_bmp(img), (B.BmpError,), 5)
    _fuzz(B.decode_ico, B.encode_ico([img[:16, :16]]), (B.BmpError, ValueError), 6)


def test_fuzz_tiff():
    from pdf_parser_spark import tiff_codec as T

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(19, 27, 3), dtype=np.uint8)
    base = T.encode_tiff(img, compression="lzw")
    _fuzz(T.decode_tiff, base, (T.TiffError,), 7)


def test_fuzz_warc_record_stream():
    """The WARC reader itself must swallow arbitrary corruption (its
    contract: keep what parsed, never raise)."""
    from pdf_parser_spark.sources import warc

    pages = [("https://x.example/p", "2026-01-01T00:00:00Z",
              b"<html>" + b"y" * 500 + b"</html>")] * 3
    for comp in ("gzip", "zstd", "none"):
        base = warc.write_warc(pages, compression=comp)
        rng = np.random.default_rng(8)
        for mut in _mutations(base, rng, 80):
            with _deadline(20):
                rows = list(warc.warc_to_page_rows(mut))
            assert isinstance(rows, list)


def test_fuzz_png_jpeg_gif():
    from pdf_parser_spark import gif_codec, jpeg_codec, media_codecs

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)
    pal_img = np.stack([(np.arange(16 * 20).reshape(16, 20) % 7).astype(np.uint8) * 30] * 3, axis=-1)
    _fuzz(media_codecs.decode_png, media_codecs.encode_png(img), (ValueError,), 10)
    _fuzz(jpeg_codec.decode_jpeg, jpeg_codec.encode_jpeg(img), (ValueError,), 11)
    _fuzz(
        jpeg_codec.decode_jpeg,
        jpeg_codec.encode_jpeg_progressive(img),
        (ValueError,),
        12,
    )
    _fuzz(gif_codec.decode_gif, gif_codec.encode_gif(pal_img), (ValueError,), 13)


def test_fuzz_wav_y4m_containers():
    from pdf_parser_spark import media_codecs, mkv_demux, mp4_demux

    rng = np.random.default_rng(1)
    pcm = (5000 * np.sin(np.arange(4000) * 0.05)).astype(np.int16)
    frames = rng.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    _fuzz(media_codecs.decode_wav, media_codecs.encode_wav(pcm), (ValueError,), 14)
    _fuzz(media_codecs.decode_y4m, media_codecs.encode_y4m(frames), (ValueError,), 15)
    _fuzz(
        mp4_demux.decode_mp4,
        mp4_demux.encode_mp4_raw(frames),
        (ValueError, NotImplementedError),
        16,
    )
    _fuzz(
        mkv_demux.decode_mkv,
        mkv_demux.encode_mkv_raw(frames),
        (ValueError, NotImplementedError),
        17,
    )


def test_fuzz_av1_layers():
    """OBU walk + container carriage + native decode under mutation: the
    from-scratch layer must fail typed, and bad bytes that survive into
    the native decoder must come back as the codec's ValueError family,
    never a segfaulting struct misread."""
    import base64

    from pdf_parser_spark import av1_codec as A

    from test_av1_codec import _FIXTURE  # embedded rav1e stream

    _fuzz(A.parse_obus, _FIXTURE, (ValueError,), 4)
    if A.native_decoder_name() is not None:
        _fuzz(A.decode_av1, _FIXTURE, (ValueError, NotImplementedError), 5)


def test_fuzz_avif_heic_items():
    from pdf_parser_spark import avif_codec as AV
    from pdf_parser_spark import heif_codec as HC

    from test_avif_codec import _ALPHA as _AVIF_ALPHA
    from test_avif_codec import _FOREIGN
    from test_heif_codec import _ALPHA as _HEIC_ALPHA
    from test_heif_codec import _GRID, _PLAIN

    _fuzz(AV.parse_avif, _FOREIGN, (ValueError, NotImplementedError), 6)
    _fuzz(AV.parse_avif, _AVIF_ALPHA, (ValueError, NotImplementedError), 11,
          rounds=60)
    _fuzz(HC.parse_heic, _HEIC_ALPHA, (ValueError, NotImplementedError), 12,
          rounds=60)
    _fuzz(HC.parse_heic, _PLAIN, (ValueError, NotImplementedError), 7)
    _fuzz(HC.parse_heic, _GRID, (ValueError, NotImplementedError), 8)
    if AV.av1_codec.native_decoder_name() is not None:
        _fuzz(AV.decode_avif, _FOREIGN, (ValueError, NotImplementedError), 9)
    if HC.have_native_codec()[0]:
        _fuzz(HC.decode_heic, _PLAIN, (ValueError, NotImplementedError), 10)


def test_fuzz_media_probe():
    """The triage probe sees raw crawl bytes before anything else — it
    must be unconditionally crash-free across every format family."""
    from pdf_parser_spark import media_probe
    from pdf_parser_spark.operators import multimodal as mm

    for i in (0, 3, 6, 9, 12, 15, 18, 24, 30, 1, 4, 2, 5, 8, 11, 14, 17):
        kind = ("image", "audio", "video")[i % 3]
        base, _ = mm._real_payload(i, kind)
        _fuzz(
            media_probe.probe_bytes, base,
            (ValueError, NotImplementedError), 100 + i, rounds=12,
        )
