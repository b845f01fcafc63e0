"""FLAC codec (RFC 9639) — pure round-trip tests.

No FLAC library exists in this container, so the encoder is the
decoder's oracle by construction: it deliberately spans the decoder's
surface (constant / verbatim / fixed / LPC subframes, independent vs
left-side vs mid-side stereo, adaptive rice parameters, CRC-8/CRC-16,
the stream MD5) and every encoded stream must decode byte-identically.
Integrity machinery is additionally tested by tampering: flipped bits
must fail the right check loudly.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark import flac_codec as F


def _sine(n=20000, amp=10000, step=0.03):
    return (amp * np.sin(np.arange(n) * step)).astype(np.int16)


def _roundtrip(pcm, rate=16000):
    blob = F.encode_flac(pcm, rate)
    back, r = F.decode_flac(blob)
    want = (pcm if pcm.ndim == 2 else pcm[:, None]).astype(np.int32)
    assert r == rate
    assert np.array_equal(back, want)
    return blob


def test_roundtrip_mono_shapes():
    rng = np.random.default_rng(2)
    _roundtrip(_sine())
    _roundtrip(np.zeros(9000, dtype=np.int16))  # constant subframes
    _roundtrip(rng.integers(-32768, 32767, size=12000).astype(np.int16))  # verbatim
    _roundtrip(np.linspace(-30000, 30000, 10000).astype(np.int16))  # fixed
    _roundtrip(np.array([7], dtype=np.int16))
    _roundtrip(np.array([5, -3, 100], dtype=np.int16))


def test_roundtrip_stereo_modes():
    rng = np.random.default_rng(3)
    sine = _sine()
    # correlated channels -> mid/side or left/side chosen
    st = np.stack([sine, (sine * 0.7).astype(np.int16)], axis=-1).astype(np.int16)
    _roundtrip(st, 44100)
    # independent noise -> independent mode
    _roundtrip(rng.integers(-2000, 2000, size=(15000, 2)).astype(np.int16), 48000)
    # force left/side profitability: right = left + tiny noise
    left = sine[:8000]
    right = left + rng.integers(-3, 3, size=8000).astype(np.int16)
    _roundtrip(np.stack([left, right], axis=-1).astype(np.int16), 32000)


def test_lpc_path_used_and_roundtrips():
    # a resonant signal where LPC beats fixed predictors
    n = 12000
    x = np.zeros(n)
    for k, (f, a) in enumerate([(0.011, 9000), (0.037, 4000), (0.093, 1500)]):
        x += a * np.sin(np.arange(n) * f + k)
    pcm = x.astype(np.int16)
    kind, _ = F._subframe_plan(pcm[:4096], 16)
    assert kind == "lpc"
    _roundtrip(pcm, 22050)


def test_odd_sample_rate_and_multichannel():
    rng = np.random.default_rng(4)
    _roundtrip(_sine(5000), 12345)  # sr escapes to the 16-bit field
    four = rng.integers(-500, 500, size=(6000, 4)).astype(np.int16)
    _roundtrip(four, 8000)


def test_crc_and_md5_detect_corruption():
    blob = bytearray(F.encode_flac(_sine(6000)))
    # flip a bit inside the first frame's payload (past 4+4+34 metadata)
    blob[60] ^= 0x10
    with pytest.raises(F.FlacError):
        F.decode_flac(bytes(blob))
    # tamper with the stored MD5: frames pass, stream check fails
    blob2 = bytearray(F.encode_flac(_sine(6000)))
    blob2[4 + 4 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(F.FlacError, match="MD5"):
        F.decode_flac(bytes(blob2))
    assert F.decode_flac(bytes(blob2), verify_md5=False)


def test_not_flac_raises():
    with pytest.raises(F.FlacError):
        F.decode_flac(b"RIFFnope")


def test_utf8_coded_numbers_roundtrip():
    for v in [0, 1, 127, 128, 2047, 2048, 65535, (1 << 20), (1 << 31)]:
        enc = F._utf8_coded(v)
        br = F._Bits(enc)
        assert F._read_utf8_coded(br) == v, v
