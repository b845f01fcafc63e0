"""AV1 codec — from-scratch OBU/metadata layer + native dispatch tests.

Correctness sources, mirroring test_vp8_codec/test_zstd_codec:
1. EMBEDDED fixture (runs without any codec library): a rav1e-encoded
   96x64 4:2:0 stream whose OBU walk, sequence-header fields, and frame
   classification are pinned against the encoder's known configuration;
   its decoded YUV stack is pinned by SHA-256 (AV1 reconstruction is
   normative, and the module's chroma upsample is deterministic).
2. CROSS-DECODER parity (skip-if-absent): the same streams decoded via
   dav1d and via libaom must be byte-identical — two independent
   implementations of the normative reconstruction agreeing also pins
   the empirically-derived ctypes struct offsets.
3. SOURCE closeness: near-lossless encodes (rav1e quantizer 0) must land
   within a tight bound of the pre-encode planes.
4. CARRIER plumbing: av1C build/parse round trip and out-of-band
   config_obus decode (the mp4/mkv/avif carriage) equal inline decode.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

import pdf_parser_spark.av1_codec as A
from rav1e_util import encode_av1, have_rav1e, planes_420

_FIXTURE_B64 = (
    "EgAKCgAAAPmW/+IQqEoy9hgQAk+RxP128bAACFQH1gAAAAAAACCCCAggiLS9QLnC8Og/2ED7"
    "qupyEFwKqrv/S66NIxiohPMpyXmi/sCzBED5okEJLJmJKZi868OFahcjF97midKfT2lER/MV"
    "iDK3o7c7qLN14DfeQvaWhP6zPBZASMeZyWy5HrpaTbQvIEweRwWWyKLwl53hDVHM5Algg0qw"
    "Hf6T2vxfTNKS1VU85lEdxTUpkjuQlZovq54Nmtt+CM/XOA/nIqcaod8vDDWOKI049l27YVWQ"
    "3mcXM5jRONoQli0UfZgVWPcB7yOQNhk2gPpsGTC6Fo2xU5AvL5CRTEu8F5o+Sp8DTwcenScf"
    "vBsPdbQVzuT8Psyrka9mjLz6uucCD4muFmlwbUv7LjUqpoG7YHKppxt9xuWCjrIqDl855qkH"
    "5IlUmSgtgsOnRsQaN43p5hqUJzHfWmxnmecfSQVaWJGlPa07k4x8enKMiLWMEoRrm49Oz+aU"
    "liQxTz0bILBJKc/Va0kqlrt7SzmHLIPSqL2dTa0BU/d3SHxpKTba4thjPOdgnFnthyHRckCd"
    "3nQvvLfuhfN18YASDRBriPs00SvVLCgedshAwwTRn9rdZUwl1z6gRjnfLx6AwSJPu8ZNfuXV"
    "w84WlFmzXwNg0JW7eI4HlKFhVHciueGniT2RkrcW/rRc/TlCsB7i9PkSt7szBoua1ieXYBrO"
    "Rt/PBfQU5KbO6V8FBCuNLdIhtfnYIgUZqSTHNJYeTE/lpwCW2QUixKFGSKtGOwwSS0h8Fxgm"
    "zi9dAPxWPzCe9ovQuGxl9X50ZBSyLpWtPFTzKn0G0Ul9uhHzhNwbLZV+/2Y2FJgQhKnNj1Db"
    "F7O+UUIEh57JlYpXgFtKiy5hpJziV4a1oNMdT+9t2JiRg8w192VsxXJWvVE48QS7biHupnPG"
    "bXlUHae8osuwrYkIQSiDTsvOXseI0oRxx64brR/X6UgdG6x1qhdn/Ad6r3gpOTj4vIzQSPMj"
    "9jcg2zS2f5BOSeOoAm1sA39N0ZZr9rwAinERsONve9HTtLccgmruuzIqEft9WL6kWje4b6X4"
    "KyEBuHL1UqsXQyUwTI0CXydqZ1uN9uvl3ei25acsaWdNmhStO1GcYyN6BBYmjXAA6CsYB569"
    "nLrlrdMFuztAPRTaroTe+XXdTNcVnZQYn6TQ1uDnzvSBZPoAH+3wBUaqUYmrlSmJyeWkjpiF"
    "0TdWSEoQp0WSpGCJXRjSnVmwENbY0Da99LoRegGgdrruXD/l8jAAcMqzozZYop/KSIXBWwcA"
    "VqedCNnXypxyHrqogrXe+jt3eVqansUHRswFgEcgAKWOxDr79qHHMhk930CUCA4wz1Lt3zes"
    "UtGP1PVZVA9/KHnoYjuSb4fDsBpmxif4Yr63KyGE6y5NUgPdjwZC3Oiv7+6qeXMLbBqWMMnc"
    "ZSer8p2P2fDR4YBFyqNF9hUhyHIcN0+pDJxJJZ8TCAq4vsLX8o0IQ6YoKVnEpWDIS6lpHAuN"
    "z2TQGfAEttuvZso6R4DVAa16emjE+TfqE5LFvE31uUv7FZH90IOC9G9lIQX/Uu3ghGcZrgZE"
    "5Z9qc1pxGmFtoyXfuSDbeRIdgYQJ+caRdu2owtIR/lZ5XMbLlSmkmdepLNim6gfzE9XwlXaa"
    "8HgnYSNEl2Dae6QkWctVom6PaDTs+snh14vtfiWlO/qmvptcAy5loIv4fa2+Ea9HvDPubyAF"
    "FUQQnnxd4qTC12Yke+bW0ocl5lDPyxu6l3lI7+f+S0L8wlMfUlRXscrSdiiOWIWm7tN3lNXC"
    "9odFBaw2vSacff5+J5dQo0JRQN4qc6R+BPGTT2LEY/FEwZjxLHFanXqw77XM3Dnm4tuW9r4f"
    "XMjm4s8Z/ESDlt3ULuvrQXyM3h7dgrPFzIAyIUeMyqQ78lX8oau5bqFt7GN/gqkjTUnvRUqn"
    "qtjJ0dGqCHnu5oyoSPi0zGfE26Z1vr7KRa0RNBUYQsTzSKOSLgv1sVnaxa01HxrLnjn6QsoX"
    "5fhnBiDK+hm5IAYeoxJMzytiuDLqzsytR/J/zJZMlev2dDsv+edLqjEXV3XZtdMTmcLsiQ5i"
    "LP61cG2HEF/yF3kb4KEvZmJ72O2XbQmj9M54TKIGO0i4DmHvu7ykUZymMoT/SrualIDiitXm"
    "o/Ws/stDnTd4dUs7mtoLD5zNYTVPWMfXv16zOm19IrBzCQe7lZ+2LN7jvyr9PGaai9U4HU9/"
    "h3xi8wB4l3Ilju+vCRX4MHtpQ1HZK2RWBZLMykqHMHRQEaRMvSf5m5yOesAJEapyCOYZx1kY"
    "+9ePjlchRXyyuQFo6mUHWM70ljImjqktShOXhKonzjXPtmFXSN+Jag+qUCrcmNbXToLlAs4a"
    "jRVBxRjI42g7SKknzxZSxznyLmWIMMqfyRTvAmf/id9ZLFoG7QscOy6OciFkSUDJsB372Dki"
    "EJwGLtAwZ3GxKCdK3X979lZsQ9uWOch1QozEuvrlMSOGy6t5yD8ugg/1ObNJKvxWrykqM7U6"
    "QpV6WuKtmHca8Ml02AjPQaDTB7J4ewS6121u8ASLvIWUPPyOunG4u8pkI2t04OaRCmJPdQdz"
    "wo0WtLNEnVGY+g0yYKgVdvsUHk3bQ2YUrxSHN8SnCq6VmnK74sLNQuYNEzVhzZRIaDQC/j6C"
    "YMiWzKL24vIsnWlWy1ohW5N2f5nX+tAPLuuZHL8d7HHi2P8XgAabTHQdy45Df3j0eD1FrywJ"
    "gc7wmfU8125ZGcz9gSUt0m5Xww5h1hOvAkAq3ZZf69bnh2VYgWZuNKvxNxuL9slXOLExRzD8"
    "xAg8cxQg3lHbns27PqAOT/PcpTBmxGByhZ7OFb1lpDKv2KyL/w8eQTIrNjUzBXkuIpsvlXB5"
    "bS6rFoVpV671rf6TxDpJiuVOAAUBJxCxZTGp3Jk0A4nA0LXd7SywYb0vNKKeOo1xZn4+GYLK"
    "2yN9Qg+SxlMiP4StsHp3CC0tkBB3fkvOCgedhgvtr//liNW0o/UKtB96d79IrtA84HZTnQok"
    "cs/8vbQkCI66e/3GWvFXfuEvxYWKRWB5a60fRzl1OYVt2T3UZ1Mdph7zf4Ur3A/UEyQRjLRw"
    "96KYQP67sGtJOBn6Jh3xVI2v7y5gmgU0jti+4bTSJ/eq7rcwoVPddDqQUYKhUCf7/C6eN7Bv"
    "Ysv6EZtmVqbo2GHqAKEwyNNFzvvo3QHEagAUf9C3RkgajjR4rqMgKVqT5Yjxe67c78SB6LHF"
    "lH1iAoCcAYOvYCbV/jg/V4c1bXa8wGkhlNFezOTghoaJ3IBem1fv4+KNXl3RSrwKcH3qkmMv"
    "CjzOJlkyN4WMHt1IWlEYSxW6IOk0BpBppPe7/oJZHzClrvx/d9E5LFXqO/SbIM8Dt8uqJBH6"
    "c4qEYBtvsP29xCHmZa5z9d+R1sdGPSl2Wahe6fo8TlWgyQeJLVcQDGpPRlBK5vsGhSGkK2Ro"
    "IqlEV9IBsyR1aSKGpMOesLmHHZYElT81GwTAN9bXIm8ERVrIWHiEzvp6DXy1t0whtgdRSsWa"
    "oczmpQPtjxw5KYd1wV8CGR6Rk2gH0Ndi9yRxIGUzui8hc2WWYG5bugg6ywX/Q6ETpOGbqXn2"
    "m8yf9N4/mPxlVCCLgKyL1X90k6vx4Y4QbNwtqmce7qrCmBMlmSLLUu+atKBfSxrwcLuM7rpk"
    "l518afYwjLESJvF0NacS6PtnKguqs+vqeciw9j7XrrWbnc6FsPI3CgOSIbx6NaSsAC4xuTQI"
    "ECpbwSCJlvqZR3iaZzg4pPzDAox6DoCLhq/p1VZuQvioC/A/QFQ0SMj+CRz18vOLhe6u7A5J"
    "r+jhlHtIk8HMrvK2HRwNoq1b3wPwY8tKUiMa3VAjOgb/Tq7Ji4dqNa95+vCcfVUGb38mvOzw"
    "0R05FMxyWprIOZzKWX3d+NOmttqUpnQjAHGlOWZnyVEHbRDi6PJE375A2gqAIv+K/YSfmERj"
    "bp/GSuBLj6CYFdZNdiHyjZc29JhoDlZ5c04WVZMt6IWmNtjE6Eq9ZPms3F2MwRNo37Yi2jxn"
    "LD0Q3rjpt0FHYNWn9HjXoSTgqGT6xI4BQvjwgdF7L6SU6LTbJe6b+0vYzC8TSIa0D9agVjiW"
    "fCEt5QPksAH7xtFzeAYvOdyFDAO4ThTxi8BuYmeR/xpDwYS20xpng9Uhk8Xl4pabAeWCnRMS"
    "zOBDWP7x392jvAzH2NEK6GwH1yLg0Ut8GYsPJhy+JQFh5aJvJUHydCy16C7+YfJRryKOPYt7"
    "QZSoRpL8GYJlrtWrQzAUmLLnV2uk"
)
_FIXTURE = base64.b64decode("".join(_FIXTURE_B64))
# sha256 of decode_av1(_FIXTURE).tobytes() — normative reconstruction +
# deterministic nearest upsample ⇒ a format constant
_FIXTURE_SHA = "c5e277c149ecfdf9a3c1f0549e6966936a1adef7fede81a5a4d326050360bf7e"

_HAVE_DAV1D = A._load_dav1d() is not None
_HAVE_AOM = A._load_aom() is not None

needs_decoder = pytest.mark.skipif(
    not (_HAVE_DAV1D or _HAVE_AOM), reason="no AV1 decoder library"
)
needs_both = pytest.mark.skipif(
    not (_HAVE_DAV1D and _HAVE_AOM), reason="need dav1d AND aom for parity"
)
needs_rav1e = pytest.mark.skipif(not have_rav1e(), reason="librav1e absent")


# ---------------------------------------------------------------------------
# pure OBU/metadata layer — no codec library involved
# ---------------------------------------------------------------------------


def test_embedded_obu_walk():
    obus = A.parse_obus(_FIXTURE)
    assert [o.type for o in obus] == [
        A.OBU_TEMPORAL_DELIMITER, A.OBU_SEQUENCE_HEADER, A.OBU_FRAME,
    ]
    assert obus[0].payload == b""
    assert sum(len(o.raw) for o in obus) == len(_FIXTURE)
    assert len(A.split_temporal_units(_FIXTURE)) == 1


def test_embedded_sequence_header_fields():
    seq = A.find_sequence_header(_FIXTURE)
    # every field pinned against the encoder's known configuration
    assert seq == {
        "seq_profile": 0,
        "still_picture": False,
        "reduced_still_picture_header": False,
        "max_width": 96,
        "max_height": 64,
        "bit_depth": 8,
        "mono_chrome": False,
        "subsampling_x": 1,
        "subsampling_y": 1,
        "color_primaries": 2,
        "transfer_characteristics": 2,
        "matrix_coefficients": 2,
        "color_range_full": True,
        "frame_id_numbers_present": False,
        "use_128x128_superblock": False,
        "enable_order_hint": True,
        "film_grain_params_present": False,
    }


def test_embedded_frame_types():
    fts = A.frame_types(_FIXTURE)
    assert fts == [
        {"frame_type": A.KEY_FRAME, "key": True,
         "show_frame": True, "show_existing": False}
    ]


def test_av1c_round_trip():
    av1c = A.build_av1c(_FIXTURE)
    rec = A.parse_av1c(av1c)
    assert rec["seq_profile"] == 0
    assert not rec["high_bitdepth"] and not rec["mono_chrome"]
    assert rec["chroma_subsampling_x"] == 1
    assert rec["chroma_subsampling_y"] == 1
    seq_obu = [o for o in A.parse_obus(_FIXTURE) if o.type == A.OBU_SEQUENCE_HEADER]
    assert rec["config_obus"] == seq_obu[0].raw
    # and the config parses back to the same sequence header
    assert A.find_sequence_header(rec["config_obus"]) == A.find_sequence_header(
        _FIXTURE
    )


def test_leb128_round_trip():
    for v in (0, 1, 127, 128, 300, 16383, 16384, 2**32 - 1):
        enc = A._leb128_bytes(v)
        got, pos = A._leb128(enc, 0)
        assert (got, pos) == (v, len(enc))
    with pytest.raises(ValueError, match="leb128"):
        A._leb128(b"\xff" * 9, 0)


@pytest.mark.parametrize(
    "bad,msg",
    [
        (b"\x80garbage", "forbidden bit"),
        (b"\x12\x00\x0a" + b"\xff" * 9, "leb128"),
        (b"\x0a\x7f" + b"x" * 4, "overruns"),
        (b"\x10", "without a size field"),
    ],
)
def test_malformed_obu_layer(bad, msg):
    with pytest.raises(ValueError, match=msg):
        A.parse_obus(bad)


def test_decode_rejects_junk_before_native():
    # these fail in the from-scratch layer — no decoder library touched
    with pytest.raises(ValueError, match="no OBUs"):
        A.decode_av1(b"")
    with pytest.raises(ValueError, match="no sequence header"):
        A.decode_av1(b"\x12\x00")  # lone temporal delimiter
    with pytest.raises(ValueError, match="unknown decoder"):
        A.decode_av1(_FIXTURE, decoder="bogus")


def test_parse_av1c_malformed():
    with pytest.raises(ValueError, match="shorter"):
        A.parse_av1c(b"\x81\x00")
    with pytest.raises(ValueError, match="marker"):
        A.parse_av1c(b"\x00\x00\x00\x00")


def test_frame_type_peek_requires_sequence_header():
    frame_only = b"".join(
        o.raw for o in A.parse_obus(_FIXTURE) if o.type == A.OBU_FRAME
    )
    with pytest.raises(ValueError, match="before any sequence header"):
        A.frame_types(frame_only)


# ---------------------------------------------------------------------------
# native reconstruction dispatch
# ---------------------------------------------------------------------------


@needs_decoder
def test_embedded_decode_pinned():
    arr = A.decode_av1(_FIXTURE)
    assert arr.shape == (1, 64, 96, 3) and arr.dtype == np.uint8
    assert hashlib.sha256(arr.tobytes()).hexdigest() == _FIXTURE_SHA


@needs_both
def test_embedded_cross_decoder_parity():
    assert np.array_equal(
        A.decode_av1(_FIXTURE, decoder="dav1d"),
        A.decode_av1(_FIXTURE, decoder="aom"),
    )


@needs_both
@needs_rav1e
@pytest.mark.parametrize(
    "h,w,n,q",
    [(64, 96, 1, 0), (64, 96, 4, 120), (47, 65, 1, 60), (96, 128, 2, 230)],
)
def test_cross_decoder_parity_territory(h, w, n, q):
    stream = encode_av1(planes_420(h, w, n), quantizer=q)
    d = A.decode_av1(stream, decoder="dav1d")
    a = A.decode_av1(stream, decoder="aom")
    assert d.shape == (n, h, w, 3)
    assert np.array_equal(d, a)
    assert len(A.split_temporal_units(stream)) == n
    assert all(f["key"] for f in A.frame_types(stream))


@needs_decoder
@needs_rav1e
def test_near_lossless_matches_source():
    frames = planes_420(64, 96, 1)
    stream = encode_av1(frames, quantizer=0)
    arr = A.decode_av1(stream)
    y, u, v = frames[0]
    dy = np.abs(arr[0, :, :, 0].astype(int) - y.astype(int)).max()
    assert dy <= 4, f"quantizer-0 Y drifted by {dy}"


@needs_both
@needs_rav1e
def test_chroma_444_and_monochrome():
    rng = np.random.default_rng(3)
    h, w = 48, 64
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h, w), dtype=np.uint8)
    v = rng.integers(0, 256, (h, w), dtype=np.uint8)
    st444 = encode_av1([(y, u, v)], quantizer=60, chroma=2)
    seq = A.find_sequence_header(st444)
    assert (seq["seq_profile"], seq["subsampling_x"], seq["subsampling_y"]) == (
        1, 0, 0,
    )
    assert np.array_equal(
        A.decode_av1(st444, decoder="dav1d"), A.decode_av1(st444, decoder="aom")
    )

    stmono = encode_av1([(y, None, None)], quantizer=60, chroma=3)
    seq = A.find_sequence_header(stmono)
    assert seq["mono_chrome"]
    d = A.decode_av1(stmono, decoder="dav1d")
    a = A.decode_av1(stmono, decoder="aom")
    assert np.array_equal(d, a)
    assert set(d[0, :, :, 1].ravel()) == {128}  # neutral chroma synthesized
    assert set(d[0, :, :, 2].ravel()) == {128}


@needs_decoder
@needs_rav1e
def test_out_of_band_config_obus():
    """The mp4/mkv/avif carriage: sequence header travels in av1C, sample
    data carries only frame OBUs — decode must equal the inline stream."""
    stream = encode_av1(planes_420(64, 96, 1), quantizer=60)
    rec = A.parse_av1c(A.build_av1c(stream))
    samples = b"".join(
        o.raw for o in A.parse_obus(stream) if o.type != A.OBU_SEQUENCE_HEADER
    )
    assert np.array_equal(
        A.decode_av1(stream),
        A.decode_av1(samples, config_obus=rec["config_obus"]),
    )


@needs_rav1e
def test_high_bitdepth_metadata_parses_but_decode_gates():
    rng = np.random.default_rng(5)
    h, w = 32, 48
    y = rng.integers(0, 1024, (h, w)).astype("<u2")
    u = rng.integers(0, 1024, (h // 2, w // 2)).astype("<u2")
    v = rng.integers(0, 1024, (h // 2, w // 2)).astype("<u2")
    st10 = encode_av1([(y, u, v)], quantizer=60, bit_depth=10)
    seq = A.find_sequence_header(st10)
    assert (seq["bit_depth"], seq["max_width"], seq["max_height"]) == (10, w, h)
    with pytest.raises(NotImplementedError, match="10-bit"):
        A.decode_av1(st10)


def test_native_decoder_name_reports_reality():
    name = A.native_decoder_name()
    if _HAVE_DAV1D:
        assert name == "dav1d"
    elif _HAVE_AOM:
        assert name == "aom"
    else:
        assert name is None


def test_obu_fuzz_never_crashes():
    """Adversarial bytes must surface as the typed error family only."""
    rng = np.random.default_rng(11)
    for i in range(200):
        blob = rng.integers(0, 256, rng.integers(1, 64)).astype(np.uint8).tobytes()
        try:
            A.parse_obus(blob)
        except ValueError:
            pass
    # bit-flipped real stream: valid OBU walk may survive, decode may
    # reject — but only ever with the typed errors
    for i in range(40):
        mut = bytearray(_FIXTURE)
        mut[rng.integers(0, len(mut))] ^= 1 << rng.integers(0, 8)
        try:
            A.decode_av1(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# container carriage — mp4 (av01 + av1C) and mkv/webm (V_AV1 + CodecPrivate)
# ---------------------------------------------------------------------------


@needs_decoder
@needs_rav1e
def test_mp4_av1_carriage():
    from pdf_parser_spark import mp4_demux

    stream = encode_av1(planes_420(64, 96, 4), quantizer=60)
    blob = mp4_demux.encode_mp4_av1(stream)
    track = mp4_demux.demux_mp4(blob)
    assert (track.codec, track.width, track.height) == ("av01", 96, 64)
    assert len(track.samples) == 4 and all(s.is_sync for s in track.samples)
    assert track.codec_config is not None
    assert A.parse_av1c(track.codec_config)["seq_profile"] == 0
    assert np.array_equal(mp4_demux.decode_mp4(blob), A.decode_av1(stream))


@needs_decoder
@needs_rav1e
@pytest.mark.parametrize("doctype", ["matroska", "webm"])
def test_mkv_av1_carriage(doctype):
    from pdf_parser_spark import mkv_demux

    stream = encode_av1(planes_420(48, 64, 3), quantizer=80)
    blob = mkv_demux.encode_mkv_av1(stream, doctype=doctype)
    track = mkv_demux.demux_mkv(blob)
    assert track.codec == "V_AV1" and track.codec_private is not None
    assert [f.is_key for f in track.frames] == [True, True, True]
    assert np.array_equal(mkv_demux.decode_mkv(blob), A.decode_av1(stream))


def test_av1_track_without_config_raises():
    from pdf_parser_spark import mkv_demux, mp4_demux
    import numpy as _np

    # replace ALL 'raw ' occurrences: the first is the hdlr name ("raw
    # video", cosmetic), the second the stsd sample-entry fourcc
    raw_mp4 = mp4_demux.encode_mp4_raw(
        _np.zeros((1, 8, 8, 3), _np.uint8)
    ).replace(b"raw ", b"av01")
    with pytest.raises(ValueError, match="av1C"):
        mp4_demux.decode_mp4(raw_mp4)
    # mkv: same-length CodecID swap keeps every element size intact
    raw_mkv = mkv_demux.encode_mkv_raw(
        _np.zeros((1, 8, 8, 3), _np.uint8)
    ).replace(b"V_UNCOMPRESSED", b"V_AV1" + b"\x00" * 9, 1)
    assert mkv_demux.demux_mkv(raw_mkv).codec == "V_AV1"
    with pytest.raises(ValueError, match="CodecPrivate"):
        mkv_demux.decode_mkv(raw_mkv)
