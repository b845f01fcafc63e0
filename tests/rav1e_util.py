"""Shared test helper: encode AV1 streams with the system rav1e encoder.

rav1e's C API is opaque-pointer + string-keyed config — the most
ctypes-friendly AV1 encoder in this container — so the AV1/AVIF tests use
it to mint real bitstreams on the fly (the same in-test-native-oracle
pattern as test_vp8_codec's libwebp harness). Everything here is
skip-if-absent: tests guard on ``have_rav1e()``.

frames: list of (y, u, v) uint8 planes; u/v are None for monochrome.
chroma: 0=4:2:0, 1=4:2:2, 2=4:4:4, 3=monochrome (rav1e's RaChromaSampling).
"""

from __future__ import annotations

import ctypes as C

import numpy as np

_LIB: C.CDLL | None | bool = False


def _lib() -> C.CDLL | None:
    global _LIB
    if _LIB is False:
        _LIB = None
        try:
            r = C.CDLL("librav1e.so.0")
        except OSError:
            return None
        r.rav1e_config_default.restype = C.c_void_p
        r.rav1e_config_parse_int.argtypes = [C.c_void_p, C.c_char_p, C.c_int]
        r.rav1e_config_set_pixel_format.argtypes = [
            C.c_void_p, C.c_uint8, C.c_int, C.c_int, C.c_int,
        ]
        r.rav1e_config_unref.argtypes = [C.c_void_p]
        r.rav1e_context_new.restype = C.c_void_p
        r.rav1e_context_new.argtypes = [C.c_void_p]
        r.rav1e_context_unref.argtypes = [C.c_void_p]
        r.rav1e_frame_new.restype = C.c_void_p
        r.rav1e_frame_new.argtypes = [C.c_void_p]
        r.rav1e_frame_unref.argtypes = [C.c_void_p]
        r.rav1e_frame_fill_plane.argtypes = [
            C.c_void_p, C.c_int, C.c_char_p, C.c_size_t, C.c_ssize_t, C.c_int,
        ]
        r.rav1e_send_frame.argtypes = [C.c_void_p, C.c_void_p]
        r.rav1e_receive_packet.argtypes = [C.c_void_p, C.POINTER(C.c_void_p)]
        r.rav1e_packet_unref.argtypes = [C.c_void_p]
        _LIB = r
    return _LIB  # type: ignore[return-value]


def have_rav1e() -> bool:
    return _lib() is not None


def encode_av1(
    frames: list[tuple],
    quantizer: int = 80,
    chroma: int = 0,
    speed: int = 10,
    bit_depth: int = 8,
    all_key: bool = True,
) -> bytes:
    """Encode frames → a low-overhead AV1 OBU stream (concatenated TUs).

    all_key=True pins key_frame_interval=1 so decode order == display
    order (no alt-ref reordering) — what deterministic tests want.
    """
    r = _lib()
    if r is None:
        raise RuntimeError("librav1e not loadable (guard with have_rav1e)")
    h, w = frames[0][0].shape
    cfg = r.rav1e_config_default()
    pairs = [(b"width", w), (b"height", h), (b"speed", speed),
             (b"quantizer", quantizer), (b"threads", 2)]
    if all_key:
        pairs.append((b"key_frame_interval", 1))
    for k, v in pairs:
        assert r.rav1e_config_parse_int(cfg, k, v) == 0, k
    assert r.rav1e_config_set_pixel_format(cfg, bit_depth, chroma, 0, 1) == 0
    ctx = r.rav1e_context_new(cfg)
    assert ctx, "rav1e_context_new failed"
    r.rav1e_config_unref(cfg)
    try:
        bw = 2 if bit_depth > 8 else 1
        for y, u, v in frames:
            f = r.rav1e_frame_new(ctx)
            r.rav1e_frame_fill_plane(
                f, 0, y.tobytes(), y.nbytes, y.shape[1] * bw, bw
            )
            if chroma != 3:
                r.rav1e_frame_fill_plane(
                    f, 1, u.tobytes(), u.nbytes, u.shape[1] * bw, bw
                )
                r.rav1e_frame_fill_plane(
                    f, 2, v.tobytes(), v.nbytes, v.shape[1] * bw, bw
                )
            assert r.rav1e_send_frame(ctx, f) == 0
            r.rav1e_frame_unref(f)
        assert r.rav1e_send_frame(ctx, None) == 0  # flush
        out = []
        while True:
            pkt = C.c_void_p()
            st = r.rav1e_receive_packet(ctx, C.byref(pkt))
            if st == 0 and pkt.value:
                p = C.cast(pkt, C.POINTER(C.c_uint64))
                out.append(C.string_at(p[0], p[1]))
                r.rav1e_packet_unref(pkt)
            elif st in (1, 2):  # NeedMoreData / EnoughData
                continue
            elif st == 3:  # LimitReached
                break
            else:
                raise AssertionError(f"rav1e status {st}")
    finally:
        r.rav1e_context_unref(ctx)
    return b"".join(out)


def planes_420(h: int, w: int, n: int = 1, seed: int = 7) -> list[tuple]:
    """Deterministic gradient-Y + noise-chroma 4:2:0 test frames."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y = (
            (np.arange(w)[None, :] * (i + 2) + np.arange(h)[:, None] * 3) % 256
        ).astype(np.uint8)
        u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        out.append((y, u, v))
    return out
