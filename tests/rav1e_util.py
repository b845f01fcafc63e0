"""Shared test helper: mint AV1 streams for fixtures.

The actual encoder dispatch lives in pdf_parser_spark.av1_codec
(encode_av1_native — the system rav1e encoder through its opaque-pointer
C API); this module keeps the test-facing names and the deterministic
plane generator the codec tests share.
"""

from __future__ import annotations

import numpy as np

from pdf_parser_spark.av1_codec import (  # noqa: F401 (re-exports)
    encode_av1_native as encode_av1,
    have_native_encoder as have_rav1e,
)


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
