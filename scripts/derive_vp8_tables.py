"""Derive the RFC 6386 VP8 constant tables from the shipped libwebp.

RFC 6386 publishes the VP8 decoder's constant tables verbatim (Section
13.4 coeff update probs, 13.5 default coeff probs, 11.5 keyframe B-mode
probs, 14.1 quantizer lookups).  Typing 2,000+ byte-constants by hand is
error-prone, so — following the repo's established pattern for the
brotli transform table and the VP8L distance map — this script locates
each table inside the container's libwebp shared object by its leading
RFC-published anchor bytes and dumps the full table as Python literals.
`tests/test_vp8_codec.py` re-derives them whenever libwebp is present,
so the embedded constants in `pdf_parser_spark/vp8_tables.py` cannot
drift from the normative values.

Run:  python scripts/derive_vp8_tables.py > /tmp/vp8_tables_dump.py
"""

from __future__ import annotations

import ctypes.util
import struct
import sys

# RFC 6386 anchor rows (the first published entries of each table).
COEFF_PROBS_ANCHOR = bytes(
    [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]
)  # RFC 6386 §13.5, block type 0 / band 0 / ctx 0
COEFF_UPDATE_ANCHOR = bytes(
    [176, 246] + [255] * 9 + [223, 241, 252]
)  # RFC 6386 §13.4, block type 0 / band 1 rows
KF_BMODE_ANCHOR = bytes(
    [231, 120, 48, 89, 115, 113, 120, 152, 112]
)  # RFC 6386 §11.5, above=B_DC_PRED / left=B_DC_PRED
# RFC 6386 §14.1: ac_qlookup is stored as uint16 (max 284); dc_qlookup
# (max 157) is stored as uint8 immediately after it in this build.
AC_Q_ANCHOR = struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11)
DC_Q_ANCHOR = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17])


def _find_lib() -> bytes:
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        for root in ("/lib/x86_64-linux-gnu/", "/usr/lib/x86_64-linux-gnu/",
                     "/usr/lib/", ""):
            try:
                with open(root + name, "rb") as f:
                    return f.read()
            except OSError:
                continue
    raise SystemExit("libwebp not found on this host")


def _find_all(blob: bytes, anchor: bytes) -> list[int]:
    out, i = [], blob.find(anchor)
    while i != -1:
        out.append(i)
        i = blob.find(anchor, i + 1)
    return out


def derive_tables(blob: bytes | None = None) -> dict:
    """Locate and extract every table; raises if an anchor is ambiguous
    in a way that yields different table bytes."""
    if blob is None:
        blob = _find_lib()

    def grab(anchor: bytes, back: int, size: int, what: str) -> bytes:
        hits = _find_all(blob, anchor)
        if not hits:
            raise SystemExit(f"{what}: anchor not found")
        tables = {blob[h - back : h - back + size] for h in hits}
        if len(tables) != 1:
            raise SystemExit(f"{what}: {len(hits)} anchors disagree")
        return next(iter(tables))

    # Both anchors are the first NON-TRIVIAL cell: block-type 0's band 0
    # covers coefficient position 0, which type-0 blocks (Y after Y2,
    # first coeff index 1) never decode, so the RFC's published band-0
    # cell is uniform (128s in the default table, 255s in the update
    # table) and the table object begins 33 bytes before the anchor.
    coeff_probs = grab(COEFF_PROBS_ANCHOR, 33, 4 * 8 * 3 * 11, "coeff_probs")
    coeff_update = grab(COEFF_UPDATE_ANCHOR, 33, 4 * 8 * 3 * 11, "coeff_update")
    if coeff_probs[:33] != bytes([128] * 33) or coeff_update[:33] != bytes(
        [255] * 33
    ):
        raise SystemExit("type-0 band-0 cells are not the RFC's uniform rows")
    kf_bmode = grab(KF_BMODE_ANCHOR, 0, 10 * 10 * 9, "kf_bmode_prob")
    # libwebp's internal B-mode enum permutes RFC 6386's (libwebp:
    # B_RD=4, B_VR=5, B_LD=6; RFC: B_LD=4, B_RD=5, B_VR=6), and
    # kBModesProba is indexed by libwebp's enum.  Re-index rows and
    # columns into RFC order (the 9 per-row node probs are positional
    # and unaffected).  [0][0] anchors identically because indices 0-3
    # coincide; the swap is observable from uniform-B_LD/B_RD/B_VR
    # test frames, which decode wrong without it.
    PERM = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC index -> libwebp index

    def kb_cell(a: int, l: int) -> list[int]:
        off = (PERM[a] * 10 + PERM[l]) * 9
        return list(kf_bmode[off : off + 9])
    dc_q = list(grab(DC_Q_ANCHOR, 0, 128, "dc_qlookup"))
    ac_q = list(struct.unpack("<128H", grab(AC_Q_ANCHOR, 0, 256, "ac_qlookup")))
    if dc_q[-1] != 157 or ac_q[-1] != 284:
        raise SystemExit(
            f"quant table tails {dc_q[-1]}/{ac_q[-1]} != RFC's 157/284"
        )
    return {
        "COEFF_PROBS": [
            [
                [
                    list(coeff_probs[((i * 8 + j) * 3 + k) * 11 :][:11])
                    for k in range(3)
                ]
                for j in range(8)
            ]
            for i in range(4)
        ],
        "COEFF_UPDATE_PROBS": [
            [
                [
                    list(coeff_update[((i * 8 + j) * 3 + k) * 11 :][:11])
                    for k in range(3)
                ]
                for j in range(8)
            ]
            for i in range(4)
        ],
        "KF_BMODE_PROBS": [
            [kb_cell(a, l) for l in range(10)] for a in range(10)
        ],
        "DC_QLOOKUP": dc_q,
        "AC_QLOOKUP": ac_q,
    }


if __name__ == "__main__":
    t = derive_tables()
    for name, val in t.items():
        sys.stdout.write(f"{name} = {val!r}\n\n")
