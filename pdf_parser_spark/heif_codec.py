"""HEIC: from-scratch HEIF item/hvcC layer + libheif reconstruction.

HEIC is the HEVC sibling of AVIF — the SAME ISO-BMFF *item* structure
(meta/pitm/iinf/iloc/iprp, parsed from scratch in avif_codec.py and
reused here) carrying an HEVC still frame ('hvc1' item + 'hvcC'
HEVCDecoderConfigurationRecord) instead of an AV1 one. iPhones shoot it
by default, so a web crawl sees plenty.

Provenance split, same honesty line as av1_codec:

- **Container / hvcC layer — from scratch.** Brand sniff, the whole item
  walk (shared with avif_codec), and the hvcC record parse (profile /
  tier / level, chroma format, bit depths, the VPS/SPS/PPS NAL arrays)
  per the public ISO/IEC 14496-15 layout — identification and metadata
  with no native library.

- **Reconstruction — native dispatch.** An HEVC decoder is out of
  from-scratch scope and, unlike AV1, this container has only ONE
  in-container implementation (libheif → libde265), so there is no
  cross-decoder oracle; tests rely on container-field exactness, a
  pinned foreign fixture (HEVC reconstruction is normative, so the
  decoded planes of a fixed bitstream are constants), and encode→decode
  closeness on smooth content (the bundled x265 plugin's lossless flag
  is a no-op in this libheif build, so bit-exact round trips are not
  available). ``decode_heic`` hands libheif the whole file and asks for
  interleaved RGB — the YUV→RGB step is libheif's own, not ours.
  Handles carrying an alpha aux image decode to RGBA (libheif
  composes the aux plane); opaque files stay RGB. Without libheif it
  raises NotImplementedError, the usual gate.

These are CODECS, not a DataFrame API: operators/multimodal.py calls
them inside its Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import ctypes
import os
import struct
import tempfile

import numpy as np

from pdf_parser_spark.avif_codec import (
    _find_idat,
    _fullbox,
    _parse_iinf,
    _parse_iloc,
    _parse_iprp,
    _resolve_extents,
)
from pdf_parser_spark.media_codecs import format_boundary
from pdf_parser_spark.mp4_demux import _iter_boxes

__all__ = [
    "is_heic",
    "parse_heic",
    "parse_hvcc",
    "decode_heic",
    "encode_heic_native",
    "compose_heic_grid",
    "have_native_codec",
]

_HEIC_BRANDS = {b"heic", b"heix", b"hevc", b"hevx", b"heim", b"heis"}


def is_heic(data: bytes) -> bool:
    """ftyp sniff: any HEVC-image brand (major or compatible)."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        return False
    size = struct.unpack_from(">I", data, 0)[0]
    if size < 16 or size > len(data):
        return False
    brands = {data[8:12]} | {data[i:i + 4] for i in range(16, size, 4)}
    return bool(brands & _HEIC_BRANDS)


@format_boundary("hvcC record")
def parse_hvcc(body: bytes) -> dict:
    """HEVCDecoderConfigurationRecord → the identification fields + NAL
    arrays (ISO/IEC 14496-15 §8.3.3.1 layout, public spec)."""
    if len(body) < 23:
        raise ValueError("hvcC record shorter than 23 bytes")
    if body[0] != 1:
        raise ValueError(f"hvcC configurationVersion {body[0]} != 1")
    arrays: dict[int, list[bytes]] = {}
    pos = 23
    for _ in range(body[22]):  # numOfArrays
        nal_type = body[pos] & 0x3F
        count = struct.unpack_from(">H", body, pos + 1)[0]
        pos += 3
        units = []
        for _ in range(count):
            ln = struct.unpack_from(">H", body, pos)[0]
            units.append(body[pos + 2:pos + 2 + ln])
            pos += 2 + ln
        arrays[nal_type] = units
    if pos > len(body):
        raise ValueError("hvcC NAL arrays overrun the record")
    return {
        "profile_space": body[1] >> 6,
        "tier": (body[1] >> 5) & 1,
        "profile_idc": body[1] & 0x1F,
        "level_idc": body[12],
        "chroma_format": body[16] & 0x03,
        "bit_depth_luma": (body[17] & 0x07) + 8,
        "bit_depth_chroma": (body[18] & 0x07) + 8,
        "length_size": (body[21] & 0x03) + 1,
        "nal_arrays": arrays,  # keyed by NAL type: 32=VPS, 33=SPS, 34=PPS
    }


def _parse_iref(data: bytes, b: int, e: int) -> dict[int, list[int]]:
    """'dimg' references: derived item id → ordered source item ids."""
    version, _f, p = _fullbox(data, b)
    wide = version > 0
    out: dict[int, list[int]] = {}
    for tag, rb, re_ in _iter_boxes(data, p, e):
        if tag != b"dimg":
            continue
        if wide:
            from_id = struct.unpack_from(">I", data, rb)[0]
            n = struct.unpack_from(">H", data, rb + 4)[0]
            ids = list(struct.unpack_from(f">{n}I", data, rb + 6))
        else:
            from_id = struct.unpack_from(">H", data, rb)[0]
            n = struct.unpack_from(">H", data, rb + 2)[0]
            ids = list(struct.unpack_from(f">{n}H", data, rb + 4))
        out[from_id] = ids
    return out


def _parse_grid(payload: bytes) -> dict:
    """ImageGrid item body (ISO/IEC 23008-12 §6.6.2.3.2)."""
    if len(payload) < 8:
        raise ValueError("heic: grid config shorter than 8 bytes")
    flags = payload[1]
    rows = payload[2] + 1
    cols = payload[3] + 1
    if flags & 1:  # 32-bit output size
        w, h = struct.unpack_from(">II", payload, 4)
    else:
        w, h = struct.unpack_from(">HH", payload, 4)
    return {"rows": rows, "cols": cols, "width": w, "height": h}


@format_boundary("HEIC")
def parse_heic(data: bytes) -> dict:
    """Container-only parse of the primary HEVC item — works (and is
    tested) without any codec library.

    Returns ``{"item_type", "width", "height", "hvcc": dict|None,
    "payload": bytes}`` — payload is the length-prefixed NAL stream of
    the primary item."""
    if not is_heic(data):
        raise ValueError("not a HEIC file (no HEVC-image brand in ftyp)")
    meta_b = meta_e = None
    for tag, b, e in _iter_boxes(data, 0, len(data)):
        if tag == b"meta":
            meta_b, meta_e = b, e
            break
    if meta_b is None:
        raise ValueError("heic: no meta box")
    _v, _f, p = _fullbox(data, meta_b)

    primary = None
    iloc = iinf = None
    props: list = []
    assoc: dict = {}
    iref: dict = {}
    for tag, b, e in _iter_boxes(data, p, meta_e):
        if tag == b"pitm":
            version, _fl, q = _fullbox(data, b)
            primary = struct.unpack_from(
                ">H" if version == 0 else ">I", data, q
            )[0]
        elif tag == b"iloc":
            iloc = _parse_iloc(data, b, e)
        elif tag == b"iinf":
            iinf = _parse_iinf(data, b, e)
        elif tag == b"iprp":
            props, assoc = _parse_iprp(data, b, e)
        elif tag == b"iref":
            iref = _parse_iref(data, b, e)
    if primary is None or iloc is None or iinf is None:
        raise ValueError("heic: meta is missing pitm/iloc/iinf")
    idat = _find_idat(data, meta_b, meta_e)

    def item_props(item_id):
        w = h = None
        cfg = None
        for idx in assoc.get(item_id, []):
            if not 1 <= idx <= len(props):
                raise ValueError("heic: ipma references a missing property")
            tag, body = props[idx - 1]
            if tag == b"ispe":
                w, h = struct.unpack_from(">II", body, 4)
            elif tag == b"hvcC":
                cfg = parse_hvcc(body)
        return w, h, cfg

    def item_payload(item_id, what):
        entry = iloc.get(item_id)
        if entry is None:
            raise ValueError(f"heic: {what} has no iloc entry")
        return _resolve_extents(data, entry, idat, what)

    item_type = iinf.get(primary)
    if item_type == "grid":
        # iPhone-style tiled image: the primary item's payload is an
        # ImageGrid config; the pixels live in hidden hvc1 tiles linked
        # by 'dimg' references. Metadata comes from the grid (output
        # dims) and the first tile (hvcC).
        grid = _parse_grid(item_payload(primary, "grid item"))
        tiles = iref.get(primary, [])
        if not tiles:
            raise ValueError("heic: grid item without dimg references")
        for t in tiles:
            if iinf.get(t) not in ("hvc1", "hev1"):
                raise NotImplementedError(
                    f"heic: grid tile type {iinf.get(t)!r} is not HEVC"
                )
        w, h, hvcc = item_props(primary)
        if w is None:
            w, h = grid["width"], grid["height"]
        if hvcc is None:
            _tw, _th, hvcc = item_props(tiles[0])
        return {
            "item_type": "grid",
            "width": w,
            "height": h,
            "hvcc": hvcc,
            "payload": b"".join(item_payload(t, f"tile {t}") for t in tiles),
            "grid": dict(grid, n_tiles=len(tiles)),
        }
    if item_type == "iovl":
        raise NotImplementedError(
            "heic: derived image item 'iovl' (overlay) is not supported"
        )
    if item_type not in ("hvc1", "hev1"):
        raise ValueError(f"heic: primary item type {item_type!r} != 'hvc1'")
    width, height, hvcc = item_props(primary)
    return {
        "item_type": item_type,
        "width": width,
        "height": height,
        "hvcc": hvcc,
        "payload": item_payload(primary, "primary item"),
        "grid": None,
    }


# ---------------------------------------------------------------------------
# native dispatch (libheif → libde265 / x265)
# ---------------------------------------------------------------------------


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


_LIBHEIF: ctypes.CDLL | None | bool = False


def _load() -> ctypes.CDLL | None:
    global _LIBHEIF
    if _LIBHEIF is False:
        _LIBHEIF = None
        for name in ("libheif.so.1", "libheif.so"):
            try:
                h = ctypes.CDLL(name)
            except OSError:
                continue
            h.heif_context_alloc.restype = ctypes.c_void_p
            h.heif_context_free.argtypes = [ctypes.c_void_p]
            for fn, res, args in [
                ("heif_context_read_from_memory", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
                  ctypes.c_void_p]),
                ("heif_context_get_primary_image_handle", _HeifError,
                 [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_decode_image", _HeifError,
                 [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
                  ctypes.c_int, ctypes.c_int, ctypes.c_void_p]),
                ("heif_context_get_encoder_for_format", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_image_create", _HeifError,
                 [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                  ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_image_add_plane", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                  ctypes.c_int]),
                ("heif_context_encode_image", _HeifError,
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                  ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
                ("heif_context_write_to_file", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p]),
                ("heif_encoder_set_lossy_quality", _HeifError,
                 [ctypes.c_void_p, ctypes.c_int]),
                ("heif_encoder_set_parameter_string", _HeifError,
                 [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]),
            ]:
                f = getattr(h, fn)
                f.restype = res
                f.argtypes = args
            h.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
            h.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
            h.heif_image_handle_has_alpha_channel.argtypes = [ctypes.c_void_p]
            h.heif_image_get_plane_readonly.restype = ctypes.POINTER(
                ctypes.c_uint8
            )
            h.heif_image_get_plane_readonly.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ]
            h.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
            h.heif_image_get_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ]
            h.heif_image_handle_release.argtypes = [ctypes.c_void_p]
            h.heif_image_release.argtypes = [ctypes.c_void_p]
            h.heif_encoder_release.argtypes = [ctypes.c_void_p]
            h.heif_have_decoder_for_format.argtypes = [ctypes.c_int]
            h.heif_have_encoder_for_format.argtypes = [ctypes.c_int]
            _LIBHEIF = h
            break
    return _LIBHEIF  # type: ignore[return-value]


def have_native_codec() -> tuple[bool, bool]:
    """(can_decode_hevc, can_encode_hevc) via libheif."""
    h = _load()
    if h is None:
        return False, False
    return bool(h.heif_have_decoder_for_format(1)), bool(
        h.heif_have_encoder_for_format(1)
    )


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"?").decode("latin-1")
        raise ValueError(f"malformed HEIC: libheif {what} failed: {msg}")


@format_boundary("HEIC")
def decode_heic(data: bytes) -> np.ndarray:
    """HEIC bytes → (h, w, 3) uint8 RGB via libheif (its own color
    conversion — no from-scratch transform in this path).

    The from-scratch parse above runs FIRST, so malformed containers and
    derived items fail with our typed errors before any native call."""
    info = parse_heic(data)  # validates + classifies; raises our errors
    h = _load()
    if h is None or not h.heif_have_decoder_for_format(1):
        raise NotImplementedError(
            "HEVC reconstruction needs libheif with an HEVC decoder; not "
            "loadable in this environment — parse_heic above still works"
        )
    ctx = h.heif_context_alloc()
    try:
        _check(
            h.heif_context_read_from_memory(ctx, data, len(data), None),
            "read",
        )
        handle = ctypes.c_void_p()
        _check(
            h.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)),
            "primary handle",
        )
        try:
            img = ctypes.c_void_p()
            # colorspace RGB (1); chroma interleaved RGB (10) or RGBA
            # (11) when the handle carries an alpha aux image — same
            # RGBA-when-present contract as the WebP/GIF/AVIF decoders
            nch = 4 if h.heif_image_handle_has_alpha_channel(handle) else 3
            _check(
                h.heif_decode_image(
                    handle, ctypes.byref(img), 1, 11 if nch == 4 else 10, None
                ),
                "decode",
            )
            try:
                stride = ctypes.c_int()
                p = h.heif_image_get_plane_readonly(
                    img, 10, ctypes.byref(stride)
                )
                if not p:
                    raise ValueError("malformed HEIC: no interleaved plane")
                wd = h.heif_image_handle_get_width(handle)
                ht = h.heif_image_handle_get_height(handle)
                buf = ctypes.string_at(p, stride.value * ht)
                return (
                    np.frombuffer(buf, np.uint8)
                    .reshape(ht, stride.value)[:, : wd * nch]
                    .reshape(ht, wd, nch)
                    .copy()
                )
            finally:
                h.heif_image_release(img)
        finally:
            h.heif_image_handle_release(handle)
    finally:
        h.heif_context_free(ctx)


def encode_heic_native(
    rgb: np.ndarray, quality: int = 90, preset: str | None = None
) -> bytes:
    """(h, w, 3) uint8 RGB → HEIC bytes via libheif's x265 encoder.

    FIXTURE/corpus generation only (mirrors av1_codec.encode_av1_native);
    raises NotImplementedError without an in-container HEVC encoder."""
    h = _load()
    if h is None or not h.heif_have_encoder_for_format(1):
        raise NotImplementedError(
            "HEIC encoding needs libheif with an HEVC encoder (x265)"
        )
    arr = np.ascontiguousarray(rgb, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_heic_native wants (h, w, 3) uint8 RGB")
    ht, wd = arr.shape[:2]
    ctx = h.heif_context_alloc()
    try:
        enc = ctypes.c_void_p()
        _check(
            h.heif_context_get_encoder_for_format(ctx, 1, ctypes.byref(enc)),
            "get encoder",
        )
        try:
            img = ctypes.c_void_p()
            _check(h.heif_image_create(wd, ht, 1, 10, ctypes.byref(img)),
                   "image create")
            try:
                _check(h.heif_image_add_plane(img, 10, wd, ht, 8), "add plane")
                stride = ctypes.c_int()
                p = h.heif_image_get_plane(img, 10, ctypes.byref(stride))
                base = ctypes.addressof(p.contents)
                row = arr.reshape(ht, wd * 3)
                for r in range(ht):
                    ctypes.memmove(
                        base + r * stride.value, row[r].tobytes(), wd * 3
                    )
                h.heif_encoder_set_lossy_quality(enc, int(quality))
                if preset is not None:
                    # x265's speed dial; corpus/fixture encodes use
                    # 'ultrafast' — output quality barely moves at these
                    # sizes, encode time drops ~10x
                    h.heif_encoder_set_parameter_string(
                        enc, b"preset", preset.encode()
                    )
                handle = ctypes.c_void_p()
                _check(
                    h.heif_context_encode_image(
                        ctx, img, enc, None, ctypes.byref(handle)
                    ),
                    "encode",
                )
                h.heif_image_handle_release(handle)
            finally:
                h.heif_image_release(img)
        finally:
            h.heif_encoder_release(enc)
        # libheif's memory writer takes a struct of callbacks returning
        # heif_error BY VALUE — awkward from ctypes — so round-trip
        # through a temp file instead (fixture-path code, not a hot path)
        fd, path = tempfile.mkstemp(suffix=".heic")
        os.close(fd)
        try:
            _check(
                h.heif_context_write_to_file(ctx, path.encode()), "write"
            )
            with open(path, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(path)
    finally:
        h.heif_context_free(ctx)


# ---------------------------------------------------------------------------
# from-scratch grid writer
# ---------------------------------------------------------------------------


def compose_heic_grid(tiles: list[bytes], rows: int, cols: int) -> bytes:
    """Assemble single-tile HEIC files into ONE multi-tile grid HEIC —
    the iPhone structure — with the from-scratch container writer.

    ``tiles`` are plain single-item HEIC files (e.g. encode_heic_native
    output), row-major, all the same dimensions; their HEVC payloads and
    hvcC move into hidden items behind a primary 'grid' item with 'dimg'
    references. Readers (libheif included — asserted in tests) compose
    the output image rows*th by cols*tw. No codec library is touched:
    this is pure container surgery over already-encoded bitstreams."""
    from pdf_parser_spark.mp4_demux import _box, _full

    if rows * cols != len(tiles) or not tiles:
        raise ValueError(f"grid {rows}x{cols} needs exactly rows*cols tiles")
    infos = []
    for t in tiles:
        info = parse_heic(t)
        if info["item_type"] == "grid":
            if info["grid"]["n_tiles"] != 1:
                raise ValueError("compose_heic_grid wants single-tile inputs")
        infos.append(info)
    tw, th = infos[0]["width"], infos[0]["height"]
    for info in infos:
        if (info["width"], info["height"]) != (tw, th):
            raise ValueError("grid tiles must share dimensions")
    out_w, out_h = cols * tw, rows * th
    n = len(tiles)
    grid_id = n + 1

    # hvcC must come from the actual bitstream; reuse the first tile's
    # raw hvcC bytes by re-extracting them from its ipco (parse_heic
    # already validated it). Simplest faithful source: rebuild from the
    # parsed record is lossy, so pull the raw box body back out.
    def raw_hvcc(data: bytes) -> bytes:
        from pdf_parser_spark.avif_codec import _parse_iprp as parse_iprp

        for tag, b, e in _iter_boxes(data, 0, len(data)):
            if tag != b"meta":
                continue
            _v, _f, p = _fullbox(data, b)
            for t2, b2, e2 in _iter_boxes(data, p, e):
                if t2 == b"iprp":
                    props, _assoc = parse_iprp(data, b2, e2)
                    for pt, body in props:
                        if pt == b"hvcC":
                            return body
        raise ValueError("tile has no hvcC property")

    hvcc = raw_hvcc(tiles[0])

    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"grid writer\x00",
    )
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", grid_id))
    infes = b"".join(
        _full(  # flags 1: tiles are hidden, exactly like iPhone files
            b"infe", 2, 1,
            struct.pack(">HH", i + 1, 0) + b"hvc1" + b"\x00",
        )
        for i in range(n)
    ) + _full(
        b"infe", 2, 0, struct.pack(">HH", grid_id, 0) + b"grid" + b"\x00"
    )
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", n + 1) + infes)
    dimg = _box(
        b"dimg",
        struct.pack(">HH", grid_id, n)
        + b"".join(struct.pack(">H", i + 1) for i in range(n)),
    )
    iref = _full(b"iref", 0, 0, dimg)
    # grid config goes in idat (offset method 1), tile payloads in mdat
    grid_cfg = struct.pack(">BBBB", 0, 0, rows - 1, cols - 1) + struct.pack(
        ">HH", out_w, out_h
    )
    idat = _box(b"idat", grid_cfg)
    ispe_tile = _full(b"ispe", 0, 0, struct.pack(">II", tw, th))
    ispe_grid = _full(b"ispe", 0, 0, struct.pack(">II", out_w, out_h))
    ipco = _box(b"ipco", ispe_tile + _box(b"hvcC", hvcc) + ispe_grid)
    # associations: every tile → ispe_tile(1) + hvcC(2, essential);
    # grid → ispe_grid(3)
    ipma_entries = b"".join(
        struct.pack(">H", i + 1) + bytes([2, 1, 0x82]) for i in range(n)
    ) + struct.pack(">H", grid_id) + bytes([1, 3])
    ipma = _full(b"ipma", 0, 0, struct.pack(">I", n + 1) + ipma_entries)
    iprp = _box(b"iprp", ipco + ipma)

    payloads = [info["payload"] for info in infos]

    def make_iloc(mdat_body: int) -> bytes:
        items = []
        off = 0
        for i, pl in enumerate(payloads):
            items.append(
                # id, construction_method 0 (file), dref 0, 1 extent
                struct.pack(">HHHH", i + 1, 0, 0, 1)
                + struct.pack(">II", mdat_body + off, len(pl))
            )
            off += len(pl)
        # the grid item: version 1 entry with construction_method 1 (idat)
        items.append(
            struct.pack(">HHHH", grid_id, 1, 0, 1)  # id, method, dref, n
            + struct.pack(">II", 0, len(grid_cfg))
        )
        body = (
            struct.pack(">H", 0x4400)  # offset_size=4, length_size=4
            + struct.pack(">H", n + 1)
        ) + b"".join(items)
        return _full(b"iloc", 1, 0, body)

    ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0) + b"heicmif1miaf")
    meta0 = _full(
        b"meta", 0, 0, hdlr + pitm + iinf + iref + make_iloc(0) + iprp + idat
    )
    mdat_body = len(ftyp) + len(meta0) + 8
    meta = _full(
        b"meta", 0, 0,
        hdlr + pitm + iinf + iref + make_iloc(mdat_body) + iprp + idat,
    )
    assert len(meta) == len(meta0)
    return ftyp + meta + _box(b"mdat", b"".join(payloads))
