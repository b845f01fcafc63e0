"""AVIF: from-scratch ISO-BMFF *item* layer + AV1 payload decode.

AVIF is the modern web's fourth big image format (after JPEG/PNG/WebP):
an AV1 still frame carried in the HEIF *item* structure of ISO-BMFF
(public specs: ISO/IEC 23008-12 image format, AV1-AVIF mapping from AOM).
Unlike video mp4 there is no track — the image is a ``meta``-box item:

    ftyp                          brand 'avif'
    meta (FullBox)
      hdlr                        handler 'pict'
      pitm                        primary item id
      iinf / infe*                item id → item type ('av01', 'mime'…)
      iloc                        item id → extents (offset, length) in mdat
      iprp / ipco                 property pool: ispe (size), av1C, pixi
           / ipma                 item → property associations
    mdat                          the AV1 frame OBUs

The container layer here — box walk, FullBox versions, pitm/iinf/iloc
(all three iloc versions, multi-extent concatenation), ipco/ipma
association resolution, and the writer — is from scratch on the public
specs, reusing mp4_demux's box plumbing. The AV1 payload then decodes
through av1_codec (from-scratch OBU layer + system dav1d/libaom
reconstruction); tests cross-check the whole file against libavif in
both directions (our writer → libavif reader, libavif writer → our
reader).

Scope: the primary 'av01' item of 8-bit images, plus the auxiliary
alpha item when present (auxl reference + auxC alpha URN, a monochrome
AV1 stream → RGBA out, same contract as the WebP/GIF decoders); derived
items ('grid' tiled images, 'iovl' overlays) raise with the feature
named. The YUV→RGB
step is outside the AV1 spec (decoders choose their own upsample/matrix)
— this module uses the documented BT.601 fixed-point transform in
full- or studio-swing per the stream's color_range flag, deterministic
but not claimed byte-identical to any library's RGB path.

These are CODECS, not a DataFrame API: operators/multimodal.py calls them
inside its Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import struct

import numpy as np

from pdf_parser_spark import av1_codec
from pdf_parser_spark.media_codecs import format_boundary
from pdf_parser_spark.mp4_demux import _box, _full, _iter_boxes

__all__ = ["is_avif", "parse_avif", "decode_avif", "encode_avif",
           "encode_avif_rgb", "compose_avif_grid", "yuv_to_rgb",
           "rgb_to_yuv"]


def is_avif(data: bytes) -> bool:
    """ftyp sniff: major or compatible brand 'avif' (still image)."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        return False
    size = struct.unpack_from(">I", data, 0)[0]
    if size < 16 or size > len(data):
        return False
    brands = [data[8:12]] + [
        data[i:i + 4] for i in range(16, size, 4)
    ]
    return b"avif" in brands


def _fullbox(data: bytes, b: int) -> tuple[int, int, int]:
    """(version, flags, body_start) for a FullBox beginning at body b."""
    vf = struct.unpack_from(">I", data, b)[0]
    return vf >> 24, vf & 0xFFFFFF, b + 4


def _parse_iloc(data: bytes, b: int, e: int) -> dict[int, tuple[int, list[tuple[int, int]]]]:
    """item id → (construction_method, [(offset, length), ...]) for all
    three iloc versions. Method 0 offsets are file-absolute; method 1
    offsets index the meta box's ``idat`` body (how writers store small
    payloads); method 2 (item-relative) raises at resolve time."""
    version, _flags, p = _fullbox(data, b)
    if version > 2:
        raise ValueError(f"avif: iloc version {version} not understood")
    sizes = struct.unpack_from(">H", data, p)[0]
    offset_size = sizes >> 12
    length_size = (sizes >> 8) & 0xF
    base_offset_size = (sizes >> 4) & 0xF
    index_size = sizes & 0xF if version in (1, 2) else 0
    p += 2
    if version < 2:
        item_count = struct.unpack_from(">H", data, p)[0]
        p += 2
    else:
        item_count = struct.unpack_from(">I", data, p)[0]
        p += 4

    def read_n(pos: int, n: int) -> tuple[int, int]:
        if n == 0:
            return 0, pos
        return int.from_bytes(data[pos:pos + n], "big"), pos + n

    out: dict[int, list[tuple[int, int]]] = {}
    for _ in range(item_count):
        if version < 2:
            item_id = struct.unpack_from(">H", data, p)[0]
            p += 2
        else:
            item_id = struct.unpack_from(">I", data, p)[0]
            p += 4
        method = 0
        if version in (1, 2):
            method = struct.unpack_from(">H", data, p)[0] & 0xF
            p += 2
        p += 2  # data_reference_index (0 = this file)
        base, p = read_n(p, base_offset_size)
        extent_count = struct.unpack_from(">H", data, p)[0]
        p += 2
        extents = []
        for _ in range(extent_count):
            _idx, p = read_n(p, index_size)
            off, p = read_n(p, offset_size)
            ln, p = read_n(p, length_size)
            extents.append((base + off, ln))
        out[item_id] = (method, extents)
        if p > e:
            raise ValueError("avif: iloc overruns its box")
    return out


def _find_idat(data: bytes, meta_b: int, meta_e: int) -> tuple[int, int] | None:
    _v, _f, p = _fullbox(data, meta_b)
    for tag, b, e in _iter_boxes(data, p, meta_e):
        if tag == b"idat":
            return b, e
    return None


def _resolve_extents(
    data: bytes,
    entry: tuple[int, list[tuple[int, int]]],
    idat: tuple[int, int] | None,
    what: str,
) -> bytes:
    method, extents = entry
    if not extents:
        raise ValueError(f"{what}: primary item has no iloc extents")
    parts = []
    for off, ln in extents:
        if method == 0:
            lo, hi = off, off + ln
            if hi > len(data):
                raise ValueError(f"{what}: iloc extent overruns the file")
        elif method == 1:
            if idat is None:
                raise ValueError(f"{what}: idat-offset item without an idat box")
            lo, hi = idat[0] + off, idat[0] + off + ln
            if hi > idat[1]:
                raise ValueError(f"{what}: iloc extent overruns idat")
        else:
            raise ValueError(
                f"{what}: iloc construction_method {method} (item-relative) "
                "not supported"
            )
        parts.append(data[lo:hi])
    return b"".join(parts)


def _parse_iinf(data: bytes, b: int, e: int) -> dict[int, str]:
    """item id → item type fourcc."""
    version, _flags, p = _fullbox(data, b)
    if version == 0:
        p += 2  # entry_count u16
    else:
        p += 4
    out: dict[int, str] = {}
    for tag, ib, ie in _iter_boxes(data, p, e):
        if tag != b"infe":
            continue
        iv, _iflags, ip = _fullbox(data, ib)
        if iv < 2:
            raise ValueError(f"avif: infe version {iv} not understood")
        # flags bit 0 marks HIDDEN items (e.g. the tiles behind a grid);
        # they are legitimate entries — derived-item handling decides
        # what is supported, not the walk
        if iv == 2:
            item_id = struct.unpack_from(">H", data, ip)[0]
            ip += 2
        else:
            item_id = struct.unpack_from(">I", data, ip)[0]
            ip += 4
        ip += 2  # item_protection_index
        out[item_id] = data[ip:ip + 4].decode("latin-1")
    return out


def _parse_iprp(data: bytes, b: int, e: int) -> tuple[list, dict[int, list[int]]]:
    """(property boxes in pool order, item id → 1-based property indices)."""
    props: list[tuple[bytes, bytes]] = []
    assoc: dict[int, list[int]] = {}
    for tag, ib, ie in _iter_boxes(data, b, e):
        if tag == b"ipco":
            for pt, pb, pe in _iter_boxes(data, ib, ie):
                props.append((pt, data[pb:pe]))
        elif tag == b"ipma":
            version, flags, p = _fullbox(data, ib)
            entry_count = struct.unpack_from(">I", data, p)[0]
            p += 4
            wide = bool(flags & 1)
            for _ in range(entry_count):
                if version < 1:
                    item_id = struct.unpack_from(">H", data, p)[0]
                    p += 2
                else:
                    item_id = struct.unpack_from(">I", data, p)[0]
                    p += 4
                n = data[p]
                p += 1
                idxs = []
                for _ in range(n):
                    if wide:
                        raw = struct.unpack_from(">H", data, p)[0]
                        p += 2
                        idxs.append(raw & 0x7FFF)
                    else:
                        idxs.append(data[p] & 0x7F)
                        p += 1
                assoc[item_id] = idxs
    return props, assoc


def _parse_iref_all(data: bytes, b: int, e: int) -> dict[bytes, dict[int, list[int]]]:
    """All item references: ref type → {from_item_id: [to_item_ids]}.

    'dimg' links derived items (grids) to their sources; 'auxl' links an
    auxiliary item (e.g. an alpha plane) to the item it augments."""
    version, _f, p = _fullbox(data, b)
    wide = version > 0
    out: dict[bytes, dict[int, list[int]]] = {}
    for tag, rb, _re in _iter_boxes(data, p, e):
        if wide:
            from_id = struct.unpack_from(">I", data, rb)[0]
            n = struct.unpack_from(">H", data, rb + 4)[0]
            ids = list(struct.unpack_from(f">{n}I", data, rb + 6))
        else:
            from_id = struct.unpack_from(">H", data, rb)[0]
            n = struct.unpack_from(">H", data, rb + 2)[0]
            ids = list(struct.unpack_from(f">{n}H", data, rb + 4))
        out.setdefault(tag, {})[from_id] = ids
    return out


_ALPHA_URN = b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"


@format_boundary("AVIF")
def parse_avif(data: bytes) -> dict:
    """Container-only parse → the primary item's everything.

    Returns ``{"item_type", "width", "height", "av1c": dict|None,
    "payload": bytes, "seq": dict|None}`` — no reconstruction, so this
    works (and is tested) without any codec library.
    """
    if not is_avif(data):
        raise ValueError("not an AVIF file (no avif brand in ftyp)")
    meta_b = meta_e = None
    for tag, b, e in _iter_boxes(data, 0, len(data)):
        if tag == b"meta":
            meta_b, meta_e = b, e
            break
    if meta_b is None:
        raise ValueError("avif: no meta box")
    _v, _f, p = _fullbox(data, meta_b)

    primary = None
    iloc: dict | None = None
    iinf: dict | None = None
    props: list = []
    assoc: dict = {}
    iref: dict = {}
    for tag, b, e in _iter_boxes(data, p, meta_e):
        if tag == b"pitm":
            version, _fl, q = _fullbox(data, b)
            if version == 0:
                primary = struct.unpack_from(">H", data, q)[0]
            else:
                primary = struct.unpack_from(">I", data, q)[0]
        elif tag == b"iloc":
            iloc = _parse_iloc(data, b, e)
        elif tag == b"iinf":
            iinf = _parse_iinf(data, b, e)
        elif tag == b"iprp":
            props, assoc = _parse_iprp(data, b, e)
        elif tag == b"iref":
            iref = _parse_iref_all(data, b, e)
    if primary is None or iloc is None or iinf is None:
        raise ValueError("avif: meta is missing pitm/iloc/iinf")
    item_type = iinf.get(primary)
    if item_type is None:
        raise ValueError(f"avif: primary item {primary} has no infe entry")
    if item_type == "iovl":
        raise NotImplementedError(
            "avif: derived image item 'iovl' (overlay) is not supported"
        )
    if item_type not in ("av01", "grid"):
        raise ValueError(f"avif: primary item type {item_type!r} != 'av01'")

    idat = _find_idat(data, meta_b, meta_e)

    def item_props(item_id):
        w = h = None
        cfg = None
        for idx in assoc.get(item_id, []):
            if not 1 <= idx <= len(props):
                raise ValueError("avif: ipma references a missing property")
            tag, body = props[idx - 1]
            if tag == b"ispe":
                w, h = struct.unpack_from(">II", body, 4)
            elif tag == b"av1C":
                cfg = av1_codec.parse_av1c(body)
        return w, h, cfg

    def item_bytes(item_id, what):
        entry = iloc.get(item_id)
        if entry is None:
            raise ValueError(f"avif: {what} has no iloc entry")
        return _resolve_extents(data, entry, idat, what)

    grid = None
    tiles = None
    if item_type == "grid":
        # tiled image: the primary item's payload is an ImageGrid config
        # (ISO/IEC 23008-12 §6.6.2.3.2), pixels live in dimg-referenced
        # av01 tiles — decode_avif composes them ITSELF (per-tile AV1
        # decode), unlike the HEIC path where libheif composes
        cfg_bytes = item_bytes(primary, "grid item")
        if len(cfg_bytes) < 8:
            raise ValueError("avif: grid config shorter than 8 bytes")
        gflags = cfg_bytes[1]
        rows, cols = cfg_bytes[2] + 1, cfg_bytes[3] + 1
        if gflags & 1:
            gw, gh = struct.unpack_from(">II", cfg_bytes, 4)
        else:
            gw, gh = struct.unpack_from(">HH", cfg_bytes, 4)
        tile_ids = iref.get(b"dimg", {}).get(primary, [])
        if len(tile_ids) != rows * cols:
            raise ValueError(
                f"avif: grid {rows}x{cols} with {len(tile_ids)} dimg tiles"
            )
        tiles = []
        for t in tile_ids:
            if iinf.get(t) != "av01":
                raise NotImplementedError(
                    f"avif: grid tile type {iinf.get(t)!r} is not av01"
                )
            tw, th, t_av1c = item_props(t)
            tiles.append(
                {
                    "payload": item_bytes(t, f"tile {t}"),
                    "av1c": t_av1c,
                    "width": tw,
                    "height": th,
                }
            )
        grid = {"rows": rows, "cols": cols, "width": gw, "height": gh}
        width, height, av1c = item_props(primary)
        if width is None:
            width, height = gw, gh
        if av1c is None:
            av1c = tiles[0]["av1c"]
        payload = tiles[0]["payload"]  # representative, for seq sniffing
    else:
        width, height, av1c = item_props(primary)
        payload = item_bytes(primary, "avif")
    seq = None
    if av1c is not None and av1c["config_obus"]:
        seq = av1_codec.find_sequence_header(av1c["config_obus"])
    if seq is None:
        seq = av1_codec.find_sequence_header(payload)

    # auxiliary alpha: an av01 item that (a) auxl-references the primary
    # and (b) carries the auxC alpha URN property
    alpha_payload = alpha_config = None
    for item_id, targets in iref.get(b"auxl", {}).items():
        if primary not in targets or iinf.get(item_id) != "av01":
            continue
        is_alpha = False
        a_av1c = None
        for idx in assoc.get(item_id, []):
            if not 1 <= idx <= len(props):
                continue
            tag, body = props[idx - 1]
            if tag == b"auxC" and _ALPHA_URN in body:
                is_alpha = True
            elif tag == b"av1C":
                a_av1c = av1_codec.parse_av1c(body)
        if not is_alpha:
            continue
        a_entry = iloc.get(item_id)
        if a_entry:
            alpha_payload = _resolve_extents(
                data, a_entry, idat, "avif alpha item"
            )
            alpha_config = a_av1c["config_obus"] if a_av1c else None
        break
    return {
        "item_type": item_type,
        "width": width if width is not None else (seq or {}).get("max_width"),
        "height": height if height is not None else (seq or {}).get("max_height"),
        "av1c": av1c,
        "payload": payload,
        "seq": seq,
        "alpha_payload": alpha_payload,
        "alpha_config": alpha_config,
        "grid": grid,
        "tiles": tiles,
    }


def yuv_to_rgb(yuv: np.ndarray, full_range: bool) -> np.ndarray:
    """(h, w, 3) YUV → RGB via the documented BT.601 fixed-point (Q14)
    transform — full-swing or the studio-swing variant vp8_codec uses."""
    y = yuv[:, :, 0].astype(np.int32)
    u = yuv[:, :, 1].astype(np.int32) - 128
    v = yuv[:, :, 2].astype(np.int32) - 128
    if full_range:
        t = y << 14
        r = (t + 22970 * v + (1 << 13)) >> 14          # 1.402
        g = (t - 5638 * u - 11700 * v + (1 << 13)) >> 14  # 0.344136/0.714136
        b = (t + 29032 * u + (1 << 13)) >> 14          # 1.772
    else:
        t = 19077 * (y - 16) + (1 << 13)
        r = (t + 26149 * v) >> 14
        g = (t - 6419 * u - 13320 * v) >> 14
        b = (t + 33050 * u) >> 14
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


@format_boundary("AVIF")
def decode_avif(data: bytes) -> np.ndarray:
    """AVIF bytes → (h, w, 3) uint8 RGB image.

    Container parse is pure; the AV1 frame reconstructs via
    av1_codec.decode_av1 (system decoder — NotImplementedError when none
    is loadable). Files carrying an auxiliary alpha item (auxl reference
    + auxC alpha URN, a monochrome AV1 stream) come back as (h, w, 4)
    RGBA — same contract as the WebP/GIF decoders; opaque files stay
    (h, w, 3)."""
    info = parse_avif(data)
    full = bool(info["seq"] and info["seq"]["color_range_full"])
    if info["grid"] is not None:
        g = info["grid"]
        rows_px = []
        it = iter(info["tiles"])
        for _r in range(g["rows"]):
            row_tiles = []
            for _c in range(g["cols"]):
                t = next(it)
                cfg = t["av1c"]["config_obus"] if t["av1c"] else None
                tyuv = av1_codec.decode_av1(t["payload"], config_obus=cfg)[0]
                row_tiles.append(tyuv)
            rows_px.append(np.hstack(row_tiles))
        yuv = np.vstack(rows_px)[: g["height"], : g["width"]]
    else:
        config = info["av1c"]["config_obus"] if info["av1c"] else None
        frames = av1_codec.decode_av1(info["payload"], config_obus=config)
        yuv = frames[0]
        if info["width"] and info["height"]:
            yuv = yuv[: info["height"], : info["width"]]
    rgb = yuv_to_rgb(yuv, full)
    if info["alpha_payload"] is None:
        return rgb
    a = av1_codec.decode_av1(
        info["alpha_payload"], config_obus=info["alpha_config"]
    )[0][: rgb.shape[0], : rgb.shape[1], 0]  # mono stream: Y is the alpha
    return np.concatenate([rgb, a[:, :, None]], axis=-1)


def encode_avif(stream: bytes) -> bytes:
    """Single-frame AV1 OBU stream → AVIF file bytes (from-scratch writer).

    The carriage mirror of parse_avif: the sequence header goes into the
    av1C property AND stays in the item data — the AV1-AVIF mapping
    requires the item to be a self-contained temporal unit including its
    sequence header (video mp4 keeps it out-of-band; image items do not).
    Only temporal delimiters are stripped. Written with iloc version 0
    and one extent — the layout every reader supports."""
    av1c = av1_codec.build_av1c(stream)
    seq = av1_codec.find_sequence_header(stream)
    keep = [
        o.raw for o in av1_codec.parse_obus(stream)
        if o.type != av1_codec.OBU_TEMPORAL_DELIMITER
    ]
    if not keep:
        raise ValueError("AV1 stream has no frame OBUs to carry")
    payload = b"".join(keep)

    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1miaf")
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"avif writer\x00",
    )
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    infe = _full(
        b"infe", 2, 0, struct.pack(">HH", 1, 0) + b"av01" + b"Image\x00"
    )
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", 1) + infe)
    ispe = _full(
        b"ispe", 0, 0, struct.pack(">II", seq["max_width"], seq["max_height"])
    )
    # pixi: bits per channel (metadata readers expect it alongside av1C)
    nch = 1 if seq["mono_chrome"] else 3
    pixi = _full(b"pixi", 0, 0, bytes([nch]) + bytes([8]) * nch)
    ipco = _box(b"ipco", ispe + pixi + _box(b"av1C", av1c))
    # ipma: item 1 → properties 1 (ispe), 2 (pixi), 3 (av1C, essential)
    ipma = _full(
        b"ipma", 0, 0,
        struct.pack(">I", 1) + struct.pack(">H", 1) + bytes([3, 1, 2, 0x83]),
    )
    iprp = _box(b"iprp", ipco + ipma)

    def make_iloc(offset: int) -> bytes:
        return _full(
            b"iloc", 0, 0,
            struct.pack(">H", 0x4400)  # offset_size=4, length_size=4
            + struct.pack(">H", 1)     # item_count
            + struct.pack(">HHH", 1, 0, 1)  # item 1, dref 0, 1 extent
            + struct.pack(">II", offset, len(payload)),
        )
    # meta's size does not depend on the offset value (fixed-width field):
    # build once with 0 to learn the layout, then rebuild with the real one
    meta0 = _full(b"meta", 0, 0, hdlr + pitm + iinf + make_iloc(0) + iprp)
    mdat_body = len(ftyp) + len(meta0) + 8
    meta = _full(b"meta", 0, 0, hdlr + pitm + iinf + make_iloc(mdat_body) + iprp)
    assert len(meta) == len(meta0)
    return ftyp + meta + _box(b"mdat", payload)


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB → YUV, full-range BT.601 fixed point (Q14) — the
    encode-side inverse of yuv_to_rgb's full-range branch."""
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    y = (4899 * r + 9617 * g + 1868 * b + (1 << 13)) >> 14
    u = ((-2765 * r - 5427 * g + 8192 * b + (1 << 13)) >> 14) + 128
    v = ((8192 * r - 6860 * g - 1332 * b + (1 << 13)) >> 14) + 128
    return np.clip(np.stack([y, u, v], axis=-1), 0, 255).astype(np.uint8)


def encode_avif_rgb(rgb: np.ndarray, quantizer: int = 120) -> bytes:
    """(h, w, 3) RGB → AVIF bytes via the optional native AV1 encoder.

    Convenience wrapper for stages that re-encode pixels (e.g. resize):
    full-range BT.601 to YUV, 2x2-nearest chroma subsample, rav1e, then
    the from-scratch container writer. NotImplementedError when librav1e
    is absent OR the image is under rav1e's 16x16 minimum (callers fall
    back to PNG)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.shape[0] < 16 or rgb.shape[1] < 16:
        raise NotImplementedError(
            f"AVIF re-encode of {rgb.shape[1]}x{rgb.shape[0]}: the rav1e "
            "encoder requires at least 16x16"
        )
    yuv = rgb_to_yuv(rgb)
    y = np.ascontiguousarray(yuv[:, :, 0])
    u = np.ascontiguousarray(yuv[::2, ::2, 1])
    v = np.ascontiguousarray(yuv[::2, ::2, 2])
    stream = av1_codec.encode_av1_native([(y, u, v)], quantizer=quantizer)
    return encode_avif(stream)


def compose_avif_grid(tile_files: list[bytes], rows: int, cols: int) -> bytes:
    """Assemble single-item AVIFs into ONE multi-tile grid AVIF with the
    from-scratch writer (the AV1 twin of heif_codec.compose_heic_grid).

    Row-major equal-size tiles; their AV1 payloads and av1C configs move
    into hidden av01 items behind a primary 'grid' item with 'dimg'
    references (ImageGrid config in idat). Our own decode composes the
    tiles; libavif is the foreign-reader oracle in tests. Note MIAF's
    grid rule, which libavif enforces: tiles should be at least 64x64
    (smaller tiles still round-trip through OUR reader, but strict
    readers reject them)."""
    if rows * cols != len(tile_files) or not tile_files:
        raise ValueError(f"grid {rows}x{cols} needs exactly rows*cols tiles")
    infos = [parse_avif(t) for t in tile_files]
    for info in infos:
        if info["grid"] is not None:
            raise ValueError("compose_avif_grid wants single-item inputs")
    tw, th = infos[0]["width"], infos[0]["height"]
    for info in infos:
        if (info["width"], info["height"]) != (tw, th):
            raise ValueError("grid tiles must share dimensions")
    out_w, out_h = cols * tw, rows * th
    n = len(tile_files)
    grid_id = n + 1

    def raw_av1c(data: bytes) -> bytes:
        for tag, b, e in _iter_boxes(data, 0, len(data)):
            if tag != b"meta":
                continue
            _v, _f, p = _fullbox(data, b)
            for t2, b2, e2 in _iter_boxes(data, p, e):
                if t2 == b"iprp":
                    props, _assoc = _parse_iprp(data, b2, e2)
                    for pt, body in props:
                        if pt == b"av1C":
                            return body
        raise ValueError("tile has no av1C property")

    av1c = raw_av1c(tile_files[0])

    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"grid writer\x00",
    )
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", grid_id))
    infes = b"".join(
        _full(b"infe", 2, 1, struct.pack(">HH", i + 1, 0) + b"av01" + b"\x00")
        for i in range(n)
    ) + _full(b"infe", 2, 0, struct.pack(">HH", grid_id, 0) + b"grid" + b"\x00")
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", n + 1) + infes)
    dimg = _box(
        b"dimg",
        struct.pack(">HH", grid_id, n)
        + b"".join(struct.pack(">H", i + 1) for i in range(n)),
    )
    iref = _full(b"iref", 0, 0, dimg)
    grid_cfg = struct.pack(">BBBB", 0, 0, rows - 1, cols - 1) + struct.pack(
        ">HH", out_w, out_h
    )
    idat = _box(b"idat", grid_cfg)
    ispe_tile = _full(b"ispe", 0, 0, struct.pack(">II", tw, th))
    ispe_grid = _full(b"ispe", 0, 0, struct.pack(">II", out_w, out_h))
    pixi = _full(b"pixi", 0, 0, bytes([3, 8, 8, 8]))
    ipco = _box(
        b"ipco", ispe_tile + _box(b"av1C", av1c) + ispe_grid + pixi
    )
    # tiles → ispe_tile(1) + av1C(2, essential) + pixi(4);
    # grid → ispe_grid(3) + pixi(4). libavif refuses items without pixi.
    ipma_entries = b"".join(
        struct.pack(">H", i + 1) + bytes([3, 1, 0x82, 4]) for i in range(n)
    ) + struct.pack(">H", grid_id) + bytes([2, 3, 4])
    ipma = _full(b"ipma", 0, 0, struct.pack(">I", n + 1) + ipma_entries)
    iprp = _box(b"iprp", ipco + ipma)
    payloads = [info["payload"] for info in infos]

    def make_iloc(mdat_body: int) -> bytes:
        items = []
        off = 0
        for i, pl in enumerate(payloads):
            items.append(
                struct.pack(">HHHH", i + 1, 0, 0, 1)
                + struct.pack(">II", mdat_body + off, len(pl))
            )
            off += len(pl)
        items.append(
            struct.pack(">HHHH", grid_id, 1, 0, 1)
            + struct.pack(">II", 0, len(grid_cfg))
        )
        body = (
            struct.pack(">H", 0x4400) + struct.pack(">H", n + 1)
        ) + b"".join(items)
        return _full(b"iloc", 1, 0, body)

    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1miaf")
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
