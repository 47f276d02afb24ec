"""EXIF (APP1) metadata extraction — the pre-decode filter surface of a
multimodal corpus pipeline: orientation, camera make/model, capture
time, and pixel dimensions let a 100-TB ingest drop/route images
WITHOUT paying the entropy-decode cost (metadata is in the first few KB
of the stream, so at scale this reads file heads, not payloads).

Pure stdlib TIFF 6.0 / EXIF 2.x parsing (public specs: JEITA CP-3451,
TIFF 6.0): APP1 segment scan → "Exif\\0\\0" → TIFF header (II/MM byte
order) → IFD0 walk → ExifIFD pointer chase.  Both endiannesses, value
inlining vs offset indirection, and bounds-checked offsets (malformed
metadata degrades to partial results, never a crash — corpus files lie).

The writer exists for fixture generation: it emits a standards-shaped
APP1 segment that any EXIF reader can parse, and the parser is tested
against byte layouts it did NOT produce (hand-assembled fixtures,
big-endian variants), so correctness never reduces to a round trip.
"""

from __future__ import annotations

import struct

#: Tags surfaced by :func:`parse_exif` (public EXIF 2.x tag ids).
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

#: TIFF field types → byte width (subset used here).
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4}


# ---------------------------------------------------------------- writer


def build_exif_app1(
    orientation: int = 1,
    make: str = "",
    model: str = "",
    datetime_str: str = "",
    width: int | None = None,
    height: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """A complete APP1 segment (FFE1 + length + Exif payload) carrying
    IFD0 {Make, Model, Orientation, DateTime, ExifIFD*} and an ExifIFD
    {PixelXDimension, PixelYDimension} when dimensions are given."""
    bo = ">" if big_endian else "<"

    def entry(tag: int, typ: int, count: int, value_or_off: int) -> bytes:
        raw = struct.pack(f"{bo}HHI", tag, typ, count)
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            if typ == 3:  # SHORTs inline, left-justified in the 4 bytes
                vals = struct.pack(f"{bo}H", value_or_off) + b"\x00\x00"
                return raw + vals
            return raw + struct.pack(f"{bo}I", value_or_off)
        return raw + struct.pack(f"{bo}I", value_or_off)

    ifd0_entries: list[tuple[int, int, bytes | int]] = []
    extra = bytearray()  # out-of-line ASCII values, appended after IFDs

    def ascii_entry(tag: int, text: str) -> None:
        data = text.encode("ascii") + b"\x00"
        ifd0_entries.append((tag, 2, bytes(data)))

    if make:
        ascii_entry(TAG_MAKE, make)
    if model:
        ascii_entry(TAG_MODEL, model)
    ifd0_entries.append((TAG_ORIENTATION, 3, orientation))
    if datetime_str:
        ascii_entry(TAG_DATETIME, datetime_str)
    has_exif_ifd = width is not None and height is not None
    n0 = len(ifd0_entries) + (1 if has_exif_ifd else 0)

    # layout: TIFF header (8) | IFD0 | [ExifIFD] | out-of-line values
    ifd0_size = 2 + 12 * n0 + 4
    exif_ifd_off = 8 + ifd0_size
    exif_ifd_size = (2 + 12 * 2 + 4) if has_exif_ifd else 0
    data_off = exif_ifd_off + exif_ifd_size

    body = bytearray()
    body += struct.pack(f"{bo}2sHI", b"II" if not big_endian else b"MM", 42, 8)
    body += struct.pack(f"{bo}H", n0)
    for tag, typ, val in sorted(ifd0_entries, key=lambda t: t[0]) + (
        [(TAG_EXIF_IFD, 4, exif_ifd_off)] if has_exif_ifd else []
    ):
        if isinstance(val, bytes):
            if len(val) <= 4:
                body += struct.pack(f"{bo}HHI", tag, typ, len(val))
                body += val + b"\x00" * (4 - len(val))
            else:
                body += struct.pack(f"{bo}HHI", tag, typ, len(val))
                body += struct.pack(f"{bo}I", data_off + len(extra))
                extra += val
        else:
            body += entry(tag, typ, 1, val)
    body += struct.pack(f"{bo}I", 0)  # next-IFD = none
    if has_exif_ifd:
        body += struct.pack(f"{bo}H", 2)
        body += entry(TAG_PIXEL_X, 4, 1, int(width))
        body += entry(TAG_PIXEL_Y, 4, 1, int(height))
        body += struct.pack(f"{bo}I", 0)
    body += extra

    payload = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def inject_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (valid placement per JFIF/
    EXIF interop: APP1 precedes other tables)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


# ---------------------------------------------------------------- parser


def _read_ifd(
    tiff: bytes, off: int, bo: str, out: dict, _seen: set | None = None
) -> None:
    # Visited-offset guard: a malformed TIFF whose ExifIFD pointer loops
    # back at an already-walked IFD must terminate, not recurse forever.
    if _seen is None:
        _seen = set()
    if off in _seen or len(_seen) > 32:
        return
    _seen.add(off)
    if off + 2 > len(tiff):
        return
    (n,) = struct.unpack_from(f"{bo}H", tiff, off)
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            return
        tag, typ, count = struct.unpack_from(f"{bo}HHI", tiff, base)
        size = _TYPE_SIZES.get(typ, 0) * count
        if size == 0:
            continue
        if size <= 4:
            val_off = base + 8
        else:
            (val_off,) = struct.unpack_from(f"{bo}I", tiff, base + 8)
        if val_off + size > len(tiff):
            continue  # malformed offset: skip field, keep parsing
        if tag == TAG_EXIF_IFD and typ == 4:
            (ptr,) = struct.unpack_from(f"{bo}I", tiff, val_off)
            _read_ifd(tiff, ptr, bo, out, _seen)
        elif typ == 2:  # ASCII
            raw = tiff[val_off : val_off + count]
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:  # SHORT
            (out[tag],) = struct.unpack_from(f"{bo}H", tiff, val_off)
        elif typ == 4:  # LONG
            (out[tag],) = struct.unpack_from(f"{bo}I", tiff, val_off)


def parse_exif(jpeg: bytes) -> dict | None:
    """Scan JPEG markers for an APP1/Exif segment and return
    {orientation, make, model, datetime, pixel_x, pixel_y} (keys present
    only when the corresponding tag parses).  Returns None when no EXIF
    segment exists.  Never raises on malformed metadata — corpus-scale
    ingest treats bad EXIF as absent, not fatal."""
    if jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return None
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: metadata segments are all behind us
            return None
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        seg = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            if len(tiff) < 8:
                return None
            order = tiff[:2]
            if order == b"II":
                bo = "<"
            elif order == b"MM":
                bo = ">"
            else:
                return None
            magic, ifd0 = struct.unpack_from(f"{bo}HI", tiff, 2)
            if magic != 42:
                return None
            tags: dict = {}
            _read_ifd(tiff, ifd0, bo, tags)
            out = {}
            if TAG_ORIENTATION in tags:
                out["orientation"] = int(tags[TAG_ORIENTATION])
            if TAG_MAKE in tags:
                out["make"] = tags[TAG_MAKE]
            if TAG_MODEL in tags:
                out["model"] = tags[TAG_MODEL]
            if TAG_DATETIME in tags:
                out["datetime"] = tags[TAG_DATETIME]
            if TAG_PIXEL_X in tags:
                out["pixel_x"] = int(tags[TAG_PIXEL_X])
            if TAG_PIXEL_Y in tags:
                out["pixel_y"] = int(tags[TAG_PIXEL_Y])
            return out or None
        pos += 2 + seglen
    return None
