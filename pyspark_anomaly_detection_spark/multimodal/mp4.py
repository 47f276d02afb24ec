"""MP4 / ISO-BMFF box walking (ISO/IEC 14496-12, public) — the video
member of the metadata-triage triptych (EXIF for images, MP3 headers
for audio): duration, timescale, track count, per-track media types,
and coded dimensions all live in the box TREE, so a 100-TB video
ingest can census and filter corpora reading a few KB of `moov` per
file, never touching `mdat` sample data.

Scope: box structure only — size+type walk (including 64-bit
`size==1` largesize and run-to-end `size==0` boxes), `ftyp` brand,
`mvhd` version 0/1 timescale/duration, `trak`→`mdia`→`hdlr` handler
census, `tkhd` 16.16 fixed-point track dimensions.  Codec payload
decode stays the documented ffmpeg swap-in point.  Malformed trees
degrade to partial results, never a crash.

The writer synthesizes standards-shaped box trees (valid ftyp + moov
with N tracks, zero-length mdat) so the parser tests include
hand-assembled boxes with known arithmetic, not just round trips.
"""

from __future__ import annotations

import struct


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the boxes in
    [start, end); stops at malformed sizes instead of raising."""
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box runs to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed: stop cleanly
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, b, e in _walk(data, start, end):
        if t == typ:
            return b, e
    return None


def parse_mp4(payload: bytes) -> dict | None:
    """Top-level census of an ISO-BMFF file: {brand, timescale,
    duration_ms, n_tracks, handlers: [vide/soun/...], width, height}.
    None when the stream has no ftyp/moov structure."""
    n = len(payload)
    ftyp = _find(payload, 0, n, b"ftyp")
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        return None
    out: dict = {}
    if ftyp is not None and ftyp[1] - ftyp[0] >= 4:
        out["brand"] = payload[ftyp[0] : ftyp[0] + 4].decode("ascii", "replace")
    mvhd = _find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is not None and mvhd[1] - mvhd[0] >= 1:
        ver = payload[mvhd[0]]
        try:
            if ver == 1:
                timescale, duration = struct.unpack_from(
                    ">IQ", payload, mvhd[0] + 4 + 16
                )
            else:
                timescale, duration = struct.unpack_from(
                    ">II", payload, mvhd[0] + 4 + 8
                )
            if timescale:
                out["timescale"] = timescale
                out["duration_ms"] = duration * 1000 // timescale
        except struct.error:
            pass
    handlers: list[str] = []
    width = height = None
    for t, b, e in _walk(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        if tkhd is not None and tkhd[1] - tkhd[0] >= 1:
            ver = payload[tkhd[0]]
            # width/height: last 8 bytes of tkhd, 16.16 fixed point
            try:
                w_fx, h_fx = struct.unpack_from(">II", payload, tkhd[1] - 8)
                if w_fx and h_fx:
                    width, height = w_fx >> 16, h_fx >> 16
            except struct.error:
                pass
        mdia = _find(payload, b, e, b"mdia")
        if mdia is not None:
            hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None and hdlr[1] - hdlr[0] >= 12:
                handlers.append(
                    payload[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
                )
    out["n_tracks"] = len(handlers)
    out["handlers"] = handlers
    if width is not None:
        out["width"] = width
        out["height"] = height
    return out or None


# ---------------------------------------------------------------- writer


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), typ) + body


def build_mp4(
    duration_ms: int,
    timescale: int = 1000,
    video_tracks: int = 1,
    audio_tracks: int = 0,
    width: int = 0,
    height: int = 0,
    brand: bytes = b"isom",
    version1_mvhd: bool = False,
) -> bytes:
    """Standards-shaped ftyp + moov(mvhd + N trak) + empty mdat."""
    duration = duration_ms * timescale // 1000
    if version1_mvhd:
        mvhd = _box(
            b"mvhd",
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + bytes(80),
        )
    else:
        mvhd = _box(
            b"mvhd",
            bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration) + bytes(80),
        )

    def trak(handler: bytes, w: int, h: int) -> bytes:
        tkhd = _box(
            b"tkhd",
            bytes(4) + bytes(72) + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(b"hdlr", bytes(8) + handler + bytes(13))
        mdia = _box(b"mdia", hdlr)
        return _box(b"trak", tkhd + mdia)

    traks = b"".join(
        trak(b"vide", width, height) for _ in range(video_tracks)
    ) + b"".join(trak(b"soun", 0, 0) for _ in range(audio_tracks))
    return (
        _box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isomiso2")
        + _box(b"moov", mvhd + traks)
        + _box(b"mdat", b"")
    )
