"""Real image codecs for uncompressed formats — pure numpy, zero new deps.

The container ships no media libraries (no Pillow/ffmpeg), but three
ubiquitous formats need none: binary PPM (P6) and uncompressed 24-bit BMP
(BI_RGB) are header + raw pixel bytes, and PNG's only compression is
stdlib ``zlib`` (inflate + per-scanline unfiltering, implemented below).
Implementing them here makes the multimodal pipeline's decode step REAL —
actual width/height parsing, actual pixel arrays, actual per-channel
statistics.  Baseline-sequential JPEG (Huffman + dequant + iDCT, pure
numpy) lives in the sibling ``multimodal/jpeg.py``; the remaining lossy
formats (progressive JPEG, MP3/MP4) are the documented Pillow/ffmpeg
swap-in point.

Both decoders return ``uint8`` arrays shaped ``(height, width, 3)`` in RGB
order; both encoders round-trip bit-exactly (tests pin this).

Format references (public specs):
* PPM P6 — Netpbm format: ``P6\\n<w> <h>\\n<maxval>\\n`` then raw RGB rows,
  top-down.  Comments (``#``) may appear between header tokens.
* BMP — BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24 bpp,
  compression 0: rows bottom-up, BGR order, each row padded to 4 bytes.
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MAGIC = b"P6"
BMP_MAGIC = b"BM"


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → binary PPM bytes."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse the first ``n_tokens`` whitespace-separated header integers
    after the magic, skipping ``#`` comments; returns (tokens, data_offset).
    Per spec, exactly ONE whitespace byte follows the last header token."""
    i, tokens = 2, []  # skip magic
    while len(tokens) < n_tokens:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:i]))
    return tokens, i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → RGB uint8 array (h, w, 3)."""
    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), offset = _ppm_header_tokens(payload, 3)
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    need = w * h * 3
    data = payload[offset : offset + need]
    if len(data) < need:
        raise ValueError(f"PPM truncated: need {need} pixel bytes, have {len(data)}")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------- BMP (24 bpp BI_RGB)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → uncompressed 24-bit BMP bytes
    (bottom-up rows, BGR order, 4-byte row padding — the classic layout)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    # RGB → BGR, flip to bottom-up, pad each row to the 4-byte stride
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", BMP_MAGIC, 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → RGB uint8 array (h, w, 3).

    Handles both bottom-up (positive height, the common case) and top-down
    (negative height) row order; rejects palettes/compression — those are
    the Pillow swap-in point, not silent wrong answers."""
    if not payload.startswith(BMP_MAGIC):
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("BMP truncated before headers")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h_signed, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24 bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    need = stride * h
    data = payload[data_offset : data_offset + need]
    if len(data) < need:
        raise ValueError(f"BMP truncated: need {need} pixel bytes, have {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage → flip to top-down
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# ------------------------------------------------- PNG (8-bit RGB / RGBA)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(
    ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw scanline (encode side).
    All arithmetic mod 256 per spec."""
    n = len(raw)
    left = np.zeros(n, dtype=np.int32)
    left[bpp:] = raw[:-bpp]
    up = prior.astype(np.int32)
    r = raw.astype(np.int32)
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        upleft = np.zeros(n, dtype=np.int32)
        upleft[bpp:] = prior[:-bpp]
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = r - pred
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass.
ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_subimage(
    rows: np.ndarray, ch: int, filter_type: int
) -> bytearray:
    """Filter a (h, w·ch) sub-image into PNG scanline bytes."""
    out = bytearray()
    prior = np.zeros(rows.shape[1], dtype=np.uint8)
    for y in range(rows.shape[0]):
        filtered = _png_filter_row(filter_type, rows[y], prior, ch)
        out.append(filter_type)
        out.extend(filtered.tobytes())
        prior = rows[y]
    return out


def encode_png(
    pixels: np.ndarray,
    filter_type: int = 0,
    interlace: bool = False,
    level: int = -1,
) -> bytes:
    """RGB (h, w, 3) or RGBA (h, w, 4) uint8 array → PNG bytes.

    ``filter_type`` applies the same filter (0-4) to every scanline so
    tests can exercise each decode path; real encoders pick per-row.
    ``interlace=True`` emits the Adam7 seven-pass layout (each pass its
    own filtered sub-image).  ``level`` is the zlib level (−1 default;
    0 → stored deflate blocks, making the file size a closed function
    of the dimensions — the q212 oracle relies on that)."""
    import zlib

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) array, got {arr.shape}")
    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0
    )
    scanlines = bytearray()
    if interlace:
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            scanlines += _filter_subimage(
                sub.reshape(sub.shape[0], -1), ch, filter_type
            )
    else:
        scanlines = _filter_subimage(arr.reshape(h, w * ch), ch, filter_type)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scanlines), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter_row(
    ftype: int, fdata: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one scanline's filter (decode side).  Up/None vectorize;
    Sub/Average/Paeth carry a left-pixel dependency, so they run a
    per-byte loop — rows are short (w·bpp) and this path is exercised
    per-batch inside mapInPandas, not per-row on the driver."""
    n = len(fdata)
    if ftype == 0:
        return fdata.copy()
    if ftype == 2:
        return ((fdata.astype(np.int32) + prior) % 256).astype(np.uint8)
    out = np.zeros(n, dtype=np.int32)
    f = fdata.astype(np.int32)
    up = prior.astype(np.int32)
    if ftype == 1:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (f[i] + left) % 256
    elif ftype == 3:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (f[i] + (left + up[i]) // 2) % 256
    elif ftype == 4:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            upleft = up[i - bpp] if i >= bpp else 0
            p = left + up[i] - upleft
            pa, pb, pc = abs(p - left), abs(p - up[i]), abs(p - upleft)
            pred = left if pa <= pb and pa <= pc else (up[i] if pb <= pc else upleft)
            out[i] = (f[i] + pred) % 256
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8)


#: PNG color type → channels in the filtered scanline (8-bit depth).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (8/16-bit, filters 0-4, sequential or Adam7; color types 0
    grayscale, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA) → uint8 array
    (h, w, 3|4).  Grayscale replicates to RGB; palette indices expand
    through PLTE.

    Pure stdlib-zlib + numpy: chunk walk with CRC verification, IDAT
    concatenation, inflate, per-scanline unfiltering; Adam7 interlace
    decodes as seven independently-filtered sub-images; 16-bit samples
    downsample to their high byte (the stats pipeline is uint8).

    Format reference: the public PNG spec (RFC 2083 / W3C PNG) — chunk
    layout §5, filter algorithms §6, palette §4.1.2."""
    import zlib

    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = len(PNG_MAGIC), None, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _, _, interlace = ihdr
    sub_byte_ok = color_type in (0, 3) and depth in (1, 2, 4)
    if (
        (depth not in (8, 16) and not sub_byte_ok)
        or color_type not in _PNG_CHANNELS
        or interlace not in (0, 1)
        or (depth == 16 and color_type == 3)  # palette is 8-bit max per spec
    ):
        raise ValueError(
            f"unsupported PNG variant "
            f"(depth={depth}, color={color_type}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    # filters operate on BYTES with the pixel byte-width as the left
    # offset (spec §6): 16-bit samples double the per-pixel byte count;
    # sub-byte depths (1/2/4-bit gray/palette) pack pixels MSB-first and
    # filter with a 1-byte offset
    bypp = max(1, ch * depth // 8)

    def row_bytes(width: int) -> int:
        return (width * ch * depth + 7) // 8

    raw = zlib.decompress(bytes(idat))

    def unfilter(lines: np.ndarray, width: int) -> np.ndarray:
        rb = row_bytes(width)
        out = np.empty((lines.shape[0], rb), dtype=np.uint8)
        prior = np.zeros(rb, dtype=np.uint8)
        for y in range(lines.shape[0]):
            prior = _png_unfilter_row(int(lines[y, 0]), lines[y, 1:], prior, bypp)
            out[y] = prior
        return out

    def expand(rows: np.ndarray, width: int) -> np.ndarray:
        """(h, row_bytes) filtered bytes → (h, width, bypp-or-1) samples."""
        if depth >= 8:
            return rows.reshape(rows.shape[0], width, bypp)
        bits = np.unpackbits(rows, axis=1)  # MSB-first per spec
        vals = np.zeros((rows.shape[0], width), dtype=np.uint8)
        for b in range(depth):
            vals = (vals << 1) | bits[:, b :: depth][:, :width]
        return vals[:, :, None]

    if interlace == 1:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, bypp if depth >= 8 else 1), dtype=np.uint8)
        pos2 = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            wi = len(range(x0, w, dx))
            hi = len(range(y0, h, dy))
            if wi == 0 or hi == 0:
                continue
            need = hi * (row_bytes(wi) + 1)
            block = raw[pos2 : pos2 + need]
            if len(block) < need:
                raise ValueError("PNG Adam7 pass truncated")
            pos2 += need
            lines = np.frombuffer(block, dtype=np.uint8).reshape(
                hi, row_bytes(wi) + 1
            )
            px[y0::dy, x0::dx] = expand(unfilter(lines, wi), wi)
        if pos2 != len(raw):
            raise ValueError("PNG Adam7 trailing bytes")
    else:
        stride = row_bytes(w)
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG scanline data: need {h * (stride + 1)} bytes, have {len(raw)}"
            )
        lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        px = expand(unfilter(lines, w), w)
    if depth == 16:
        # big-endian sample pairs → keep the high byte (the standard
        # 16→8 downsample; the stats pipeline is uint8)
        px = px.reshape(h, w, ch, 2)[:, :, :, 0]
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if color_type == 0:
        g = px[:, :, 0]
        if depth < 8:  # scale sub-byte gray levels to full 8-bit range
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if color_type == 4:
        g, a = px[:, :, 0], px[:, :, 1]
        return np.stack([g, g, g, a], axis=2)
    return px


# ----------------------------------------------------------------- dispatch


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing decode → RGB uint8 (h, w, 3).  PNG alpha is dropped
    (the stats pipeline is RGB); baseline JPEG decodes via the pure-numpy
    T.81 implementation (multimodal/jpeg.py); remaining compressed
    formats (progressive JPEG, WebP, ...) raise for the documented
    Pillow swap-in."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    if payload.startswith(PPM_MAGIC):
        return decode_ppm(payload)
    if payload.startswith(BMP_MAGIC):
        return decode_bmp(payload)
    if payload.startswith(PNG_MAGIC[:2]):
        arr = decode_png(payload)
        return np.ascontiguousarray(arr[:, :, :3])
    if payload.startswith(b"\xff\xd8"):
        from pyspark_anomaly_detection_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        from pyspark_anomaly_detection_spark.multimodal.gif import decode_gif

        return decode_gif(payload)
    raise ValueError(
        f"unsupported image format (magic {payload[:2]!r}); "
        "wire Pillow into decode_image for compressed formats"
    )


def image_stats_features(arr: np.ndarray) -> list[float]:
    """Decoded pixels → the 16-dim feature vector the extraction pipeline
    emits for images: geometry + per-channel moments + luma.

    Layout: [width, height, channels, aspect,
             mean_r, mean_g, mean_b, std_r, std_g, std_b,
             min_all, max_all, mean_all, std_all, mean_luma, nonzero_frac]
    """
    h, w, c = arr.shape
    flat = arr.astype(np.float64)
    means = flat.mean(axis=(0, 1))
    stds = flat.std(axis=(0, 1))
    luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
    return [
        float(v)
        for v in (
            w,
            h,
            c,
            w / h,
            means[0],
            means[1],
            means[2],
            stds[0],
            stds[1],
            stds[2],
            flat.min(),
            flat.max(),
            flat.mean(),
            flat.std(),
            luma,
            (arr != 0).mean(),
        )
    ]


def resize_pixels(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w, c) → (target_h, target_w, c) via
    numpy index sampling — pixel-center convention (the OpenCV/PIL
    NEAREST default), deterministic on any platform."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64), w - 1)
    return arr[rows[:, None], cols[None, :]]


# ------------------------------------------------- WAV (RIFF, 16-bit PCM)

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 PCM array (n,) mono or (n, ch) → RIFF/WAVE bytes.

    Canonical 44-byte header: RIFF chunk + PCM fmt subchunk + data
    subchunk.  Round-trips bit-exactly through :func:`decode_wav`."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels) int16 array, got {arr.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved frames, little-endian
    byte_rate = sample_rate * ch * 2
    header = (
        struct.pack("<4sI4s", WAV_MAGIC, 36 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
        + struct.pack("<4sI", b"data", len(data))
    )
    return header + data


def _ulaw2linear_scalar(u: int) -> int:
    """G.711 §4.2 (CCITT reference decoder, public): one μ-law byte →
    linear int16."""
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear_scalar(a: int) -> int:
    """G.711 §4.1: one A-law byte → linear int16."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (a & 0x80) else -t


#: 256-entry expansion tables — decode is a vectorized numpy lookup.
ULAW_TABLE = np.array([_ulaw2linear_scalar(i) for i in range(256)], dtype=np.int16)
ALAW_TABLE = np.array([_alaw2linear_scalar(i) for i in range(256)], dtype=np.int16)

#: WAVE format tags (RFC 2361 registry, public).
WAVE_PCM, WAVE_ALAW, WAVE_ULAW = 1, 6, 7


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, int16 array (n, channels)).

    Supports 16-bit linear PCM (tag 1) and 8-bit G.711 μ-law / A-law
    (tags 7 / 6 — telephony corpora), expanded to int16 via the CCITT
    reference tables.  Walks the chunk list (fmt/data may be separated
    by LIST/fact chunks in the wild); other compressed codecs raise —
    the torchaudio/ffmpeg swap-in point, never silent wrong answers."""
    if not payload.startswith(WAV_MAGIC) or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, bits, data, fmt_tag = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag not in (WAVE_PCM, WAVE_ALAW, WAVE_ULAW):
                raise ValueError(
                    f"unsupported WAV codec (format tag {fmt_tag}); "
                    "PCM16 and G.711 u-law/A-law decode natively"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_tag in (WAVE_ALAW, WAVE_ULAW):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit (bits={bits})")
        table = ULAW_TABLE if fmt_tag == WAVE_ULAW else ALAW_TABLE
        n_frames = len(data) // ch
        codes = np.frombuffer(data[: n_frames * ch], dtype=np.uint8)
        return rate, table[codes].reshape(n_frames, ch)
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    n_frames = len(data) // (2 * ch)
    arr = np.frombuffer(data[: n_frames * 2 * ch], dtype="<i2").reshape(n_frames, ch)
    return rate, arr


N_AUDIO_BANDS = 8


def audio_stats_features(rate: int, samples: np.ndarray) -> list[float]:
    """Decoded PCM → the 16-dim feature vector the extraction pipeline
    emits for audio: container stats + signal moments + coarse spectrum.

    Layout: [sample_rate, n_channels, n_frames, duration_s,
             rms, peak_abs, mean, zero_crossing_rate,
             band_energy_0 .. band_energy_7]   (bands = equal slices of
    the rfft magnitude spectrum of the channel-mean signal, L1-normalized).
    """
    n, ch = samples.shape
    x = samples.astype(np.float64).mean(axis=1) / 32768.0  # mono mixdown
    rms = float(np.sqrt((x**2).mean())) if n else 0.0
    zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, N_AUDIO_BANDS)
    energy = np.array([b.sum() for b in bands])
    total = energy.sum() or 1.0
    return [
        float(v)
        for v in (
            rate,
            ch,
            n,
            n / rate,
            rms,
            float(np.abs(x).max()) if n else 0.0,
            float(x.mean()) if n else 0.0,
            zc,
            *(energy / total),
        )
    ]


# ------------------------------------------------------- AVI (RIFF video)

AVI_MAGIC = b"RIFF"  # + 'AVI ' at offset 8


def encode_avi(frames: np.ndarray, fps: int = 4) -> bytes:
    """RGB uint8 array (n_frames, h, w, 3) → minimal RIFF/AVI bytes.

    Uncompressed DIB video: one ``avih`` main header (geometry, frame
    count, frame period) and a ``movi`` LIST of ``00db`` chunks, each a
    raw bottom-up BGR bitmap (BMP row convention: 4-byte-aligned rows).
    No codec, no index — the shape real AVI tooling accepts for raw
    video, and everything :func:`decode_avi` needs to round-trip
    bit-exactly.  Format reference: the public RIFF/AVI spec
    (``avih`` = MainAVIHeader, 56 bytes, 14 little-endian dwords).
    """
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB array, got {arr.shape}")
    n, h, w = arr.shape[:3]
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    bodies = []
    for i in range(n):
        bgr = arr[i, ::-1, :, ::-1]  # bottom-up rows, BGR pixels
        rows = bgr.reshape(h, w * 3)
        if pad:
            rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
        bodies.append(rows.tobytes())
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<4sI14I",
        b"avih", 56,
        usec, stride * h * fps, 0, 0, n, 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi_body = b"".join(
        b"00db" + struct.pack("<I", len(b)) + b for b in bodies
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[float, np.ndarray]:
    """RIFF/AVI uncompressed DIB video → (fps, RGB array (n, h, w, 3)).

    Chunk-walks the container the same way :func:`decode_wav` walks WAVE:
    ``hdrl``'s ``avih`` gives geometry + frame period, the ``movi`` LIST
    gives one ``00db``/``00dc`` chunk per frame (raw bottom-up BGR,
    4-byte-aligned rows).  Compressed streams (frame size ≠ DIB size)
    are rejected — the ffmpeg swap-in point, never a silent wrong answer."""
    if not payload.startswith(AVI_MAGIC) or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    usec = w = h = None
    bodies: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal usec, w, h
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            body_start = pos + 8
            if cid == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", buf, body_start)
                usec, w, h = vals[0], vals[8], vals[9]
            elif cid in (b"00db", b"00dc"):
                bodies.append(buf[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(payload, 12, len(payload))
    if usec is None or not usec or not w or not h:
        raise ValueError("AVI missing or degenerate avih header")
    stride = (w * 3 + 3) & ~3
    frames = np.empty((len(bodies), h, w, 3), dtype=np.uint8)
    for i, body in enumerate(bodies):
        if len(body) < stride * h:
            raise ValueError(
                f"frame {i}: {len(body)} bytes < DIB size {stride * h} "
                "(compressed stream? only raw 00db supported)"
            )
        rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
        frames[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return 1_000_000 / usec, frames


def video_stats_features(fps: float, frames: np.ndarray) -> list[float]:
    """Decoded frames → the 16-dim feature vector for video: container
    stats + luma moments + motion proxy.

    Layout: [fps, n_frames, width, height, duration_s,
             luma_mean, luma_std, luma_min, luma_max,
             motion_mean, motion_max,
             r_mean, g_mean, b_mean, first_luma, last_luma]
    where luma = ITU-R 601 integer-weighted (77R+150G+29B)>>8 on uint8
    (exact integer arithmetic — reproducible across platforms), and
    motion = mean |Δluma| between consecutive frames."""
    n, h, w = frames.shape[:3]
    f = frames.astype(np.int64)
    luma = (77 * f[..., 0] + 150 * f[..., 1] + 29 * f[..., 2]) >> 8
    per_frame = luma.reshape(n, -1).mean(axis=1)
    if n > 1:
        motion = np.abs(np.diff(luma, axis=0)).reshape(n - 1, -1).mean(axis=1)
        motion_mean, motion_max = float(motion.mean()), float(motion.max())
    else:
        motion_mean = motion_max = 0.0
    return [
        float(fps), float(n), float(w), float(h),
        float(n / fps) if fps else 0.0,
        float(luma.mean()), float(luma.std()),
        float(luma.min()), float(luma.max()),
        motion_mean, motion_max,
        float(f[..., 0].mean()), float(f[..., 1].mean()), float(f[..., 2].mean()),
        float(per_frame[0]), float(per_frame[-1]),
    ]


def encode_wav_g711(
    codes: np.ndarray, law: str = "ulaw", sample_rate: int = 8000
) -> bytes:
    """G.711 fixture encoder: raw 8-bit companded CODES (n,) or (n, ch)
    → RIFF/WAVE with format tag 7 (μ-law) or 6 (A-law).  Takes code
    bytes, not linear samples — tests feed all 256 codes and check the
    decoder's expansion against an independent reference."""
    tag = WAVE_ULAW if law == "ulaw" else WAVE_ALAW
    arr = np.ascontiguousarray(codes, dtype=np.uint8)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    byte_rate = sample_rate * ch
    header = (
        struct.pack("<4sI4s", WAV_MAGIC, 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, tag, ch, sample_rate, byte_rate, ch, 8
        )
        + struct.pack("<4sI", b"data", len(data))
    )
    return header + data
