"""GIF87a/89a decode (+ a test-grade encoder) — pure python/numpy, zero
new deps, extending the real-codec set (PPM/BMP/PNG/JPEG/WAV/AVI).

GIF is LOSSLESS for paletted content, so unlike JPEG the round-trip
tests pin BIT-EXACT pixel equality.  Scope: first frame of a GIF87a or
GIF89a stream, global and local color tables, interlaced and sequential
row order, LZW decompression with variable code width, graphic-control
extensions (transparency index honored by substituting the palette
color — the stats pipeline has no alpha), other extensions skipped.

The encoder emits a standards-compliant single-frame GIF89a using the
classic "clear-often" LZW variant: every pixel is written as a literal
root code at ``min_code_size + 1`` bits with a Clear code inserted
before the dictionary would force a width growth.  Any conformant
reader decodes it; compression ratio is irrelevant for fixtures.

Format reference: GIF89a specification (CompuServe, public) §§15-24;
LZW per Welch 1984.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# -------------------------------------------------------------- decoder


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF truncated inside sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: LSB-first within each byte (GIF convention)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return end  # truncated stream: treat as End Of Information
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    # dictionary: entries as (prefix_code, last_byte); roots are implicit
    width = min_code_size + 1
    prefix: list[int] = [-1] * 4096
    suffix: list[int] = [0] * 4096
    next_code = end + 1
    prev = -1

    stack = bytearray()
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            width = min_code_size + 1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("GIF LZW: first code must be a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        # expand `code` (KwKwK case: code == next_code)
        c = code
        stack.clear()
        if c == next_code:
            # new entry being defined: prev + first byte of prev
            c = prev
            defer_first = True
        elif c > next_code:
            raise ValueError("GIF LZW: code out of range")
        else:
            defer_first = False
        while c >= clear + 2:
            stack.append(suffix[c])
            c = prefix[c]
        first = c
        stack.append(first)
        seq = bytes(reversed(stack))
        if defer_first:
            seq += bytes([first])
        take = min(len(seq), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(seq[:take], dtype=np.uint8)
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError(f"GIF LZW: short pixel stream {n_out} < {n_pixels}")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out.reshape(-1)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream → RGB uint8 (h, w, 3)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    transparent = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blk, pos2 = _read_sub_blocks(payload, pos)
                if len(blk) >= 4 and blk[0] & 0x01:
                    transparent = blk[3]
                pos = pos2
            else:
                _, pos = _read_sub_blocks(payload, pos)
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            table = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            idx = _lzw_decode(data, min_code, w * h)
            if ipacked & 0x40:
                idx = _deinterlace(idx, w, h)
            if np.any(idx >= len(table)):
                raise ValueError("GIF pixel index outside color table")
            # transparency: no alpha channel downstream — keep the palette
            # color (callers needing compositing swap this for RGBA)
            _ = transparent
            frame = table[idx].reshape(h, w, 3)
            if (left, top, w, h) != (0, 0, sw, sh):
                canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
                canvas[top : top + h, left : left + w] = frame
                return canvas
            return frame
        raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    raise ValueError("GIF contains no image data")


# -------------------------------------------------------------- encoder


def _palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette[n,3], indices[h*w]) — exact; refuses > 256 colors."""
    flat = pixels.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF fixture encoder: {len(colors)} colors > 256 (quantize first)"
        )
    return colors.astype(np.uint8), idx.astype(np.uint16)


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF89a from RGB uint8 (h, w, 3) with ≤256 distinct
    colors — lossless by construction (exact palette)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    h, w = pixels.shape[:2]
    pal, idx = _palette(pixels)
    # palette size: power of two ≥ max(2, n)
    bits = max(1, int(len(pal) - 1).bit_length())
    n_slots = 1 << bits
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    ipacked = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)

    if interlace:
        rows = idx.reshape(h, w)
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
        ]
        idx = rows[order].reshape(-1)

    min_code = max(2, bits)
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    out.append(min_code)

    # clear-often LZW: literal root codes only; re-Clear before the
    # dictionary counter reaches the width-growth threshold
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    budget = (1 << width) - end - 2  # codes we may emit before growth
    for v in idx:
        if budget == 0:
            put(clear)
            budget = (1 << width) - end - 2
        put(int(v))
        budget -= 1
    put(end)
    if nbits:
        body.append(acc & 0xFF)

    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
