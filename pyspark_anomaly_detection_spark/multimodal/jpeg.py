"""Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1) — pure numpy +
stdlib, zero new deps.  Real multimodal corpora are JPEG-dominated, so
the image decode path needs this to be real, not a Pillow swap-in stub
(round-3 verdict directive #2).

Scope: baseline DCT (SOF0/1) AND progressive DCT (SOF2 — spectral
selection + successive approximation, EOB runs, DC/AC refinement
scans), Huffman entropy coding, 8-bit precision, grayscale or YCbCr,
any sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0), restart
intervals, JFIF/APPn/COM segments skipped.  Real web corpora are
heavily progressive, so SOF2 is first-class, not a raise.  Arithmetic
coding / lossless / hierarchical / 12-bit are out of scope (rare in
training corpora; raise cleanly).

The encoder exists for round-trip testing and fixture generation: it
emits standards-compliant baseline files (Annex K quantization + Huffman
tables, IJG quality scaling) that any external viewer can open, and the
decoder reads the DHT/DQT from the FILE — so decode correctness never
depends on the encoder's table choices.

Spark integration: `decode_image` (codecs.py) sniffs the FF D8 magic and
dispatches here; the multimodal pipeline decodes inside mapInPandas over
binary columns (multimodal/binary_ops.py), so the per-image Python cost
rides the existing Arrow-batched lane.

Format reference: ITU-T T.81 (public), esp. §B (syntax), §F.2 (baseline
decode), Annex K (example tables).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

#: Zig-zag scan order: ZIGZAG[i] = (row, col) of the i-th transmitted
#: coefficient.  Built programmatically (diagonal walk) instead of a
#: 64-literal table.
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        order.extend(diag if s % 2 else diag[::-1])
    return order


ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

#: Annex K.1 quantization tables (natural row-major order).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: Annex K.3 Huffman table specs: (bits[16], huffval) per (class, id).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
for _bits, _vals in (
    (_DC_LUMA_BITS, _DC_LUMA_VALS),
    (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    (_AC_LUMA_BITS, _AC_LUMA_VALS),
    (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "Huffman table spec mismatch"

#: Orthonormal 8-point DCT-II matrix: F = C @ x @ C.T, x = C.T @ F @ C.
_DCT = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ------------------------------------------------------- Huffman tables


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) via T.81 §C.2 canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: Fast-lookup width: codes up to this length resolve with ONE table
#: index (stb_image-style).  10 covers every Annex K code ≤ 10 bits AND
#: the uniform 9/10-bit progressive-fixture tables.
_FAST_BITS = 10


class _HuffTable:
    """Decode table: a 2^{_FAST_BITS}-entry (symbol, length) fast array
    for short codes + the (length, code) dict for the rare long ones."""

    __slots__ = ("codes", "fast")

    def __init__(self, bits: list[int], vals: list[int]):
        canonical = _canonical_codes(bits, vals)
        self.codes = {
            (length, code): sym for sym, (code, length) in canonical.items()
        }
        self.fast: list[tuple[int, int] | None] = [None] * (1 << _FAST_BITS)
        for sym, (code, length) in canonical.items():
            if length <= _FAST_BITS:
                prefix = code << (_FAST_BITS - length)
                for i in range(1 << (_FAST_BITS - length)):
                    self.fast[prefix | i] = (sym, length)


def _decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    return _HuffTable(bits, vals)


# ----------------------------------------------------------- bit reader


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # §F.2.2.5: missing bits at the tail decode as 1s (padding)
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        # byte-chunked: pulls up to 8 bits per iteration instead of one
        v = 0
        data, size = self.data, len(self.data)
        while n > 0:
            if self.pos >= size:
                return (v << n) | ((1 << n) - 1)  # 1-padding at the tail
            take = 8 - self.bit
            if take > n:
                take = n
            chunk = (data[self.pos] >> (8 - self.bit - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def _peek_fast(self) -> int:
        """Next _FAST_BITS bits without consuming (1-padded past the end)."""
        data, size, p = self.data, len(self.data), self.pos
        b0 = data[p] if p < size else 0xFF
        b1 = data[p + 1] if p + 1 < size else 0xFF
        b2 = data[p + 2] if p + 2 < size else 0xFF
        return ((b0 << 16) | (b1 << 8) | b2) >> (
            24 - _FAST_BITS - self.bit
        ) & ((1 << _FAST_BITS) - 1)

    def _skip(self, n: int) -> None:
        self.bit += n
        self.pos += self.bit >> 3
        self.bit &= 7

    def read_symbol(self, table: _HuffTable) -> int:
        hit = table.fast[self._peek_fast()]
        if hit is not None:
            self._skip(hit[1])
            return hit[0]
        # long code (> _FAST_BITS) or invalid: bit-serial walk
        codes = table.codes
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = codes.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(code: int, s: int) -> int:
    """§F.2.2.1 EXTEND: map s-bit magnitude code to signed value."""
    return code if code >= (1 << (s - 1)) else code - (1 << s) + 1


# -------------------------------------------------------------- decoder


def _entropy_intervals(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect the entropy-coded data starting at ``pos``: unstuff
    FF 00 → FF, split at RSTn markers.  Returns (intervals, position of
    the next non-RST marker's 0xFF byte)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF and i + 1 < n:
            nxt = payload[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → RGB uint8 (h, w, 3).  Grayscale
    replicates to 3 channels so downstream feature extraction sees one
    shape."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}  # id → 64 ints, zigzag order
    htables: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    progressive = False
    restart_interval = 0
    scan = None
    prog_scans: list[tuple] = []  # (scan_comps, ss, se, ah, al, dri, intervals)

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # §B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(
                        np.int32
                    )
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}); "
                "baseline sequential and progressive are implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            pos += seglen
            if not progressive:
                break  # single entropy-coded segment follows
            # Progressive: §B.2.3 scan header carries spectral selection
            # (Ss..Se) + successive approximation (Ah, Al); Huffman
            # tables are resolved NOW (DHT may be redefined per scan).
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            scan_comps = [
                (cid, htables.get((0, td)), htables.get((1, ta)))
                for cid, td, ta in scan
            ]
            intervals, pos = _entropy_intervals(payload, pos)
            prog_scans.append(
                (scan_comps, ss, se, a >> 4, a & 0xF, restart_interval, intervals)
            )
            continue
        pos += seglen

    if progressive:
        if frame is None or not prog_scans:
            raise ValueError("JPEG missing SOF/SOS")
        return _decode_progressive(frame, prog_scans, qtables)

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    # --- collect entropy segments, splitting at restart markers and
    # unstuffing FF 00 → FF
    intervals, _ = _entropy_intervals(payload, pos)

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component plane buffers (padded to whole MCUs)
    planes = {
        cid: np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    scan_info = []  # (cid, hs, vs, qtab_zz, dc_table, ac_table)
    for cid, td, ta in scan:
        hs, vs, tq = comp_by_id[cid]
        scan_info.append(
            (cid, hs, vs, qtables[tq], htables[(0, td)], htables[(1, ta)])
        )

    preds = {cid: 0 for cid, *_ in scan_info}
    reader = _BitReader(intervals[0])
    interval_idx = 0
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    # Fail loud on truncated entropy data (matches the
                    # decoder's other malformed-input paths) instead of
                    # re-reading the exhausted interval as garbage pixels.
                    raise ValueError(
                        "JPEG truncated: fewer restart intervals than MCUs require"
                    )
                reader = _BitReader(intervals[interval_idx])
                preds = {cid: 0 for cid in preds}
            for cid, hs, vs, qzz, dct_dc, dct_ac in scan_info:
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        s = reader.read_symbol(dct_dc)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(dct_ac)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros((8, 8))
                        block[_ZZ_ROWS, _ZZ_COLS] = zz * qzz
                        pix = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _planes_to_rgb(
    planes: dict, comps: list, h: int, w: int, hmax: int, vmax: int
) -> np.ndarray:
    """Upsample component planes to full resolution, crop, color-convert."""
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------- progressive decoder (SOF2)
#
# T.81 §G.2: the frame's DCT coefficients are assembled across MULTIPLE
# scans before a single dequantize+iDCT pass.  Each scan carries either
# a spectral band of one component (AC scans: Ss..Se, always
# non-interleaved) or the DC coefficients of one or more components
# (Ss = Se = 0, may be interleaved), at successive-approximation
# precision Al; scans with Ah > 0 refine one extra magnitude bit of an
# earlier scan's coefficients.  AC scans add EOB-run symbols (EOBn =
# RRRRSSSS with SSSS = 0, RRRR < 15) that end 2^r..2^(r+1)-1 blocks at
# once (§G.1.2.2); AC refinement scans (§G.1.2.3) interleave correction
# bits for already-nonzero coefficients with newly-significant ±1 bits.


def _dc_first_block(reader, table, blk, pred: int, al: int) -> int:
    s = reader.read_symbol(table)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred += diff
    blk[0] = pred << al
    return pred


def _dc_refine_block(reader, blk, al: int) -> None:
    # §G.1.2.1: DC point transform is an arithmetic shift, so the
    # refinement bit ORs into the two's-complement value directly.
    if reader.read_bit():
        blk[0] |= 1 << al


def _ac_first_block(reader, table, blk, ss, se, al, eobrun: int) -> int:
    """§G.1.2.2 first AC scan of a band; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of 2^r (+ extra bits) ended blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG progressive AC index overrun")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(reader, table, blk, ss, se, al, eobrun: int) -> int:
    """§G.1.2.3 AC refinement: correction bits for already-nonzero
    coefficients, ±1<<Al for newly-significant ones.  Returns the
    updated EOB run."""
    plus = 1 << al

    def correct(k: int) -> None:
        if reader.read_bit() and (blk[k] & plus) == 0:
            blk[k] += plus if blk[k] > 0 else -plus

    if eobrun > 0:
        for k in range(ss, se + 1):
            if blk[k] != 0:
                correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(table)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                # run out the remainder of THIS block reading correction
                # bits only (r larger than any band length)
                r = 64
        else:
            if s != 1:
                raise ValueError("JPEG progressive AC refine symbol != 1")
            val = plus if reader.read_bit() else -plus
        while k <= se:
            if blk[k] != 0:
                correct(k)
            else:
                if r == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return eobrun


def _decode_progressive(frame, scans, qtables) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    # Coefficient accumulators over the INTERLEAVED (padded) block grid,
    # zigzag index order; scans mutate rows in place.
    coef = {
        cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
        for cid, hs, vs, _ in comps
    }

    for scan_comps, ss, se, ah, al, dri, intervals in scans:
        if ss == 0 and se != 0:
            raise ValueError("JPEG progressive scan mixes DC and AC")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("JPEG progressive AC scan must be non-interleaved")
        reader = _BitReader(intervals[0])
        interval_idx = 0
        preds = {cid: 0 for cid, _, _ in scan_comps}
        eobrun = 0
        unit_count = 0

        def next_interval():
            nonlocal reader, interval_idx, preds, eobrun
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError(
                    "JPEG truncated: fewer restart intervals than MCUs require"
                )
            reader = _BitReader(intervals[interval_idx])
            preds = {cid: 0 for cid in preds}
            eobrun = 0

        if ss == 0 and len(scan_comps) > 1:
            # interleaved DC scan: MCU order, all components
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and unit_count and unit_count % dri == 0:
                        next_interval()
                    for cid, dc_tab, _ in scan_comps:
                        hs, vs, _ = comp_by_id[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = coef[cid][my * vs + by, mx * hs + bx]
                                if ah == 0:
                                    preds[cid] = _dc_first_block(
                                        reader, dc_tab, blk, preds[cid], al
                                    )
                                else:
                                    _dc_refine_block(reader, blk, al)
                    unit_count += 1
        else:
            # non-interleaved scan (single component): raster over the
            # component's OWN block grid (§A.2.2 — ceil of the
            # component's sample dims, NOT the padded MCU grid)
            cid, dc_tab, ac_tab = scan_comps[0]
            hs, vs, _ = comp_by_id[cid]
            cbx = -(-(-(-w * hs // hmax)) // 8)
            cby = -(-(-(-h * vs // vmax)) // 8)
            for byi in range(cby):
                for bxi in range(cbx):
                    if dri and unit_count and unit_count % dri == 0:
                        next_interval()
                    blk = coef[cid][byi, bxi]
                    if ss == 0:
                        if ah == 0:
                            preds[cid] = _dc_first_block(
                                reader, dc_tab, blk, preds[cid], al
                            )
                        else:
                            _dc_refine_block(reader, blk, al)
                    elif ah == 0:
                        eobrun = _ac_first_block(
                            reader, ac_tab, blk, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine_block(
                            reader, ac_tab, blk, ss, se, al, eobrun
                        )
                    unit_count += 1

    # single dequantize + iDCT pass, same per-block expression as the
    # baseline path (bit-identical reconstruction for identical coefs)
    planes = {}
    for cid, hs, vs, tq in comps:
        qzz = qtables[tq]
        grid = coef[cid]
        plane = np.zeros((grid.shape[0] * 8, grid.shape[1] * 8))
        for byi in range(grid.shape[0]):
            for bxi in range(grid.shape[1]):
                block = np.zeros((8, 8))
                block[_ZZ_ROWS, _ZZ_COLS] = grid[byi, bxi] * qzz
                plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = (
                    _DCT.T @ block @ _DCT + 128.0
                )
        planes[cid] = plane
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


# -------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per §F.1.2.3


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def _block_grid(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to 8-multiples → (by, bx, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // 8, 8, pw // 8, 8).swapaxes(1, 2)


def _fdct_quant(block: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    f = _DCT @ (block - 128.0) @ _DCT.T
    q = np.round(f / qtab).astype(np.int32)
    return q[_ZZ_ROWS, _ZZ_COLS]


def _encode_setup(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color-convert, subsample, block grids
    (luma padded to the full MCU grid), quality-scaled quant tables.
    Returns (h, w, ql, qc, ql_zz, qc_zz, yb, cbb, crb, hs_l, vs_l,
    mcus_x, mcus_y)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("JPEG encoder expects (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = pixels.shape[:2]
    p = pixels.astype(np.float64)
    r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    ql_zz = ql[_ZZ_ROWS, _ZZ_COLS]
    qc_zz = qc[_ZZ_ROWS, _ZZ_COLS]

    if subsampling == "420":
        hs_l = vs_l = 2
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
        crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
        cb_s = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cr_s = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
    else:
        hs_l = vs_l = 1
        cb_s, cr_s = cb, cr

    yb = _block_grid(y)
    cbb = _block_grid(cb_s)
    crb = _block_grid(cr_s)
    mcus_y = -(-h // (8 * vs_l))
    mcus_x = -(-w // (8 * hs_l))
    # luma grid must cover the full MCU grid (420: odd block count pads)
    need_by, need_bx = mcus_y * vs_l, mcus_x * hs_l
    if yb.shape[0] < need_by or yb.shape[1] < need_bx:
        pad_b = np.zeros((need_by, need_bx, 8, 8))
        pad_b[:, :] = 128.0
        pad_b[: yb.shape[0], : yb.shape[1]] = yb
        # replicate edge blocks for padding rows/cols
        for byi in range(yb.shape[0], need_by):
            pad_b[byi, : yb.shape[1]] = yb[-1]
        for bxi in range(yb.shape[1], need_bx):
            pad_b[:, bxi] = pad_b[:, yb.shape[1] - 1]
        yb = pad_b
    return h, w, ql, qc, ql_zz, qc_zz, yb, cbb, crb, hs_l, vs_l, mcus_x, mcus_y


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB uint8 (h, w, 3) → baseline JFIF bytes.  subsampling: '444' or
    '420'.  restart_interval > 0 emits DRI + RSTn markers every that
    many MCUs (exercises the decoder's restart path)."""
    (h, w, ql, qc, ql_zz, qc_zz, yb, cbb, crb, hs_l, vs_l, mcus_x, mcus_y) = (
        _encode_setup(pixels, quality, subsampling)
    )

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    # DQT (two tables, 8-bit)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00]) + bytes(
        ql_zz.astype(np.uint8).tolist()
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01]) + bytes(
        qc_zz.astype(np.uint8).tolist()
    )
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs_l << 4) | vs_l, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT ×4
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                preds = {1: 0, 2: 0, 3: 0}
            for by in range(vs_l):
                for bx in range(hs_l):
                    zz = _fdct_quant(yb[my * vs_l + by, mx * hs_l + bx], ql)
                    preds[1] = _encode_block(writer, zz, preds[1], dc_l, ac_l)
            zz = _fdct_quant(cbb[my, mx], qc)
            preds[2] = _encode_block(writer, zz, preds[2], dc_c, ac_c)
            zz = _fdct_quant(crb[my, mx], qc)
            preds[3] = _encode_block(writer, zz, preds[3], dc_c, ac_c)
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------- progressive encoder
#
# Fixture generator for the SOF2 decoder: emits a standards-compliant
# progressive stream using the standard 10-scan script (DC with one
# successive-approximation refinement; luma AC split into a 1..5 band
# then 6..63, refined twice; chroma AC full-band, refined once) — the
# same shape libjpeg's default progressive script produces, so every
# decoder path (spectral bands, DC/AC refinement, EOB runs) is
# exercised.  Huffman tables are FIXED uniform tables (all 256 RS
# symbols present) rather than per-scan optimized ones: Annex K's
# example tables lack the EOBn symbols (0x10, 0x20, …) progressive AC
# scans need, and test fixtures trade ~2× bitstream size for zero
# table-derivation code.

#: (component indices, Ss, Se, Ah, Al) per scan — components 0=Y 1=Cb 2=Cr.
_PROGRESSIVE_SCRIPT = [
    ([0, 1, 2], 0, 0, 0, 1),  # DC first pass, interleaved
    ([0], 1, 5, 0, 2),        # luma AC low band
    ([2], 1, 63, 0, 1),       # chroma AC full band
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),       # luma AC high band
    ([0], 1, 63, 2, 1),       # luma AC refine 2→1
    ([0, 1, 2], 0, 0, 1, 0),  # DC refinement
    ([2], 1, 63, 1, 0),       # chroma AC refine 1→0
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),       # luma AC refine 1→0
]

#: Uniform Huffman specs: DC = 16 categories at 5 bits; AC = all 256
#: RS symbols at 9 bits (255) + 10 bits (1).  Kraft sums < 1, no
#: all-ones max-length code — valid canonical tables.
_UNIFORM_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_UNIFORM_DC_VALS = list(range(16))
_UNIFORM_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_UNIFORM_AC_VALS = list(range(256))


class _EobrunBuffer:
    """Pending EOB run (+ buffered AC-refinement correction bits) —
    §G.1.2.2/G.1.2.3 encoder state, flushed before any non-EOB symbol,
    at restart boundaries, and at scan end."""

    __slots__ = ("writer", "codes", "run", "bits")

    def __init__(self, writer: _BitWriter, codes: dict):
        self.writer = writer
        self.codes = codes
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run > 0:
            r = self.run.bit_length() - 1
            code, length = self.codes[r << 4]
            self.writer.write(code, length)
            if r:
                self.writer.write(self.run - (1 << r), r)
        for b in self.bits:
            self.writer.write(b, 1)
        self.run = 0
        self.bits = []

    def add(self, correction_bits: list[int]) -> None:
        self.run += 1
        self.bits.extend(correction_bits)
        if self.run == 0x7FFF:  # EOB14 ceiling
            self.flush()


def _encode_ac_first(writer, eob, blk, ss, se, al, ac_codes) -> None:
    run = 0
    emitted = False
    for k in range(ss, se + 1):
        t = int(blk[k])
        v = t >> al if t >= 0 else -((-t) >> al)
        if v == 0:
            run += 1
            continue
        eob.flush()
        emitted = True
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run > 0 or not emitted:
        eob.add([])


def _encode_ac_refine(writer, eob, blk, ss, se, al, ac_codes) -> None:
    band = [int(blk[k]) for k in range(ss, se + 1)]
    absv = [(abs(t) >> al) for t in band]
    last_sig = -1  # band-relative index of last newly-significant coef
    for i, t in enumerate(absv):
        if t == 1:
            last_sig = i
    run = 0
    corrections: list[int] = []  # bits for already-nonzero coefs in run
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # ZRL flush runs at EVERY nonzero coefficient (also t > 1 ones):
        # this keeps run ≤ 15 whenever a correction bit is buffered, so
        # every buffered bit falls inside the decoder's current ZRL
        # window (16 zero-history skips).  ZRLs past the last newly-
        # significant coefficient fold into the EOB run instead.
        while run > 15 and i <= last_sig:
            eob.flush()
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
            for b in corrections:
                writer.write(b, 1)
            corrections = []
        if t > 1:  # already nonzero: correction bit; run NOT broken
            corrections.append(t & 1)
            continue
        # newly significant (magnitude 1 at this precision)
        eob.flush()
        code, length = ac_codes[(run << 4) | 1]
        writer.write(code, length)
        writer.write(1 if band[i] > 0 else 0, 1)
        for b in corrections:
            writer.write(b, 1)
        corrections = []
        run = 0
    if run > 0 or corrections:
        eob.add(corrections)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB uint8 (h, w, 3) → progressive (SOF2) JFIF bytes using the
    standard 10-scan script.  Quantization is identical to
    ``encode_jpeg_baseline`` at the same quality/subsampling, so the two
    decode to bit-identical pixels."""
    (h, w, ql, qc, ql_zz, qc_zz, yb, cbb, crb, hs_l, vs_l, mcus_x, mcus_y) = (
        _encode_setup(pixels, quality, subsampling)
    )

    # quantized zigzag coefficient grids per component (0=Y 1=Cb 2=Cr)
    def coef_grid(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
        nby, nbx = blocks.shape[:2]
        out = np.zeros((nby, nbx, 64), dtype=np.int32)
        for byi in range(nby):
            for bxi in range(nbx):
                out[byi, bxi] = _fdct_quant(blocks[byi, bxi], qtab)
        return out

    grids = [coef_grid(yb, ql), coef_grid(cbb, qc), coef_grid(crb, qc)]
    samp = [(hs_l, vs_l), (1, 1), (1, 1)]
    comp_ids = [1, 2, 3]

    dc_codes = _canonical_codes(_UNIFORM_DC_BITS, _UNIFORM_DC_VALS)
    ac_codes = _canonical_codes(_UNIFORM_AC_BITS, _UNIFORM_AC_VALS)

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00]) + bytes(
        ql_zz.astype(np.uint8).tolist()
    )
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01]) + bytes(
        qc_zz.astype(np.uint8).tolist()
    )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs_l << 4) | vs_l, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, th, bits, vals in (
        (0, 0, _UNIFORM_DC_BITS, _UNIFORM_DC_VALS),
        (1, 0, _UNIFORM_AC_BITS, _UNIFORM_AC_VALS),
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comp_idxs, ss, se, ah, al in _PROGRESSIVE_SCRIPT:
        ns = len(comp_idxs)
        sos = bytes([ns])
        for ci in comp_idxs:
            sos += bytes([comp_ids[ci], 0x00])  # Td=0, Ta=0 (uniform)
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        # units of this scan: interleaved MCUs (DC, ns>1) or raster
        # blocks of the single component's own grid
        units: list[list[tuple[int, np.ndarray]]] = []
        if ss == 0 and ns > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for ci in comp_idxs:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                unit.append(
                                    (ci, grids[ci][my * vs + by, mx * hs + bx])
                                )
                    units.append(unit)
        else:
            ci = comp_idxs[0]
            hs, vs = samp[ci]
            hmax, vmax = samp[0]
            cbx = -(-(-(-w * hs // hmax)) // 8)
            cby = -(-(-(-h * vs // vmax)) // 8)
            for byi in range(cby):
                for bxi in range(cbx):
                    units.append([(ci, grids[ci][byi, bxi])])

        # split into restart chunks; fresh predictors/EOB state per chunk
        chunk_size = restart_interval or len(units)
        rst_n = 0
        for start in range(0, len(units), max(1, chunk_size)):
            if start:
                out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
            writer = _BitWriter()
            eob = _EobrunBuffer(writer, ac_codes)
            preds = [0, 0, 0]
            for unit in units[start : start + chunk_size]:
                for ci, blk in unit:
                    if ss == 0 and ah == 0:
                        v = int(blk[0]) >> al  # arithmetic shift (§G.1.2.1)
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        code, length = dc_codes[s]
                        writer.write(code, length)
                        if s:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
                    elif ss == 0:
                        writer.write((int(blk[0]) >> al) & 1, 1)
                    elif ah == 0:
                        _encode_ac_first(writer, eob, blk, ss, se, al, ac_codes)
                    else:
                        _encode_ac_refine(writer, eob, blk, ss, se, al, ac_codes)
            eob.flush()
            writer.flush()
            out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
