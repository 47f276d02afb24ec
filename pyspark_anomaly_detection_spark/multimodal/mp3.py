"""MP3 (MPEG audio) frame-header walking — metadata-level triage for
compressed audio, the audio twin of the EXIF surface (exif.py): at
corpus scale you want duration / bitrate / sample-rate / channel-mode
census BEFORE committing to decode, and all of it lives in the 4-byte
frame headers, not the audio data.

Scope: header parsing ONLY (sync scan, MPEG-1/2/2.5 version bits,
Layer I/II/III, bitrate + sample-rate tables, padding, channel mode,
frame-size arithmetic, ID3v2 tag skip via synchsafe length).  The
audio payload is never decoded — Huffman/MDCT stays the documented
ffmpeg/torchaudio swap-in point, and callers can see that from
``parsed_ok`` vs a duration estimate.

Format reference: ISO/IEC 11172-3 (public), the de-facto frame-header
layout documented in every open MP3 tool.  The writer synthesizes
standards-shaped frame sequences (valid headers + zeroed payloads) so
parser tests never reduce to a round trip of shared table constants:
the test fixtures include hand-built headers with known arithmetic.
"""

from __future__ import annotations

import struct

#: bitrate kbps tables, indexed by [version_group][layer][bitrate_bits]
#: version_group: 0 = MPEG-1, 1 = MPEG-2/2.5 (public ISO tables).
_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

#: sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1).
_SAMPLE_RATES = {
    0: [11025, 12000, 8000],
    2: [22050, 24000, 16000],
    3: [44100, 48000, 32000],
}

#: samples per frame [version_group][layer]
_SAMPLES_PER_FRAME = {
    0: {1: 384, 2: 1152, 3: 1152},  # MPEG-1
    1: {1: 384, 2: 1152, 3: 576},   # MPEG-2/2.5 (Layer III halves)
}


def _frame_size(layer: int, bitrate_bps: int, rate: int, padding: int,
                version_group: int) -> int:
    if layer == 1:
        return (12 * bitrate_bps // rate + padding) * 4
    per_frame = _SAMPLES_PER_FRAME[version_group][layer]
    return per_frame // 8 * bitrate_bps // rate + padding


def parse_frame_header(b: bytes, off: int = 0) -> dict | None:
    """Parse one 4-byte frame header at ``off``; None if not a valid
    sync/field combination."""
    if off + 4 > len(b):
        return None
    h = struct.unpack_from(">I", b, off)[0]
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit sync
        return None
    version_bits = (h >> 19) & 0x3
    layer_bits = (h >> 17) & 0x3
    bitrate_bits = (h >> 12) & 0xF
    rate_bits = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    if bitrate_bits in (0, 0xF) or rate_bits == 3:
        return None  # free-form / bad
    layer = 4 - layer_bits  # 11→I(1), 10→II(2), 01→III(3)
    version_group = 0 if version_bits == 3 else 1
    table = _BITRATES_V1 if version_group == 0 else _BITRATES_V2
    bitrate = table[layer][bitrate_bits] * 1000
    rate = _SAMPLE_RATES[version_bits][rate_bits]
    return {
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version_bits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "samples": _SAMPLES_PER_FRAME[version_group][layer],
        "frame_size": _frame_size(layer, bitrate, rate, padding, version_group),
    }


def _skip_id3v2(b: bytes) -> int:
    """Byte offset past an ID3v2 tag (synchsafe 28-bit length), else 0."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = 0
    for i in range(6, 10):
        if b[i] & 0x80:
            return 0  # not synchsafe: treat as no tag
        size = (size << 7) | (b[i] & 0x7F)
    return 10 + size


def mp3_stream_info(payload: bytes, max_frames: int = 1_000_000) -> dict | None:
    """Walk consecutive frames from the first sync (after any ID3v2 tag):
    frame count, total samples, duration_ms, mean bitrate, and whether
    the whole stream parsed cleanly (``parsed_ok``) or stopped at
    garbage.  Returns None when no valid frame exists at the stream
    head."""
    pos = _skip_id3v2(payload)
    first = parse_frame_header(payload, pos)
    if first is None:
        return None
    n = 0
    total_samples = 0
    total_bitrate = 0
    rate = first["sample_rate"]
    while n < max_frames:
        fr = parse_frame_header(payload, pos)
        if fr is None or fr["sample_rate"] != rate:
            break
        if pos + fr["frame_size"] > len(payload):
            break  # final frame truncated mid-payload: do not count it
        n += 1
        total_samples += fr["samples"]
        total_bitrate += fr["bitrate"]
        pos += fr["frame_size"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": rate,
        "channels": first["channels"],
        "n_frames": n,
        "duration_ms": total_samples * 1000 // rate,
        "mean_bitrate": total_bitrate // max(n, 1),
        # ok ⇔ the walk consumed the byte stream EXACTLY: no trailing
        # garbage, no truncated tail frame
        "parsed_ok": pos == len(payload),
    }


# ---------------------------------------------------------------- writer


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3_bytes: int = 0,
) -> bytes:
    """Standards-shaped MPEG-1 Layer III frame sequence: valid headers,
    zeroed audio payloads, optional leading ID3v2 tag — enough for any
    header walker (this one or an external tool) to agree on frame
    count, duration, and bitrate."""
    try:
        br_bits = _BITRATES_V1[3].index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"unsupported Layer III bitrate {bitrate_kbps}")
    rate_bits = _SAMPLE_RATES[3].index(sample_rate)
    out = bytearray()
    if id3_bytes:
        body = bytes(id3_bytes)
        size = len(body)
        synchsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
             size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + synchsafe + body
    mode = 3 if mono else 0
    header = (
        (0x7FF << 21)
        | (3 << 19)      # MPEG-1
        | (1 << 17)      # Layer III
        | (1 << 16)      # no CRC
        | (br_bits << 12)
        | (rate_bits << 10)
        | (0 << 9)       # no padding
        | (mode << 6)
    )
    frame_size = _frame_size(3, bitrate_kbps * 1000, sample_rate, 0, 0)
    frame = struct.pack(">I", header) + bytes(frame_size - 4)
    for _ in range(n_frames):
        out += frame
    return bytes(out)
