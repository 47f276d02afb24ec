"""GIF codec tests (multimodal/gif.py).  GIF is lossless for paletted
content, so round trips assert BIT-EXACT equality — plus a hand-built
byte-level fixture that does not go through the module's encoder at all
(non-circular anchor), LZW dictionary-growth coverage, and interlacing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image
from pyspark_anomaly_detection_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
)


def _hand_built_2x2() -> tuple[bytes, np.ndarray]:
    """A 2×2 GIF87a assembled byte-by-byte in the test: palette
    [black, red, green, blue], pixel indices [0,1,2,3], LZW min code 2,
    codes written at 3 bits LSB-first: Clear(4) 0 1 2 3 End(5)."""
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # gct, 4 colors
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    for rgb in palette:
        out += bytes(rgb)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(2)  # LZW min code size
    # width grows 3 → 4 bits once the decoder's dictionary counter hits 8
    # (after processing code `2`, which creates entry 7): the final data
    # code and End are therefore 4 bits wide.
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)]
    acc = nbits = 0
    body = bytearray()
    for c, width in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body.append(acc & 0xFF)
    out.append(len(body))
    out += body
    out += b"\x00\x3b"
    expected = np.array(palette, dtype=np.uint8)[[0, 1, 2, 3]].reshape(2, 2, 3)
    return bytes(out), expected


def test_hand_built_fixture_decodes_exactly():
    payload, expected = _hand_built_2x2()
    assert np.array_equal(decode_gif(payload), expected)


def _test_image(h: int, w: int, n_colors: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.int64)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.int64)
    return palette[idx].astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,n_colors,interlace",
    [
        (1, 1, 1, False),
        (7, 5, 2, False),
        (16, 24, 4, False),
        (16, 24, 4, True),  # interlaced row order
        (33, 41, 200, False),  # wide palette, odd dims
        (33, 41, 200, True),
        (64, 64, 256, False),  # full palette, forces LZW width handling
    ],
)
def test_lossless_roundtrip(h, w, n_colors, interlace):
    img = _test_image(h, w, n_colors)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_dispatch_and_feature_extraction(spark):
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        attach_media_metadata,
        extract_features,
    )

    img = _test_image(16, 24, 8)
    payload = encode_gif(img)
    assert np.array_equal(decode_image(payload), img)
    df = spark.createDataFrame(
        [(1, "image", "gif", bytearray(payload))],
        "media_id long, modality string, codec string, payload binary",
    )
    row = extract_features(attach_media_metadata(df)).collect()[0]
    assert row.decode_ok == "ok"
    assert row.feature[0] == 24.0 and row.feature[1] == 16.0
    assert abs(row.feature[4] - img[:, :, 0].mean()) < 0.5


def test_too_many_colors_refused():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.int64).astype(np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) <= 256:
        pytest.skip("random image unexpectedly had few colors")
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_truncated_stream_raises():
    img = _test_image(8, 8, 4)
    payload = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(payload[: len(payload) // 2])


from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    n_colors=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_fuzz(h, w, n_colors, interlace, seed):
    """Property: encode→decode is the identity for ANY geometry, palette
    size, interlace flag, and pixel content (GIF is lossless)."""
    img = _test_image(h, w, n_colors, seed=seed)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert np.array_equal(out, img)
