"""Progressive-JPEG (SOF2) codec tests (multimodal/jpeg.py).

Ground truth strategy: `encode_jpeg_progressive` quantizes IDENTICALLY
to `encode_jpeg_baseline` (same quality scaling, same fDCT, same
tables), so a correct progressive decode must reconstruct the exact
same coefficient arrays and therefore BIT-IDENTICAL pixels to the
baseline round trip — a far stronger oracle than a PSNR floor, and one
that exercises every scan kind in the standard 10-scan script: DC
first + DC refinement, spectral AC bands, two successive-approximation
AC refinement passes, and EOB-run coding.  Analytic anchors and
malformed-input raises cover what round trips can't.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image
from pyspark_anomaly_detection_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _noise(shape, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (*shape, 3), dtype=np.uint8)


def _gradient(h, w):
    g = np.outer(np.linspace(0, 1, h), np.linspace(0, 1, w))
    img = np.stack([g * 255, g * 128 + 64, (1 - g) * 255], axis=2)
    return np.round(img).astype(np.uint8)


def test_sof2_marker_emitted():
    enc = encode_jpeg_progressive(_noise((16, 16)))
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    # 10 scans in the standard script → 10 SOS markers
    assert enc.count(b"\xff\xda") == 10


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (37, 21), (9, 25), (48, 33)])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_progressive_decode_matches_baseline_bitexact(shape, subsampling):
    """Same quantization ⇒ same coefficients ⇒ identical pixels: any
    deviation in any scan kind (spectral band, refinement, EOB run)
    breaks this equality."""
    img = _noise(shape)
    base = decode_jpeg(encode_jpeg_baseline(img, 85, subsampling))
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, subsampling))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("rst", [1, 2, 7])
def test_progressive_restart_intervals(rst):
    """RSTn markers reset DC predictors AND the EOB run per scan; the
    result must not depend on the restart interval at all."""
    img = _gradient(40, 56)
    ref = decode_jpeg(encode_jpeg_progressive(img, 85, "420", 0))
    out = decode_jpeg(encode_jpeg_progressive(img, 85, "420", rst))
    assert np.array_equal(ref, out)


@pytest.mark.parametrize("quality", [30, 50, 85, 95])
def test_progressive_smooth_image_quality_sweep(quality):
    """Smooth gradients maximize EOB-run lengths (most blocks have
    all-zero high bands) — the quality sweep varies how many refinement
    bits are non-trivial."""
    img = _gradient(48, 64)
    base = decode_jpeg(encode_jpeg_baseline(img, quality, "444"))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality, "444"))
    assert np.array_equal(base, prog)
    assert _psnr(prog, img) >= 30.0


def test_uniform_image_decodes_exactly():
    """Analytic anchor: uniform grey 128 ⇒ all coefficients zero ⇒
    every scan transmits only EOB runs / zero DC diffs ⇒ decode is
    exactly 128 everywhere."""
    img = np.full((24, 24, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(out, img)


def test_decode_image_dispatch_handles_progressive():
    img = _gradient(16, 24)
    out = decode_image(encode_jpeg_progressive(img))
    assert out.shape == (16, 24, 3)
    assert _psnr(out, img) >= 30.0


def test_truncated_progressive_raises():
    """Dropping a restart interval's worth of entropy data must fail
    loud, mirroring the baseline decoder's truncated-restart behavior."""
    img = _noise((32, 32), seed=3)
    enc = encode_jpeg_progressive(img, 85, "444", restart_interval=2)
    # chop the stream at the LAST RSTn marker: the final scan now has
    # fewer intervals than its MCU count requires
    cut = max(enc.rfind(bytes([0xFF, 0xD0 + i])) for i in range(8))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(enc[:cut] + b"\xff\xd9")


def test_mixed_dc_ac_scan_raises():
    enc = bytearray(encode_jpeg_baseline(_noise((16, 16))))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(8, 48),
    w=st.integers(8, 48),
    subsampling=st.sampled_from(["444", "420"]),
    rst=st.integers(0, 3),
    phase=st.floats(0.0, 6.28),
)
def test_progressive_fuzz_matches_baseline(h, w, subsampling, rst, phase):
    """Property: for ANY geometry/subsampling/restart combination the
    progressive decode equals the baseline decode bit-for-bit."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(xx / 17.0 + phase) * np.cos(yy / 13.0 - phase)
    img = np.stack(
        [base, np.roll(base, 3, axis=1), np.roll(base, 2, axis=0)], axis=2
    )
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    a = decode_jpeg(
        encode_jpeg_baseline(img, 85, subsampling, restart_interval=rst)
    )
    b = decode_jpeg(
        encode_jpeg_progressive(img, 85, subsampling, restart_interval=rst)
    )
    assert np.array_equal(a, b)
