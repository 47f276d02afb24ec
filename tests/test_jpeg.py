"""Baseline-JPEG codec tests (multimodal/jpeg.py).

Ground truth strategy: the encoder and decoder share only the DCT basis
matrix, so round trips alone could mask a matched pair of bugs.  The
anchor tests therefore use ANALYTICALLY-computable cases:

* a uniform-color image is DC-only — its decode is hand-computable from
  the quantization arithmetic alone, no transform involved;
* a single-cosine image exercises exactly one AC coefficient whose
  reconstruction is a closed-form cosine, checked against a cosine
  computed directly in the test.

Round trips then pin PSNR floors across subsampling modes, restart
intervals, odd sizes, and the Spark-side dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image
from pyspark_anomaly_detection_spark.multimodal.jpeg import (
    QUANT_LUMA,
    _quality_scale,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_uniform_image_roundtrips_exactly():
    """DC-only hand computation: Y = 128 ⇒ level-shifted block is all
    zero ⇒ every coefficient quantizes to 0 ⇒ decode must be exactly
    128 everywhere (grey has Cb = Cr = 128 ⇒ RGB = (128,128,128))."""
    img = np.full((24, 24, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=85))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_uniform_nongray_dc_quantization_arithmetic():
    """Uniform non-grey color: decode is fully determined by DC
    quantization: dc_hat = round(8·(v−128)/q00)·q00/8 + 128 per plane —
    computed here WITHOUT any DCT, then color-converted with the same
    BT.601 constants the spec fixes."""
    rgb = np.array([200, 60, 90], dtype=float)
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = rgb.astype(np.uint8)
    quality = 85
    ql = _quality_scale(QUANT_LUMA, quality)
    from pyspark_anomaly_detection_spark.multimodal.jpeg import QUANT_CHROMA

    qc = _quality_scale(QUANT_CHROMA, quality)

    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def dc_hat(v, q00):
        # orthonormal DCT of a constant 8x8 block: F[0,0] = 8·(v−128),
        # all else 0; quantize, dequantize, inverse ⇒ constant block.
        return round(8.0 * (v - 128.0) / q00) * q00 / 8.0 + 128.0

    y_hat = dc_hat(y, ql[0, 0])
    cb_hat = dc_hat(cb, qc[0, 0]) - 128.0
    cr_hat = dc_hat(cr, qc[0, 0]) - 128.0
    expected = np.clip(
        np.round(
            [
                y_hat + 1.402 * cr_hat,
                y_hat - 0.344136 * cb_hat - 0.714136 * cr_hat,
                y_hat + 1.772 * cb_hat,
            ]
        ),
        0,
        255,
    ).astype(np.uint8)

    out = decode_jpeg(encode_jpeg_baseline(img, quality=quality))
    assert np.array_equal(np.unique(out.reshape(-1, 3), axis=0)[0], expected) or (
        np.abs(out.astype(int) - expected.astype(int)).max() <= 1
    ), (out[0, 0], expected)
    # the decoded image must be uniform
    assert (out == out[0, 0]).all()


def test_single_cosine_basis_reconstruction():
    """One AC coefficient: grey image modulated by the (0,1) DCT basis
    cos((2x+1)π/16) along x.  The decoded luma must match the
    quantize-dequantize closed form of that one coefficient, computed in
    the test with an independently-written cosine (no shared code
    path with the module's DCT matrix)."""
    amp = 40.0
    x = np.arange(8)
    basis = np.cos((2 * x + 1) * np.pi / 16.0)  # u=1 row basis
    y_plane = 128.0 + amp * np.tile(basis, (8, 1))
    img = np.clip(np.round(y_plane), 0, 255).astype(np.uint8)
    img3 = np.stack([img, img, img], axis=2)  # grey ⇒ chroma constant 128

    quality = 85
    ql = _quality_scale(QUANT_LUMA, quality)
    # orthonormal forward coefficient for this pattern:
    # F[0,1] = sum over block of pixel·C — for f(x,y)=A·cos basis,
    # F[0,1] = A·sqrt(8)·(1/2)·Σ cos² = A·sqrt(8)·2/sqrt(2)… compute
    # numerically with the test's own cosine instead of deriving:
    c0 = np.sqrt(1.0 / 8.0) * np.ones(8)
    c1 = 0.5 * basis
    shifted = np.round(y_plane) - 128.0
    f01 = c0 @ shifted @ c1  # only nonzero AC (plus rounding residue)
    q01 = ql[0, 1]
    f01_hat = round(f01 / q01) * q01
    recon = 128.0 + f01_hat * np.outer(c0, c1)
    expected = np.clip(np.round(recon), 0, 255)

    out = decode_jpeg(encode_jpeg_baseline(img3, quality=quality))
    # rounding the input pixels adds small residue in other coefficients
    # that may quantize away or not — allow ±2
    assert np.abs(out[:, :, 0].astype(float) - expected).max() <= 2


@pytest.mark.parametrize(
    "shape,subsampling,quality,rst",
    [
        ((40, 56), "444", 85, 0),
        ((40, 56), "420", 85, 0),
        ((33, 41), "444", 85, 0),  # odd dims: edge padding
        ((33, 41), "420", 75, 0),  # odd dims + subsampling
        ((40, 56), "420", 85, 3),  # restart markers
        ((16, 16), "444", 95, 1),  # restart every MCU
    ],
)
def test_gradient_roundtrip_psnr(shape, subsampling, quality, rst):
    h, w = shape
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1), (xx + yy) * 255 // (w + h - 2)],
        axis=2,
    ).astype(np.uint8)
    enc = encode_jpeg_baseline(
        img, quality=quality, subsampling=subsampling, restart_interval=rst
    )
    out = decode_jpeg(enc)
    assert out.shape == img.shape
    floor = 38.0 if subsampling == "444" else 33.0
    assert _psnr(out, img) >= floor


def test_noise_roundtrip_high_quality():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.int64).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert _psnr(out, img) >= 30.0


def test_decode_image_dispatch_sniffs_jpeg():
    img = np.full((16, 24, 3), 77, dtype=np.uint8)
    payload = encode_jpeg_baseline(img)
    out = decode_image(payload)
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, img)


def test_unsupported_sof_rejected_cleanly():
    """Lossless (SOF3) stays a clean raise; progressive (SOF2) is now
    implemented — a baseline stream rewritten to SOF2 has an illegal
    full-band interleaved scan and must also fail loud, not decode
    garbage."""
    img = np.full((16, 16, 3), 10, dtype=np.uint8)
    enc = bytearray(encode_jpeg_baseline(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(enc))
    enc[i + 1] = 0xC2  # SOF2 with a baseline Ss=0..Se=63 scan: malformed
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))


def test_extract_features_handles_jpeg_payload(spark):
    """Spark-side plumbing: a JPEG payload flows through the
    mapInPandas feature extractor with decode_ok='ok' and real geometry
    features (width 24, height 16)."""
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        attach_media_metadata,
        extract_features,
    )

    img = np.full((16, 24, 3), 200, dtype=np.uint8)
    payload = encode_jpeg_baseline(img, quality=90)
    df = spark.createDataFrame(
        [(1, "image", "jpeg", bytearray(payload))],
        "media_id long, modality string, codec string, payload binary",
    )
    row = extract_features(attach_media_metadata(df)).collect()[0]
    assert row.decode_ok == "ok"
    assert row.feature[0] == 24.0  # width
    assert row.feature[1] == 16.0  # height


def test_q178_jpeg_decode_stats_geometry_and_determinism(spark, sf_dir):
    """Distributed round trip: every synthesized JPEG decodes ok with the
    exact synthesized geometry, and the aggregate is identical under a
    different input partitioning (content depends only on text)."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        _JPEG_H,
        _JPEG_W,
        attach_media_metadata,
        extract_features,
        jpeg_media_from_documents,
    )
    from pyspark_anomaly_detection_spark.registry import all_queries

    docs = load_table(spark, sf_dir, "documents")
    n = docs.filter(F.col("doc_id") % 7 == 0).count()

    rows = all_queries()["q178_jpeg_decode_stats"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_media == n and r.n_ok == n
    assert r.width_sum == float(_JPEG_W * n)
    assert r.height_sum == float(_JPEG_H * n)
    assert r.luma_in_band and r.rgb_channels

    # content depends only on (doc_id, text), never on partitioning:
    # the corpus luma statistic is identical under a different layout
    def luma_sum(d):
        media = jpeg_media_from_documents(d)
        return (
            extract_features(attach_media_metadata(media))
            .agg(F.sum(F.element_at("feature", 15)).alias("s"))
            .collect()[0]
            .s
        )

    assert abs(luma_sum(docs) - luma_sum(docs.repartition(13))) < 1e-6


def test_fill_bytes_before_markers_tolerated():
    """T.81 §B.1.1.2 allows 0xFF fill bytes before any marker — inject
    some between segments and decode must be unaffected."""
    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    # insert fill bytes before the SOF0 marker
    i = enc.find(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    out = decode_jpeg(padded)
    assert np.array_equal(out, decode_jpeg(enc))


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(8, 48),
    w=st.integers(8, 48),
    subsampling=st.sampled_from(["444", "420"]),
    rst=st.integers(0, 4),
    phase=st.floats(0.0, 6.28),
)
def test_jpeg_roundtrip_fuzz_smooth_images(h, w, subsampling, rst, phase):
    """Property: any smooth (low-frequency) image round-trips above the
    PSNR floor for every geometry, subsampling mode, and restart
    interval — the codec must not have size-dependent corruption."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(xx / 17.0 + phase) * np.cos(yy / 13.0 - phase)
    img = np.stack(
        [base, np.roll(base, 3, axis=1), np.roll(base, 2, axis=0)], axis=2
    )
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    out = decode_jpeg(
        encode_jpeg_baseline(img, quality=85, subsampling=subsampling, restart_interval=rst)
    )
    assert out.shape == img.shape
    assert _psnr(out, img) >= 30.0
