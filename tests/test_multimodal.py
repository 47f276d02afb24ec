"""Multimodal binary-column plumbing: schema, batching, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_frame(spark):
    rows = []
    for i in range(50):
        payload = bytes((i * j) % 256 for j in range(200 + i))
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                modality,
                {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                payload,
                None,
                64 if modality == "image" else None,
                64 if modality == "image" else None,
                3000 if modality == "video" else None,
            )
        )
    rows.append((99, "image", "png", None, None, None, None, None))  # null payload
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_attach(media_frame):
    out = attach_media_metadata(media_frame)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[0]["byte_len"] == 200
    assert rows[99]["byte_len"] is None


def test_feature_extraction_shape(media_frame):
    feats = extract_features(media_frame)
    pdf = feats.toPandas().set_index("media_id")
    ok = pdf[pdf["decode_ok"] == "ok"]
    assert len(ok) == 50
    assert (ok["feature_dim"] == FEATURE_DIM).all()
    assert pdf.loc[99, "decode_ok"] == "empty"
    # deterministic: histogram is L1-normalized
    vec = ok.iloc[0]["feature"]
    assert abs(sum(vec) - 1.0) < 1e-3


def test_feature_extraction_deterministic(media_frame):
    a = extract_features(media_frame).orderBy("media_id").toPandas()
    b = extract_features(media_frame.repartition(7)).orderBy("media_id").toPandas()
    assert [list(v) if v is not None else None for v in a["feature"]] == [
        list(v) if v is not None else None for v in b["feature"]
    ]


def test_frame_sampling(media_frame):
    frames = sample_frames(media_frame, every_ms=1000)
    pdf = frames.toPandas()
    video_ids = {i for i in range(50) if i % 3 == 2}
    assert set(pdf["media_id"]) == video_ids
    per_video = pdf.groupby("media_id").size()
    assert (per_video == 3).all()  # 3000ms / 1000ms
    assert (pdf["offset_ms"] % 1000 == 0).all()


def test_resize_images_real_decode_resample_reencode(spark, sf_dir):
    """Resize contract: every synthesized PPM image row goes through the
    REAL path — decoded, nearest-neighbor resampled, re-encoded as a
    standalone 8×4 PPM — with updated metadata and deterministic output
    across runs."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        attach_media_metadata,
        media_table_from_documents,
        resize_images,
    )
    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_ppm

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(media_table_from_documents(docs))
    n_images = media.filter(F.col("modality") == "image").count()

    resized = resize_images(media, target_w=8, target_h=4)
    rows = resized.collect()
    assert len(rows) == n_images > 0
    assert all(r.resize_ok == "ok" for r in rows)
    assert all((r.width, r.height) == (8, 4) for r in rows)
    for r in rows[:5]:
        small = decode_ppm(bytes(r.payload))
        assert small.shape == (4, 8, 3)

    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 4).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_resize_pixels_hand_computed_and_stub_fallback(spark):
    """Nearest-neighbor semantics pinned on a hand-checkable 4×4 block
    image (2× downsample picks the block centers), PNG inputs resize
    through the same path, and undecodable payloads fall back to the
    byte-stride stub marked 'stub'."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        resize_images,
    )
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_ppm,
        encode_png,
        encode_ppm,
        resize_pixels,
    )

    # 4×4 image of 2×2 constant blocks → 2×2 resize must pick one pixel
    # from each block
    blocks = np.zeros((4, 4, 3), dtype=np.uint8)
    for bi, val in zip([(0, 0), (0, 1), (1, 0), (1, 1)], [10, 60, 110, 210]):
        blocks[2 * bi[0] : 2 * bi[0] + 2, 2 * bi[1] : 2 * bi[1] + 2] = val
    small = resize_pixels(blocks, 2, 2)
    assert small[..., 0].tolist() == [[10, 60], [110, 210]]
    # identity resize is a no-op
    assert (resize_pixels(blocks, 4, 4) == blocks).all()

    rows = [
        (0, "image", bytearray(encode_ppm(blocks))),
        (1, "image", bytearray(encode_png(blocks, filter_type=3))),
        (2, "image", bytearray(b"\xff\xd8jpeg-not-decodable-payload-xyz")),
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, payload binary")
    got = {r.media_id: r for r in resize_images(df, 2, 2).collect()}
    for i in (0, 1):
        assert got[i].resize_ok == "ok"
        assert (decode_ppm(bytes(got[i].payload))[..., 0] == [[10, 60], [110, 210]]).all()
    assert got[2].resize_ok == "stub" and len(got[2].payload) == 4


# ---------------------------------------------------------------- codecs


def test_ppm_roundtrip_and_handmade_stats():
    """Encode a hand-built 2×2 RGB image, decode it, and check the decoded
    pixel statistics against hand-computed values."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_ppm,
        encode_ppm,
        image_stats_features,
    )

    # pixels: (0,0)=red, (0,1)=green, (1,0)=blue, (1,1)=white
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_ppm(img)
    assert payload.startswith(b"P6\n2 2\n255\n")
    decoded = decode_ppm(payload)
    assert (decoded == img).all()

    f = image_stats_features(decoded)
    assert f[0] == 2.0 and f[1] == 2.0 and f[2] == 3.0 and f[3] == 1.0  # w,h,c,aspect
    assert f[4] == 127.5 and f[5] == 127.5 and f[6] == 127.5  # channel means
    assert f[10] == 0.0 and f[11] == 255.0  # min/max
    assert f[12] == 127.5  # overall mean
    # luma of means: 0.299*127.5 + 0.587*127.5 + 0.114*127.5 = 127.5
    assert abs(f[14] - 127.5) < 1e-9
    assert f[15] == 0.5  # half the bytes are nonzero


def test_ppm_header_comments():
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_ppm

    raw = b"P6\n# a comment\n3 1\n# another\n255\n" + bytes(range(9))
    img = decode_ppm(raw)
    assert img.shape == (1, 3, 3)
    assert (img.reshape(-1) == np.arange(9)).all()


def test_bmp_roundtrip_with_row_padding():
    """3×2 BMP: row stride is 12 bytes (9 pixel + 3 pad) — the padding and
    bottom-up/BGR conventions must cancel out exactly in the roundtrip."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    assert payload[:2] == b"BM"
    # stride (3*3 -> 12) x 2 rows = 24 data bytes + 54 header
    assert len(payload) == 54 + 24
    assert (decode_bmp(payload) == img).all()


def test_bmp_topdown_rows():
    """Negative biHeight means top-down row order; decode must not flip."""
    import struct

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_bmp,
        encode_bmp,
    )

    img = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    payload = bytearray(encode_bmp(img))
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)  # flag top-down
    decoded = decode_bmp(bytes(payload))
    # encoder wrote bottom-up data; reading it as top-down = vertical flip
    assert (decoded == img[::-1]).all()


def test_codec_rejects_unsupported():
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image

    with _pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"II*\x00tiff-payload")  # TIFF magic: no native codec
    with _pytest.raises(ValueError):  # JPEG magic but truncated garbage
        decode_image(b"\xff\xd8\xff\xe0jfif-jpeg-payload")
    with _pytest.raises(ValueError, match="missing IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")  # PNG magic, no chunks
    with _pytest.raises(ValueError):
        decode_image(b"")


def test_codec_roundtrip_property():
    """Property: encode→decode is the identity for arbitrary geometry,
    both formats, including widths that exercise every BMP pad length."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(42)
    for w in (1, 2, 3, 4, 5, 17):
        for h in (1, 3, 8):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_ppm(encode_ppm(img)) == img).all(), (w, h)
            assert (decode_bmp(encode_bmp(img)) == img).all(), (w, h)


def test_png_roundtrip_every_filter_type():
    """Property: encode→decode is the identity for every PNG filter type
    (0 none, 1 sub, 2 up, 3 average, 4 paeth), RGB and RGBA, across
    geometries — pixels sourced the same way the PPM property test
    sources them."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for ch in (3, 4):
        for w, h in ((1, 1), (3, 2), (5, 8), (17, 4)):
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            for ftype in range(5):
                got = decode_png(encode_png(img, filter_type=ftype))
                assert got.shape == (h, w, ch), (ch, w, h, ftype)
                assert (got == img).all(), (ch, w, h, ftype)


def test_png_decode_matches_ppm_pixels_and_dispatch():
    """The same pixel array encoded as PPM and as PNG must decode to
    identical arrays through the magic-sniffing decode_image; RGBA PNGs
    drop alpha to stay (h, w, 3) for the stats pipeline."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_image,
        encode_png,
        encode_ppm,
        image_stats_features,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    via_ppm = decode_image(encode_ppm(img))
    via_png = decode_image(encode_png(img, filter_type=4))
    assert (via_ppm == via_png).all()
    assert image_stats_features(via_ppm) == image_stats_features(via_png)

    rgba = np.dstack([img, np.full((6, 9), 128, dtype=np.uint8)])
    via_rgba = decode_image(encode_png(rgba, filter_type=2))
    assert via_rgba.shape == (6, 9, 3)
    assert (via_rgba == img).all()


def test_png_crc_and_unsupported_variants_rejected():
    import numpy as np
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    # flip a byte inside IHDR data (offset: 8 magic + 8 len/type + 2)
    payload[18] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(payload))

    # 16-bit / grayscale / interlaced IHDRs must be rejected, not garbled
    import struct as _struct
    import zlib as _zlib

    def ihdr_only(depth, color, interlace):
        data = _struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        chunk = (
            _struct.pack(">I", len(data))
            + b"IHDR"
            + data
            + _struct.pack(">I", _zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF)
        )
        return PNG_MAGIC + chunk

    # every standard variant decodes now; malformed combos (16-bit
    # palette, sub-byte truecolor — both illegal per spec) still refuse
    for depth, color, interlace in ((16, 3, 0), (4, 2, 0), (2, 6, 0)):
        with _pytest.raises(ValueError, match="unsupported PNG variant"):
            decode_png(ihdr_only(depth, color, interlace))


def test_png_payloads_decode_in_spark_pipeline(spark):
    """extract_features over REAL PNG payloads: features must be the
    hand-computed pixel statistics (width/height parsed from IHDR, pixel
    moments through inflate + unfiltering), not the histogram fallback."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal import codecs
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        extract_features,
    )

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8) for i in range(3)}
    rows = [
        (i, "image", bytearray(codecs.encode_png(img, filter_type=i % 5)))
        for i, img in imgs.items()
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, payload binary")
    got = {r.media_id: r for r in extract_features(df).collect()}
    import numpy as _np

    for i, img in imgs.items():
        assert got[i].decode_ok == "ok"
        # FEATURE_SCHEMA carries float32 — compare at float32 precision
        want = _np.array(codecs.image_stats_features(img), dtype=_np.float32)
        assert (_np.array(got[i].feature, dtype=_np.float32) == want).all()
        assert got[i].feature[0] == 12.0 and got[i].feature[1] == 8.0


def test_real_decode_in_spark_pipeline(spark, sf_dir):
    """End-to-end: synthesized image rows carry real PPM payloads; the
    mapInPandas extraction must REALLY decode them — feature[0]/[1] are the
    parsed width/height (16), feature[2] the channel count — and the values
    must match a driver-side decode of the same payload bit-for-bit."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        extract_features,
        media_table_from_documents,
    )
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_image,
        image_stats_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = media_table_from_documents(docs)
    images = media.filter(F.col("modality") == "image")
    feats = (
        extract_features(media)
        .filter(F.col("modality") == "image")
        .orderBy("media_id")
        .collect()
    )
    assert len(feats) == images.count() > 0
    assert all(r.decode_ok == "ok" and r.feature_dim == FEATURE_DIM for r in feats)
    assert all(r.feature[0] == 16.0 and r.feature[1] == 16.0 for r in feats)  # w, h
    assert all(r.feature[2] == 3.0 for r in feats)  # channels

    # cross-check one payload against a driver-side reference decode
    # (FEATURE_SCHEMA carries float32, so compare at float32 precision)
    import numpy as np

    sample = images.orderBy("media_id").first()
    expected = image_stats_features(decode_image(bytes(sample.payload)))
    got = list(next(r.feature for r in feats if r.media_id == sample.media_id))
    assert got == [float(np.float32(v)) for v in expected]


def test_wav_roundtrip_and_chunk_walking():
    import numpy as np
    import struct
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(4000)
    sine = (0.25 * 32767 * np.sin(2 * np.pi * 200 * t / 8000)).astype(np.int16)
    wav = encode_wav(sine, 8000)
    rate, back = decode_wav(wav)
    assert rate == 8000 and back.shape == (4000, 1) and (back[:, 0] == sine).all()

    # chunk walking: a LIST chunk between fmt and data must be skipped
    fmt_chunk, data_chunk = wav[12:36], wav[36:]
    list_chunk = struct.pack("<4sI", b"LIST", 6) + b"INFOxx"
    padded = wav[:4] + struct.pack("<I", len(wav) - 8 + 14) + wav[8:12]
    exotic = padded + fmt_chunk + list_chunk + data_chunk
    rate2, back2 = decode_wav(exotic)
    assert rate2 == 8000 and (back2 == back).all()


def test_audio_features_sine_properties():
    """Hand-computed expectations: a pure sine of amplitude A has
    rms = A/√2, zero-crossing rate = 2f/rate, and its spectral energy
    concentrates in the band containing f."""
    import numpy as np
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        N_AUDIO_BANDS,
        audio_stats_features,
        decode_wav,
        encode_wav,
    )

    rate, freq, amp = 8000, 440, 0.5
    t = np.arange(rate)  # 1 s
    sine = (amp * 32767 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
    f = audio_stats_features(*decode_wav(encode_wav(sine, rate)))
    assert len(f) == 16
    assert f[0] == rate and f[1] == 1 and f[2] == rate and f[3] == 1.0
    assert abs(f[4] - amp / np.sqrt(2)) < 1e-3  # rms
    assert abs(f[7] - 2 * freq / rate) < 1e-3  # zcr
    bands = f[8:]
    # 440 Hz lives in rfft bin 440 of 4001 → band 0 of 8; it dominates
    assert bands[440 * N_AUDIO_BANDS // 4001] == max(bands) > 0.9


def test_q70_audio_rows_decode_real_wav(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        _SYNTH_WAV_FRAMES,
        _SYNTH_WAV_RATE,
        extract_features,
        media_table_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = media_table_from_documents(docs)
    feats = (
        extract_features(media)
        .filter(F.col("modality") == "audio")
        .orderBy("media_id")
        .collect()
    )
    assert len(feats) > 0
    assert all(r.decode_ok == "ok" and r.feature_dim == FEATURE_DIM for r in feats)
    assert all(r.feature[0] == float(_SYNTH_WAV_RATE) for r in feats)  # rate
    assert all(r.feature[1] == 1.0 for r in feats)  # mono
    assert all(r.feature[2] == float(_SYNTH_WAV_FRAMES) for r in feats)  # frames

    # cross-check one payload against a driver-side reference decode
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        audio_stats_features,
        decode_wav,
    )
    import numpy as np

    sample = media.filter(F.col("modality") == "audio").orderBy("media_id").first()
    expected = audio_stats_features(*decode_wav(bytes(sample.payload)))
    got = list(next(r.feature for r in feats if r.media_id == sample.media_id))
    assert np.allclose(
        np.array(got), np.array(expected, dtype=np.float32), rtol=1e-6
    )


def test_avi_roundtrip_and_handmade_stats():
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_avi,
        encode_avi,
        video_stats_features,
    )

    # 2 frames of 2x2: frame 0 all black, frame 1 all white
    frames = np.zeros((2, 2, 2, 3), dtype=np.uint8)
    frames[1] = 255
    fps, dec = decode_avi(encode_avi(frames, fps=2))
    assert fps == 2.0
    assert (dec == frames).all()

    feats = video_stats_features(fps, dec)
    # luma of 255,255,255 with integer ITU weights: (77+150+29)*255 >> 8 = 255
    assert feats[:5] == [2.0, 2.0, 2.0, 2.0, 1.0]  # fps, n, w, h, duration
    assert feats[5] == 127.5  # luma mean over both frames
    assert feats[7] == 0.0 and feats[8] == 255.0  # luma min / max
    assert feats[9] == 255.0 and feats[10] == 255.0  # motion mean / max
    assert feats[14] == 0.0 and feats[15] == 255.0  # first / last frame luma


def test_avi_roundtrip_property():
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(11)
    for n, h, w in [(1, 3, 3), (5, 2, 7), (3, 16, 16)]:
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        fps, dec = decode_avi(encode_avi(frames, fps=8))
        assert fps == 8.0
        assert dec.shape == frames.shape
        assert (dec == frames).all()  # odd widths exercise row padding


def test_avi_rejects_garbage():
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_avi

    with _pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        decode_avi(b"not even riff")


def test_q70_video_rows_decode_real_avi(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        _SYNTH_AVI_FPS,
        _SYNTH_AVI_FRAMES,
        _SYNTH_AVI_H,
        _SYNTH_AVI_W,
        extract_features,
        media_table_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = media_table_from_documents(docs)
    feats = (
        extract_features(media)
        .filter(F.col("modality") == "video")
        .orderBy("media_id")
        .collect()
    )
    assert len(feats) > 0
    assert all(r.decode_ok == "ok" and r.feature_dim == FEATURE_DIM for r in feats)
    assert all(r.feature[0] == float(_SYNTH_AVI_FPS) for r in feats)
    assert all(r.feature[1] == float(_SYNTH_AVI_FRAMES) for r in feats)
    assert all(r.feature[2] == float(_SYNTH_AVI_W) for r in feats)
    assert all(r.feature[3] == float(_SYNTH_AVI_H) for r in feats)

    # cross-check one payload against a driver-side reference decode
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_avi,
        video_stats_features,
    )

    sample = media.filter(F.col("modality") == "video").orderBy("media_id").first()
    expected = video_stats_features(*decode_avi(bytes(sample.payload)))
    got = list(next(r.feature for r in feats if r.media_id == sample.media_id))
    assert np.allclose(np.array(got), np.array(expected, dtype=np.float32), rtol=1e-6)


def test_real_frame_sampling_from_avi(spark, sf_dir):
    import numpy as np

    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        _SYNTH_AVI_FRAMES,
        _SYNTH_AVI_H,
        _SYNTH_AVI_W,
        media_table_from_documents,
    )
    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_avi,
        decode_ppm,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = media_table_from_documents(docs)
    # 4 frames @ 4 fps = 1000 ms; sampling every 250 ms hits every frame
    frames = sample_frames(media, every_ms=250).orderBy("media_id", "frame_idx")
    pdf = frames.toPandas()
    assert (pdf["decode_ok"] == "ok").all()
    per_video = pdf.groupby("media_id").size()
    assert (per_video == _SYNTH_AVI_FRAMES).all()
    assert (pdf["frame_w"] == _SYNTH_AVI_W).all()
    assert (pdf["frame_h"] == _SYNTH_AVI_H).all()

    # every emitted frame payload is a standalone PPM that re-decodes to
    # the exact frame of the source AVI
    sample = media.filter(F.col("modality") == "video").orderBy("media_id").first()
    _, src_frames = decode_avi(bytes(sample.payload))
    emitted = pdf[pdf["media_id"] == sample.media_id].reset_index(drop=True)
    for k in range(_SYNTH_AVI_FRAMES):
        frame = decode_ppm(bytes(emitted.loc[k, "frame_payload"]))
        assert (frame == src_frames[emitted.loc[k, "frame_idx"]]).all()
        f = src_frames[emitted.loc[k, "frame_idx"]].astype(np.int64)
        luma = (77 * f[..., 0] + 150 * f[..., 1] + 29 * f[..., 2]) >> 8
        assert abs(emitted.loc[k, "luma_mean"] - luma.mean()) < 1e-5


def test_frame_sampling_stub_path_preserved(spark):
    """Non-AVI codecs (mp4 etc.) keep the deterministic byte-slice stub."""
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import MEDIA_SCHEMA

    rows = [(1, "video", "mp4", bytes(range(200)), None, None, None, 3000)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pdf = sample_frames(df, every_ms=1000).toPandas()
    assert list(pdf["offset_ms"]) == [0, 1000, 2000]
    assert (pdf["decode_ok"] == "stub").all()
    assert bytes(pdf.loc[0, "frame_payload"]) == bytes(range(200))[0:64]


def test_g711_wav_decode_matches_reference_tables():
    """μ-law/A-law expansion checked against the stdlib audioop reference
    (an INDEPENDENT G.711 implementation) over every possible code byte;
    geometry and interleave via a 2-channel payload."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_g711,
    )

    codes = np.arange(256, dtype=np.uint8)
    for law, audioop_fn in (("ulaw", "ulaw2lin"), ("alaw", "alaw2lin")):
        payload = encode_wav_g711(codes, law=law)
        rate, samples = decode_wav(payload)
        assert rate == 8000 and samples.shape == (256, 1)
        try:
            import audioop  # deprecated but present on 3.11
        except ImportError:
            continue
        want = np.frombuffer(
            getattr(audioop, audioop_fn)(codes.tobytes(), 2), dtype="<i2"
        )
        assert np.array_equal(samples[:, 0], want), law

    # stereo interleave survives
    stereo = np.stack([codes[:100], codes[100:200]], axis=1)
    rate, samples = decode_wav(encode_wav_g711(stereo, law="ulaw"))
    assert samples.shape == (100, 2)


def test_wav_rejects_unknown_codec_tag():
    import numpy as np
    import pytest as _pytest

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_g711,
    )

    payload = bytearray(encode_wav_g711(np.zeros(4, dtype=np.uint8)))
    # rewrite format tag to 2 (ADPCM) — must refuse, not garble
    payload[20:22] = (2).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="unsupported WAV codec"):
        decode_wav(bytes(payload))


def test_png_palette_grayscale_and_gray_alpha_decode():
    """Color types 0/3/4 decoded from hand-assembled PNG bytes (the
    module encoder only emits RGB/RGBA, so these payloads are built
    chunk-by-chunk in the test — non-circular)."""
    import struct
    import zlib

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    def build(color_type, ch, w, h, scanbytes, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + scanbytes[y * w * ch : (y + 1) * w * ch] for y in range(h))
        return (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + extra
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # palette: 3 colors, 3x2 image
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = bytes([0, 1, 2, 2, 1, 0])
    png = build(3, 1, 3, 2, idx, extra=_png_chunk(b"PLTE", palette.tobytes()))
    out = decode_png(png)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out.reshape(-1, 3), palette[list(idx)])

    # grayscale: values replicate to RGB
    gray = bytes([0, 80, 160, 255])
    out = decode_png(build(0, 1, 2, 2, gray))
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[:, :, 0].reshape(-1), np.frombuffer(gray, np.uint8))
    assert np.array_equal(out[:, :, 0], out[:, :, 1])

    # gray+alpha: (g, a) interleaved → (g, g, g, a)
    ga = bytes([10, 255, 200, 128])
    out = decode_png(build(4, 2, 2, 1, ga))
    assert out.shape == (1, 2, 4)
    assert out[0, 0].tolist() == [10, 10, 10, 255]
    assert out[0, 1].tolist() == [200, 200, 200, 128]

    # palette index beyond PLTE refuses
    bad = build(3, 1, 1, 1, bytes([7]), extra=_png_chunk(b"PLTE", palette.tobytes()))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="palette index"):
        decode_png(bad)


def test_png_adam7_interlace_roundtrip():
    """Adam7: encode→decode identity across geometries that exercise
    empty passes (tiny images), odd dims, RGBA, and non-zero filters."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for h, w, ch, ft in (
        (1, 1, 3, 0),    # only pass 1 non-empty
        (3, 5, 3, 0),    # several empty passes
        (8, 8, 3, 2),    # exactly one tile, Up filter
        (16, 24, 4, 4),  # RGBA + Paeth
        (33, 41, 3, 3),  # odd dims + Average
    ):
        img = rng.integers(0, 256, (h, w, ch), dtype=np.int64).astype(np.uint8)
        out = decode_png(encode_png(img, filter_type=ft, interlace=True))
        assert out.shape == img.shape, (h, w, ch)
        assert np.array_equal(out, img), (h, w, ch, ft)


def test_png_16bit_decodes_high_byte():
    """16-bit RGB PNG hand-assembled (big-endian sample pairs, filter 0):
    decode keeps the high byte of each sample — including a value whose
    low byte differs, proving the byte order is right."""
    import struct
    import zlib

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    # 2×1 image; samples (hi, lo): pixel0 = (10,99),(20,1),(30,255),
    # pixel1 = (200,0),(150,77),(0,128)
    samples = [10, 99, 20, 1, 30, 255, 200, 0, 150, 77, 0, 128]
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    raw = b"\x00" + bytes(samples)
    png = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [10, 20, 30]
    assert out[0, 1].tolist() == [200, 150, 0]


def test_png_sub_byte_palette_and_gray():
    """1/2/4-bit packed scanlines, hand-assembled: palette indices unpack
    MSB-first; sub-byte grayscale scales to the full 8-bit range."""
    import struct
    import zlib

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import (
        PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    def build(color_type, depth, w, h, rows, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + extra
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 2-bit palette, 5 pixels/row (rows pad to byte): indices 0,1,2,3,0
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    row = bytes([0b00_01_10_11, 0b00_000000])  # MSB-first: 0,1,2,3 then 0
    png = build(3, 2, 5, 1, [row], extra=_png_chunk(b"PLTE", palette.tobytes()))
    out = decode_png(png)
    assert out.shape == (1, 5, 3)
    assert np.array_equal(out[0], palette[[0, 1, 2, 3, 0]])

    # 1-bit grayscale 8×1: 0b10110001 → 255/0 pattern
    png = build(0, 1, 8, 1, [bytes([0b10110001])])
    out = decode_png(png)
    assert out[0, :, 0].tolist() == [255, 0, 255, 255, 0, 0, 0, 255]

    # 4-bit grayscale: values 0..15 scale by 17
    png = build(0, 4, 4, 1, [bytes([0x0F, 0x5A])])
    out = decode_png(png)
    assert out[0, :, 0].tolist() == [0, 255, 5 * 17, 10 * 17]


def test_wild_system_images_decode():
    """Real-world files shipped with the OS/python install — decoded by
    code paths never touched by this repo's encoders (palette PNG, 2-bit
    palette PNG, RGBA PNG, baseline JPEG, LZW GIFs)."""
    import glob
    import os

    import pytest as _pytest

    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image

    candidates = [
        "/usr/share/gitweb/static/git-logo.png",       # 8-bit palette
        "/usr/share/gitweb/static/git-favicon.png",    # 2-bit palette
        "/usr/share/doc/python3/_static/file.png",     # RGBA
    ] + glob.glob(
        "/root/.pyenv/versions/*/lib/python3.*/site-packages/IPython/core/tests/2x2.jpg"
    ) + glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")[:3]
    present = [f for f in candidates if os.path.exists(f)]
    if not present:
        _pytest.skip("no system images on this host")
    for f in present:
        arr = decode_image(open(f, "rb").read())
        assert arr.ndim == 3 and arr.shape[2] in (3, 4) and arr.size > 0, f
        assert 0.0 <= float(arr.mean()) <= 255.0


def test_metadata_parsers_never_raise_on_fuzzed_bytes():
    """The non-crash contract of the metadata-triage parsers, fuzzed:
    random byte strings, truncated valid files, and bit-flipped valid
    files must parse to SOMETHING (a dict or None), never raise — a
    corrupt corpus file must cost one bad row, not a Spark task."""
    import random
    import struct

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.exif import (
        build_exif_app1,
        inject_exif,
        parse_exif,
    )
    from pyspark_anomaly_detection_spark.multimodal.jpeg import (
        encode_jpeg_baseline,
    )
    from pyspark_anomaly_detection_spark.multimodal.mp3 import mp3_stream_info
    from pyspark_anomaly_detection_spark.multimodal.mp4 import parse_mp4

    rng = random.Random(99)
    parsers = (parse_exif, mp3_stream_info, parse_mp4)

    # pure-noise inputs (with plausible magic prefixes mixed in)
    prefixes = [b"", b"\xff\xd8", b"ID3", struct.pack(">I", 16) + b"ftyp"]
    for _ in range(200):
        blob = rng.choice(prefixes) + bytes(
            rng.getrandbits(8) for _ in range(rng.randint(0, 64))
        )
        for parse in parsers:
            parse(blob)  # must not raise

    # valid EXIF-tagged JPEG: every truncation point, and bit flips
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    valid = inject_exif(
        encode_jpeg_baseline(img, quality=85, subsampling="420"),
        build_exif_app1(orientation=3, make="Cam", model="M", width=8, height=8),
    )
    for cut in range(0, min(len(valid), 120)):
        parse_exif(valid[:cut])
    for _ in range(150):
        i = rng.randrange(len(valid))
        mutated = bytearray(valid)
        mutated[i] ^= 1 << rng.randrange(8)
        parse_exif(bytes(mutated))


def test_dhash56_known_bits(spark):
    """Hand-computable dHash: a left-to-right row gradient sets every
    comparison bit; a constant image sets none; a single descending row
    clears exactly that row's 7 bits."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.binary_ops import dhash56

    up = np.repeat(
        np.arange(32, dtype=np.uint8)[None, :, None], 3, axis=2
    ).repeat(32, axis=0).reshape(32, 32, 3)
    assert dhash56(up) == (1 << 56) - 1
    flat = np.full((32, 32, 3), 7, dtype=np.uint8)
    assert dhash56(flat) == 0


def test_dhash_near_pairs_complete_vs_brute_force(spark):
    """Pigeonhole banding must return EXACTLY the brute-force Hamming
    pairs at the radius — including a pair whose differing bits are
    spread across max_hamming distinct bands."""
    import itertools

    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        dhash_near_pairs,
    )

    base = 0x00FACEB00C5EED
    rows = [
        (1, base),
        (2, base ^ 0b11),                      # hamming 2, one band
        (3, base ^ (1 << 0) ^ (1 << 12) ^ (1 << 24) ^ (1 << 36)),  # 4 bands
        (4, base ^ ((1 << 20) - 1)),           # hamming far beyond radius
        (5, base),                             # exact duplicate
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_near_pairs(df, max_hamming=4).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 4:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert (1, 5) in got and got[(1, 5)] == 0
    assert (1, 3) in got and got[(1, 3)] == 4


def test_dhash_near_pairs_plan_is_equijoin(spark):
    """The band join must plan as a hash equi-join on (_band, _bv) —
    never a cartesian/nested-loop — and verify with JVM bit_count."""
    from pyspark_anomaly_detection_spark import plans
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        dhash_near_pairs,
    )

    df = spark.range(100).select(
        F.col("id").alias("media_id"), (F.col("id") * 37).alias("dhash")
    )
    plan = plans.formatted_plan(dhash_near_pairs(df))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "hashpartitioning(_band" in plan or "_band" in plan
