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


def test_resize_images_plumbing(spark, sf_dir):
    """Resize contract: every image row survives with exactly w×h payload
    bytes, updated metadata, deterministic output across runs."""
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        attach_media_metadata,
        media_table_from_documents,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(media_table_from_documents(docs))
    n_images = media.filter(F.col("modality") == "image").count()

    resized = resize_images(media, target_w=8, target_h=4)
    rows = resized.collect()
    assert len(rows) == n_images > 0
    assert all(r.resize_ok == "ok" for r in rows)
    assert all(len(r.payload) == 32 and (r.width, r.height) == (8, 4) for r in rows)

    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 4).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)
