"""Multimodal columns: opaque binary payloads + typed metadata (north star).

Design: media is carried as ``binary`` columns with a metadata struct
(modality, codec, width/height/duration, byte length) — the schema a 100 TB
multimodal training-data lake would use.  Transformations run as
Arrow-batched ``mapInPandas`` so payload bytes stream through Python in
columnar batches without per-row overhead; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory at
large payload sizes.

The actual codecs (image decode/resize, audio decode, video frame-sample)
are STUBBED behind ``_decode_payload`` — the container ships no media
libraries (see module constant ``REAL_CODECS_AVAILABLE``) — with a
deterministic fake decoder so the Spark-side plumbing (schema, batching,
partition behavior, UDF signatures) is fully real and testable.  Swapping
in Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real codecs are optional; the engine works (stubbed) without them
    import PIL.Image  # noqa: F401

    REAL_CODECS_AVAILABLE = True
except ImportError:
    REAL_CODECS_AVAILABLE = False

#: Canonical multimodal record schema.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("codec", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("decode_ok", StringType(), False),
    ]
)

FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive byte-length metadata JVM-side (no Python in the hot path)."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long"))


def _decode_payload(payload: bytes, modality: str) -> list[float]:
    """STUB decode → fixed-dim feature vector.

    Deterministic fake: byte-histogram folded to FEATURE_DIM buckets,
    L1-normalized.  Replace with Pillow / torchaudio / ffmpeg frame
    sampling when ``REAL_CODECS_AVAILABLE``.
    """
    if REAL_CODECS_AVAILABLE and modality == "image":  # pragma: no cover
        raise NotImplementedError("real image decode not wired in this container")
    if payload is None:
        return []
    buckets = [0] * FEATURE_DIM
    for b in payload:
        buckets[b % FEATURE_DIM] += 1
    total = sum(buckets) or 1
    return [round(x / total, 6) for x in buckets]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds N payloads; decode errors are
    captured per-row (``decode_ok``) instead of failing the task — the
    quarantine pattern applied to media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features, dims, status = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    vec = _decode_payload(payload, modality)
                    features.append(vec)
                    dims.append(len(vec))
                    status.append("ok" if vec else "empty")
                except Exception as exc:  # decode quarantine, not task failure
                    features.append(None)
                    dims.append(None)
                    status.append(f"error:{type(exc).__name__}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": features,
                    "feature_dim": pd.array(dims, dtype="Int32"),
                    "decode_ok": status,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from ``documents`` (the testdata has
    no binary columns): payload = utf-8 text bytes, modality round-robin
    by id, duration for "video" rows derived from byte length.  Everything
    downstream treats the payload as opaque bytes — exactly as real media
    would flow."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.lit("stub").alias("codec"),
        F.encode("text", "utf-8").alias("payload"),
    ).withColumn(
        "duration_ms",
        F.when(
            F.col("modality") == "video", (F.length("payload") % 5000).cast("int")
        ),
    )


@register("q70_multimodal_features", oracle=None)  # rows-only: python decode stub
def q70_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: synthesize media from documents →
    JVM-side metadata → Arrow-batched mapInPandas feature extraction →
    per-modality aggregate of decode status and feature mass."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(media_table_from_documents(docs))
    feats = extract_features(media)
    return (
        feats.groupBy("modality", "decode_ok")
        .agg(
            F.count("*").alias("n_media"),
            F.max("feature_dim").alias("feature_dim"),
            F.sum(F.element_at("feature", 1)).alias("bucket0_mass"),
        )
        .orderBy("modality", "decode_ok")
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset (real frame extraction stubbed — offsets computed from
    ``duration_ms`` metadata JVM-side, payload sliced per frame)."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.coalesce("duration_ms", F.lit(0)) - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.posexplode(offsets).alias("frame_idx", "offset_ms"),
            F.col(payload_col),
        )
        # stub "frame": a deterministic byte slice keyed by offset
        .withColumn(
            "frame_payload",
            F.substring(
                F.col(payload_col), (F.col("offset_ms") % 64) + 1, 64
            ).cast("binary"),
        )
        .drop(payload_col)
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resize_ok", StringType(), False),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas``: Arrow batches of binary
    payloads in, resized payloads + updated width/height metadata out,
    per-row error capture (``resize_ok``) instead of task failure.

    The codec is STUBBED (no Pillow in this container): the "resized"
    payload is a deterministic ``target_w·target_h``-byte downsample of
    the input bytes (stride sampling — shape-correct, reproducible).
    Swap ``_stub_resize`` for ``PIL.Image.resize`` in production; the
    Spark-side contract (schema, batch shape, metadata update, error
    quarantine) is what this function owns and what the tests pin.
    """
    import pandas as pd

    n_out = target_w * target_h

    def _stub_resize(payload: bytes) -> bytes:
        if not payload:
            raise ValueError("empty payload")
        stride = max(1, len(payload) // n_out)
        return bytes(payload[(i * stride) % len(payload)] for i in range(n_out))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload": [],
                "width": [],
                "height": [],
                "resize_ok": [],
            }
            for payload in pdf["payload"]:
                try:
                    out["payload"].append(_stub_resize(bytes(payload)))
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["resize_ok"].append("ok")
                except Exception as exc:
                    out["payload"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resize_ok"].append(f"error: {exc}")
            yield pd.DataFrame(out)

    images = df.filter(F.col("modality") == "image").select(
        "media_id", "modality", "payload"
    )
    return images.mapInPandas(run, RESIZE_SCHEMA)
