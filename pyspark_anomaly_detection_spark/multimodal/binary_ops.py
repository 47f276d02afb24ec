"""Multimodal columns: opaque binary payloads + typed metadata (north star).

Design: media is carried as ``binary`` columns with a metadata struct
(modality, codec, width/height/duration, byte length) — the schema a 100 TB
multimodal training-data lake would use.  Transformations run as
Arrow-batched ``mapInPandas`` so payload bytes stream through Python in
columnar batches without per-row overhead; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory at
large payload sizes.

Image decode is REAL for uncompressed formats: ``codecs.decode_image``
parses binary PPM (P6) and 24-bit BMP with pure numpy — actual
width/height, actual pixel arrays, actual per-channel statistics
(``codecs.image_stats_features``).  Audio decode is REAL for RIFF/WAVE
16-bit PCM: ``codecs.decode_wav`` walks the chunk list and emits signal
moments + an 8-band spectrum (``codecs.audio_stats_features``).
Compressed formats (JPEG/PNG/MP3/...) and video codecs remain the
documented Pillow/ffmpeg swap-in point (see ``REAL_CODECS_AVAILABLE``);
those payloads fall back to a deterministic byte-histogram feature so
the plumbing stays total.
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
    """Decode → FEATURE_DIM feature vector.

    Images in a natively-decodable format (PPM/BMP — magic-sniffed) go
    through the REAL numpy decoder and emit pixel statistics
    (``codecs.image_stats_features``: geometry, per-channel moments, luma).
    Audio in RIFF/WAVE 16-bit PCM decodes through ``codecs.decode_wav``
    and emits signal moments + coarse spectrum.  Everything else
    (video, compressed formats) falls back to a deterministic
    L1-normalized byte histogram folded to FEATURE_DIM buckets — replace
    with torchaudio/ffmpeg/Pillow per modality.
    """
    from pyspark_anomaly_detection_spark.multimodal import codecs

    if payload is None:
        return []
    if modality == "image" and payload[:2] in (codecs.PPM_MAGIC, codecs.BMP_MAGIC):
        return codecs.image_stats_features(codecs.decode_image(bytes(payload)))
    if modality == "audio" and payload[:4] == codecs.WAV_MAGIC:
        return codecs.audio_stats_features(*codecs.decode_wav(bytes(payload)))
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


#: Synthetic image geometry for media_table_from_documents: 16×16 RGB ⇒
#: 768 pixel bytes = 48 MD5 digests (16 bytes each), generated JVM-side.
_SYNTH_W = _SYNTH_H = 16
_SYNTH_DIGESTS = (_SYNTH_W * _SYNTH_H * 3) // 16


def _synthetic_ppm_payload() -> F.Column:
    """A REAL binary-PPM payload built entirely JVM-side: ASCII P6 header
    concatenated with 768 deterministic pixel bytes (``unhex`` over chained
    ``md5(text, i)`` digests).  Decodable by ``codecs.decode_ppm`` — no
    Python in the synthesis path, so media generation scales like any
    other projection."""
    header = F.encode(F.lit("P6\n%d %d\n255\n" % (_SYNTH_W, _SYNTH_H)), "utf-8")
    pixel_hex = F.concat_ws(
        "",
        *[
            F.md5(F.concat_ws("|", F.col("text"), F.lit(str(i))))
            for i in range(_SYNTH_DIGESTS)
        ],
    )
    return F.concat(header, F.unhex(pixel_hex))


#: Synthetic audio geometry: 384 mono int16 frames @ 8 kHz = 768 PCM bytes
#: = 48 MD5 digests, generated JVM-side like the PPM pixels.
_SYNTH_WAV_RATE = 8000
_SYNTH_WAV_FRAMES = 384
_SYNTH_WAV_DIGESTS = (_SYNTH_WAV_FRAMES * 2) // 16


def _synthetic_wav_payload() -> F.Column:
    """A REAL RIFF/WAVE 16-bit PCM payload built entirely JVM-side: the
    44-byte header is a constant (frame count is fixed), the PCM body is
    deterministic noise from chained ``md5(text, i)`` digests.  Decodable
    by ``codecs.decode_wav`` — no Python in the synthesis path."""
    from pyspark_anomaly_detection_spark.multimodal import codecs

    import numpy as np

    header = codecs.encode_wav(
        np.zeros(_SYNTH_WAV_FRAMES, dtype=np.int16), _SYNTH_WAV_RATE
    )[:44]
    pcm_hex = F.concat_ws(
        "",
        *[
            F.md5(F.concat_ws("|", F.lit("wav"), F.col("text"), F.lit(str(i))))
            for i in range(_SYNTH_WAV_DIGESTS)
        ],
    )
    return F.concat(F.lit(header), F.unhex(pcm_hex))


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from ``documents`` (the testdata has
    no binary columns): modality round-robin by id; image rows carry a
    REAL decodable 16×16 binary-PPM payload, audio rows a REAL decodable
    8 kHz 16-bit PCM WAV (both built JVM-side from text hashes); video
    rows carry opaque utf-8 text bytes with duration derived from byte
    length.  Everything downstream treats the payload as opaque bytes —
    exactly as real media would flow."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.when(modality == "image", F.lit("ppm"))
        .when(modality == "audio", F.lit("wav"))
        .otherwise(F.lit("stub"))
        .alias("codec"),
        F.when(modality == "image", _synthetic_ppm_payload())
        .when(modality == "audio", _synthetic_wav_payload())
        .otherwise(F.encode("text", "utf-8"))
        .alias("payload"),
    ).withColumn(
        "duration_ms",
        F.when(
            F.col("modality") == "video", (F.length("payload") % 5000).cast("int")
        ),
    )


@register("q70_multimodal_features", oracle=None)  # rows-only: python decode path
def q70_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: synthesize media from documents
    (image rows = real binary-PPM payloads, audio rows = real PCM-WAV
    payloads) → JVM-side metadata → Arrow-batched mapInPandas decode +
    feature extraction → per-modality aggregate.  ``f1_sum`` sums
    feature[0]: decoded width for images (16.0 × n), decoded sample rate
    for audio (8000.0 × n), histogram bucket-0 mass for video."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(media_table_from_documents(docs))
    feats = extract_features(media)
    return (
        feats.groupBy("modality", "decode_ok")
        .agg(
            F.count("*").alias("n_media"),
            F.max("feature_dim").alias("feature_dim"),
            F.sum(F.element_at("feature", 1)).alias("f1_sum"),
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
