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
moments + an 8-band spectrum (``codecs.audio_stats_features``).  Video
decode is REAL for RIFF/AVI uncompressed DIB: ``codecs.decode_avi``
walks the container and emits luma/motion statistics
(``codecs.video_stats_features``); ``sample_frames`` extracts real
frames and re-encodes each as a standalone PPM.  PNG (stdlib zlib) and
JPEG — baseline-sequential AND progressive/SOF2 (pure-numpy Huffman +
iDCT, multimodal/jpeg.py) — decode natively too, both modes exercised
distributed by q178.  The remaining compressed formats (MP3/MP4/...)
are the documented Pillow/ffmpeg swap-in point (see
``REAL_CODECS_AVAILABLE``); those payloads fall back to a deterministic
byte-histogram feature so the plumbing stays total.
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

    Images in a natively-decodable format (PPM/BMP/PNG/baseline-JPEG —
    magic-sniffed)
    go through the REAL numpy decoder and emit pixel statistics
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
    if modality == "image" and bytes(payload[:2]) in (
        codecs.PPM_MAGIC,
        codecs.BMP_MAGIC,
        codecs.PNG_MAGIC[:2],
        b"\xff\xd8",  # baseline JPEG (multimodal/jpeg.py)
        b"GI",  # GIF87a/89a (multimodal/gif.py)
    ):
        return codecs.image_stats_features(codecs.decode_image(bytes(payload)))
    if modality == "audio" and payload[:4] == codecs.WAV_MAGIC:
        return codecs.audio_stats_features(*codecs.decode_wav(bytes(payload)))
    if (
        modality == "video"
        and payload[:4] == codecs.AVI_MAGIC
        and payload[8:12] == b"AVI "
    ):
        return codecs.video_stats_features(*codecs.decode_avi(bytes(payload)))
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


#: Synthetic video geometry: 4 frames of 8×8 RGB @ 4 fps ⇒ 192 pixel
#: bytes per frame = 12 MD5 digests, generated JVM-side into a constant
#: RIFF/AVI skeleton (headers precomputed once on the driver).
_SYNTH_AVI_FRAMES = 4
_SYNTH_AVI_W = _SYNTH_AVI_H = 8
_SYNTH_AVI_FPS = 4
_SYNTH_AVI_BODY = _SYNTH_AVI_W * _SYNTH_AVI_H * 3  # stride==w*3 (already x4)
_SYNTH_AVI_DIGESTS = _SYNTH_AVI_BODY // 16


def _synthetic_avi_payload() -> F.Column:
    """A REAL RIFF/AVI uncompressed-DIB payload built entirely JVM-side:
    the container skeleton (RIFF/hdrl/avih/movi + per-frame ``00db``
    headers) is a driver-side constant template from ``codecs.encode_avi``
    with the frame bodies spliced out; each 192-byte frame body is
    deterministic ``unhex(md5(text, frame, i))`` noise.  Decodable by
    ``codecs.decode_avi`` — no Python in the synthesis path."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal import codecs

    template = codecs.encode_avi(
        np.zeros(
            (_SYNTH_AVI_FRAMES, _SYNTH_AVI_H, _SYNTH_AVI_W, 3), dtype=np.uint8
        ),
        fps=_SYNTH_AVI_FPS,
    )
    parts: list[F.Column] = []
    pos = 0
    for frame in range(_SYNTH_AVI_FRAMES):
        body_start = template.index(b"00db", pos) + 8
        parts.append(F.lit(template[pos:body_start]))
        parts.append(
            F.unhex(
                F.concat_ws(
                    "",
                    *[
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit("avi"),
                                F.col("text"),
                                F.lit(f"{frame}:{i}"),
                            )
                        )
                        for i in range(_SYNTH_AVI_DIGESTS)
                    ],
                )
            )
        )
        pos = body_start + _SYNTH_AVI_BODY
    parts.append(F.lit(template[pos:]))
    return F.concat(*parts)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from ``documents`` (the testdata has
    no binary columns): modality round-robin by id; image rows carry a
    REAL decodable 16×16 binary-PPM payload, audio rows a REAL decodable
    8 kHz 16-bit PCM WAV, video rows a REAL decodable 4-frame RIFF/AVI
    (all built JVM-side from text hashes).  Everything downstream treats
    the payload as opaque bytes — exactly as real media would flow."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.when(modality == "image", F.lit("ppm"))
        .when(modality == "audio", F.lit("wav"))
        .otherwise(F.lit("avi"))
        .alias("codec"),
        F.when(modality == "image", _synthetic_ppm_payload())
        .when(modality == "audio", _synthetic_wav_payload())
        .otherwise(_synthetic_avi_payload())
        .alias("payload"),
    ).withColumn(
        "duration_ms",
        F.when(
            F.col("modality") == "video",
            F.lit(_SYNTH_AVI_FRAMES * 1000 // _SYNTH_AVI_FPS).cast("int"),
        ),
    )


@register(
    "q70_multimodal_features",
    # closed-form binary oracle (the q208–q212 pattern, promoted from
    # rows-only in round 13): feature[0] is a decoded CONSTANT per
    # modality — image width 16, audio sample rate 8000, video fps 4 —
    # and all three feature vectors are 16-dim, so the whole aggregate
    # is closed-form in the per-modality doc counts.  Float sums of
    # 16.0/8000.0/4.0 are exact in IEEE754 (small power-of-two
    # multiples), so no summation-order hazard.  A decode failure
    # surfaces as a decode_ok≠'ok' group the oracle doesn't emit —
    # the hash check IS the decode gate.
    oracle="""
    WITH m AS (
      SELECT CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
             END AS modality
      FROM documents
    )
    SELECT modality, 'ok' AS decode_ok,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(16 AS INTEGER) AS feature_dim,
           CAST(CASE modality WHEN 'image' THEN 16.0
                              WHEN 'audio' THEN 8000.0
                              ELSE 4.0 END * COUNT(*) AS DOUBLE) AS f1_sum
    FROM m GROUP BY modality
    ORDER BY modality, decode_ok
    """,
    python_lane=True,  # the mapInPandas decode IS the operator under test
)
def q70_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: synthesize media from documents
    (image rows = real binary-PPM payloads, audio rows = real PCM-WAV
    payloads, video rows = real RIFF/AVI) → JVM-side metadata →
    Arrow-batched mapInPandas decode + feature extraction →
    per-modality aggregate.  ``f1_sum`` sums feature[0]: decoded width
    for images (16.0 × n), decoded sample rate for audio (8000.0 × n),
    decoded fps for video (4.0 × n)."""
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


#: q178 synthetic JPEG geometry (width must differ from height so the
#: decoded-geometry assertion catches a transposed decode).
_JPEG_W, _JPEG_H = 24, 16


def jpeg_media_from_documents(
    docs: DataFrame, every: int = 7, quality: int = 85, with_exif: bool = False
) -> DataFrame:
    """Deterministic JPEG payloads synthesized DISTRIBUTED (mapInPandas):
    each kept doc derives a 16×24 RGB image from chained md5(text ‖ i)
    digests — the same trick the JVM-side PPM synthesis uses — then
    encodes it as 4:2:0 JPEG (multimodal/jpeg.py), ALTERNATING baseline
    (SOF0) and progressive (SOF2) by doc_id so the distributed decode
    path exercises both modes — real web corpora are format-mixed.  The
    two encoders quantize identically, so their decodes are bit-equal
    and the q178 aggregate does not depend on which mode a doc drew.
    Unlike the PPM/WAV payloads, JPEG bytes cannot be built with SQL
    expressions, so this stage doubles as a distributed ENCODE exercise;
    q178 decodes the result back through the standard feature extractor.
    Content depends only on (doc_id, text), never on partitioning —
    repartition-stable."""
    import hashlib

    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.exif import (
        build_exif_app1,
        inject_exif,
    )
    from pyspark_anomaly_detection_spark.multimodal.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    n_bytes = _JPEG_W * _JPEG_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = bytearray()
                i = 0
                while len(raw) < n_bytes:
                    raw += hashlib.md5(f"{text}|{i}".encode()).digest()
                    i += 1
                pixels = (
                    np.frombuffer(bytes(raw[:n_bytes]), dtype=np.uint8)
                    .reshape(_JPEG_H, _JPEG_W, 3)
                )
                encode = (
                    encode_jpeg_baseline
                    if (int(doc_id) // every) % 2 == 0
                    else encode_jpeg_progressive
                )
                jpeg = encode(pixels, quality=quality, subsampling="420")
                if with_exif:
                    # tag values are CLOSED-FORM in doc_id so the q189
                    # oracle can predict the metadata without bytes
                    did = int(doc_id)
                    jpeg = inject_exif(
                        jpeg,
                        build_exif_app1(
                            orientation=1 + did % 8,
                            make=f"Cam{did % 3}",
                            model=f"M{did % 5}",
                            width=_JPEG_W,
                            height=_JPEG_H,
                            big_endian=(did // every) % 2 == 1,
                        ),
                    )
                payloads.append(jpeg)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "modality": "image",
                    "codec": "jpeg",
                    "payload": payloads,
                }
            )

    return docs.filter(F.col("doc_id") % every == 0).select(
        "doc_id", "text"
    ).mapInPandas(
        run,
        schema="media_id long, modality string, codec string, payload binary",
    )


@register(
    "q178_jpeg_decode_stats",
    python_lane=True,
    # Closed-form half: every %7 doc must decode ok with the exact
    # synthesized 24×16 RGB geometry, so count/ok-count/width-sum/
    # height-sum are all functions of COUNT(*) alone.  Banded half:
    # per-image mean luma is a real DCT→quantize→IDCT round trip (not
    # SQL-expressible), but md5-uniform pixels put the corpus average at
    # ≈127.5 and a quality-85 4:2:0 round trip moves DC by <3 codes —
    # the [110, 145] band is a Spark-computed boolean hash-locked to
    # literal TRUE (self-graded band, not cross-engine recomputation —
    # the q62/q71 audit pattern, scope documented per VERDICT r11 §4).
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM documents WHERE doc_id % 7 = 0)
    SELECT n AS n_media,
           n AS n_ok,
           CAST(n * 24 AS DOUBLE) AS width_sum,
           CAST(n * 16 AS DOUBLE) AS height_sum,
           TRUE AS luma_in_band,
           TRUE AS rgb_channels
    FROM c
    """,
)
def q178_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed JPEG round trip: synthesize deterministic
    baseline/progressive 4:2:0 JPEGs from document text (mapInPandas
    encode), then run them through the standard Arrow-batched decode +
    feature extraction.  The aggregate pins the codec end-to-end: every
    row must decode ok with the exact synthesized geometry (closed-form
    oracle columns), and the corpus mean luma must sit in the tight band
    an md5-uniform source guarantees (banded verdict columns)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_metadata(jpeg_media_from_documents(docs))
    feats = extract_features(media)
    agg = feats.agg(
        F.count("*").alias("n_media"),
        F.sum((F.col("decode_ok") == "ok").cast("long")).alias("n_ok"),
        F.sum(F.element_at("feature", 1)).alias("width_sum"),
        F.sum(F.element_at("feature", 2)).alias("height_sum"),
        F.avg(F.element_at("feature", 15)).alias("_luma"),
        F.min(F.element_at("feature", 3)).alias("_cmin"),
        F.max(F.element_at("feature", 3)).alias("_cmax"),
    )
    # empty-corpus coalesces: SUM/AVG over zero media are NULL and the
    # band verdicts must certify vacuously (empty-table fuzz variant)
    return agg.select(
        "n_media",
        F.coalesce("n_ok", F.lit(0)).alias("n_ok"),
        F.coalesce("width_sum", F.lit(0.0)).alias("width_sum"),
        F.coalesce("height_sum", F.lit(0.0)).alias("height_sum"),
        F.coalesce(
            (F.col("_luma") >= 110.0) & (F.col("_luma") <= 145.0),
            F.lit(True),
        ).alias("luma_in_band"),
        F.coalesce(
            (F.col("_cmin") == 3.0) & (F.col("_cmax") == 3.0), F.lit(True)
        ).alias("rgb_channels"),
    )



# ------------------------------------------------ EXIF metadata (q189)

_EXIF_SCHEMA = (
    "media_id long, exif_ok string, orientation long, make string, "
    "model string, pixel_x long, pixel_y long"
)


def extract_exif(df: DataFrame) -> DataFrame:
    """Distributed EXIF extraction (multimodal/exif.py inside the Arrow
    batch): metadata only — the entropy-coded image data is never
    decoded, which is the point: at 100 TB orientation/camera/dimension
    filters run over file HEADS, orders of magnitude cheaper than
    decode.  Missing or malformed EXIF degrades to exif_ok='absent',
    never a task failure."""
    from pyspark_anomaly_detection_spark.multimodal.exif import parse_exif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "exif_ok", "orientation", "make", "model",
            "pixel_x", "pixel_y",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = (
                    parse_exif(bytes(payload)) if payload is not None else None
                )
                if meta is None:
                    rows.append((mid, "absent", None, None, None, None, None))
                else:
                    rows.append(
                        (
                            mid,
                            "ok",
                            meta.get("orientation"),
                            meta.get("make"),
                            meta.get("model"),
                            meta.get("pixel_x"),
                            meta.get("pixel_y"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(run, schema=_EXIF_SCHEMA)


@register(
    "q189_exif_orientation_profile",
    python_lane=True,
    oracle=f"""
    SELECT CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           'Cam' || CAST(doc_id % 3 AS VARCHAR) AS make,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST({_JPEG_W} * COUNT(*) AS BIGINT) AS px_sum,
           CAST({_JPEG_H} * COUNT(*) AS BIGINT) AS py_sum
    FROM documents
    WHERE doc_id % 7 = 0
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q189_exif_orientation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orientation × camera-make census over EXIF-tagged JPEGs — and an
    END-TO-END BINARY ORACLE: the Spark side synthesizes real JPEG bytes
    (baseline AND progressive, little- AND big-endian TIFF headers),
    injects APP1/EXIF whose tag values are closed-form in doc_id, then
    parses the bytes back distributed; the DuckDB oracle computes the
    same census from the closed form WITHOUT ever seeing a byte.  A
    green hash therefore proves the writer→injector→marker-scan→TIFF-
    walk pipeline end to end, not just that two engines agree on SQL."""
    docs = load_table(spark, sf_dir, "documents")
    media = jpeg_media_from_documents(docs, with_exif=True)
    ex = extract_exif(media)
    return (
        ex.filter(F.col("exif_ok") == "ok")
        .groupBy("orientation", "make")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("pixel_x").alias("px_sum"),
            F.sum("pixel_y").alias("py_sum"),
        )
        .orderBy("orientation", "make")
    )



# --------------------------------------- MP3 frame-header census (q190)

_MP3_SCHEMA = (
    "media_id long, version string, layer long, sample_rate long, "
    "channels long, n_frames long, duration_ms long, mean_bitrate long, "
    "parsed_ok boolean"
)

#: q190 synthesis parameters — closed-form in doc_id so the oracle can
#: predict every census cell without bytes.
_MP3_RATE = 44100
_MP3_BITRATES = (64, 128, 192, 320)


def mp3_media_from_documents(docs: DataFrame, every: int = 5) -> DataFrame:
    """Deterministic MPEG-1 Layer III streams synthesized distributed
    (mapInPandas): frame count, bitrate, channel mode, and an optional
    ID3v2 tag all derive from doc_id, so stream metadata is closed-form
    while the BYTES are real frame sequences any header walker can
    verify."""
    from pyspark_anomaly_detection_spark.multimodal.mp3 import build_mp3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payloads.append(
                    build_mp3(
                        n_frames=20 + did % 30,
                        bitrate_kbps=_MP3_BITRATES[did % 4],
                        sample_rate=_MP3_RATE,
                        mono=did % 2 == 1,
                        id3_bytes=64 if did % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "modality": "audio",
                    "codec": "mp3",
                    "payload": payloads,
                }
            )

    return docs.filter(F.col("doc_id") % every == 0).select("doc_id").mapInPandas(
        run,
        schema="media_id long, modality string, codec string, payload binary",
    )


def extract_mp3_info(df: DataFrame) -> DataFrame:
    """Distributed MP3 frame-header walk (multimodal/mp3.py inside the
    Arrow batch): duration / bitrate / channel census from the 4-byte
    headers alone — the audio payload is never decoded, so at corpus
    scale this reads stream structure, not sound."""
    from pyspark_anomaly_detection_spark.multimodal.mp3 import mp3_stream_info

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "version", "layer", "sample_rate", "channels",
            "n_frames", "duration_ms", "mean_bitrate", "parsed_ok",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = (
                    mp3_stream_info(bytes(payload))
                    if payload is not None
                    else None
                )
                if info is None:
                    rows.append(
                        (mid, None, None, None, None, None, None, None, False)
                    )
                else:
                    rows.append(
                        (
                            mid,
                            info["version"],
                            info["layer"],
                            info["sample_rate"],
                            info["channels"],
                            info["n_frames"],
                            info["duration_ms"],
                            info["mean_bitrate"],
                            info["parsed_ok"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(run, schema=_MP3_SCHEMA)


@register(
    "q190_mp3_stream_census",
    python_lane=True,
    oracle=f"""
    SELECT CAST(b AS BIGINT) AS mean_bitrate,
           CAST(ch AS BIGINT) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(frames) AS BIGINT) AS frames_sum,
           CAST(SUM(dur) AS BIGINT) AS duration_sum_ms
    FROM (
      SELECT
        1000 * (CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128
                                WHEN 2 THEN 192 ELSE 320 END) AS b,
        CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS ch,
        20 + doc_id % 30 AS frames,
        (20 + doc_id % 30) * 1152 * 1000 // {_MP3_RATE} AS dur
      FROM documents WHERE doc_id % 5 = 0
    )
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q190_mp3_stream_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitrate × channel-mode census over synthesized MP3 streams — the
    audio sibling of q189's end-to-end binary oracle: Spark builds REAL
    frame sequences (ID3v2 tags on every third stream), walks the
    headers back distributed, and aggregates; DuckDB computes the same
    census from the closed form without seeing a byte.  Green hash =
    writer→ID3-skip→sync-scan→frame-arithmetic proven end to end."""
    docs = load_table(spark, sf_dir, "documents")
    info = extract_mp3_info(mp3_media_from_documents(docs))
    return (
        info.filter(F.col("parsed_ok"))
        .groupBy("mean_bitrate", "channels")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_frames").alias("frames_sum"),
            F.sum("duration_ms").alias("duration_sum_ms"),
        )
        .orderBy("mean_bitrate", "channels")
    )



# ------------------------------------------ MP4 box-tree census (q191)

_MP4_SCHEMA = (
    "media_id long, brand string, timescale long, duration_ms long, "
    "n_tracks long, n_video long, n_audio long, width long, height long, "
    "parsed_ok boolean"
)


def mp4_media_from_documents(docs: DataFrame, every: int = 6) -> DataFrame:
    """Deterministic ISO-BMFF box trees (ftyp + moov/mvhd/trak + empty
    mdat) synthesized distributed; every structural parameter is
    closed-form in doc_id, alternating mvhd version 0/1 and 1 kHz /
    90 kHz timescales so the census exercises both layouts."""
    from pyspark_anomaly_detection_spark.multimodal.mp4 import build_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payloads.append(
                    build_mp4(
                        duration_ms=1000 + (did % 600) * 100,
                        timescale=90000 if did % 2 else 1000,
                        video_tracks=1 + did % 2,
                        audio_tracks=did % 3,
                        width=320 * (1 + did % 4),
                        height=240 * (1 + did % 4),
                        version1_mvhd=did % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "modality": "video",
                    "codec": "mp4",
                    "payload": payloads,
                }
            )

    return docs.filter(F.col("doc_id") % every == 0).select("doc_id").mapInPandas(
        run,
        schema="media_id long, modality string, codec string, payload binary",
    )


def extract_mp4_info(df: DataFrame) -> DataFrame:
    """Distributed ISO-BMFF box walk (multimodal/mp4.py inside the Arrow
    batch): duration / track / geometry census from the moov tree only —
    sample data (mdat) is never read, which is what makes video triage
    tractable at corpus scale."""
    from pyspark_anomaly_detection_spark.multimodal.mp4 import parse_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "brand", "timescale", "duration_ms", "n_tracks",
            "n_video", "n_audio", "width", "height", "parsed_ok",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = parse_mp4(bytes(payload)) if payload is not None else None
                if info is None:
                    rows.append(
                        (mid, None, None, None, None, None, None, None, None,
                         False)
                    )
                else:
                    handlers = info.get("handlers", [])
                    rows.append(
                        (
                            mid,
                            info.get("brand"),
                            info.get("timescale"),
                            info.get("duration_ms"),
                            info.get("n_tracks"),
                            sum(1 for h in handlers if h == "vide"),
                            sum(1 for h in handlers if h == "soun"),
                            info.get("width"),
                            info.get("height"),
                            True,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "payload").mapInPandas(run, schema=_MP4_SCHEMA)


@register(
    "q191_mp4_track_census",
    python_lane=True,
    oracle="""
    SELECT CAST(nt AS BIGINT) AS n_tracks,
           CAST(w AS BIGINT) AS width,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(d) AS BIGINT) AS duration_sum_ms
    FROM (
      SELECT 1 + doc_id % 2 + doc_id % 3 AS nt,
             320 * (1 + doc_id % 4) AS w,
             1000 + (doc_id % 600) * 100 AS d
      FROM documents WHERE doc_id % 6 = 0
    )
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q191_mp4_track_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Track-count × resolution census over synthesized ISO-BMFF trees —
    the video member of the end-to-end binary-oracle triptych
    (q189 EXIF / q190 MP3 / q191 MP4): real box trees built and walked
    back distributed (both mvhd versions, both timescales), vs a DuckDB
    census computed from the closed form without seeing a byte."""
    docs = load_table(spark, sf_dir, "documents")
    info = extract_mp4_info(mp4_media_from_documents(docs))
    return (
        info.filter(F.col("parsed_ok"))
        .groupBy("n_tracks", "width")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("duration_ms").alias("duration_sum_ms"),
        )
        .orderBy("n_tracks", "width")
    )


# ----------------- exact-roundtrip codec censuses (q198 PNG, q199 JPEG)

#: q198/q199 synthesis parameters — closed-form in doc_id (binary-oracle
#: pattern: the oracle predicts every census cell without seeing bytes).
_FLAT_EVERY = 4
#: DC quant step of the luma table at quality 85: floor((16·30+50)/100).
#: Gray values 128 + k·5 roundtrip BIT-EXACTLY through the 4:2:0 JPEG
#: pipeline (uniform block ⇒ all ACs quantize to 0, DC is a multiple of
#: the step ⇒ dequant is exact; equal RGB channels ⇒ chroma exactly 128).
_FLAT_QSTEP = 5
_FLAT_QUALITY = 85


def flat_jpeg_media_from_documents(
    docs: DataFrame, every: int = _FLAT_EVERY
) -> DataFrame:
    """Uniform-gray JPEG payloads whose DECODED pixels are closed-form:
    gray(doc_id) = 128 + ((doc_id % 25) − 12)·{_FLAT_QSTEP}, alternating
    baseline/progressive encoders.  Unlike q178's hash-noise images
    (where quantization loss makes pixel stats non-portable), the flat
    construction survives the lossy pipeline exactly — turning the whole
    encode→decode lane into hash-verifiable territory."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                gray = 128 + ((did % 25) - 12) * _FLAT_QSTEP
                img = np.full((_JPEG_H, _JPEG_W, 3), gray, dtype=np.uint8)
                encode = (
                    encode_jpeg_baseline
                    if (did // every) % 2 == 0
                    else encode_jpeg_progressive
                )
                payloads.append(
                    encode(img, quality=_FLAT_QUALITY, subsampling="420")
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return (
        docs.filter(F.col("doc_id") % every == 0)
        .select("doc_id")
        .mapInPandas(run, schema="media_id long, payload binary")
    )


def _decode_uniform_stats(df: DataFrame) -> DataFrame:
    """Decode each JPEG payload and report the uniform gray value, or −1
    when the decoded image is NOT perfectly uniform (any quantization
    drift poisons the census and fails the oracle hash — the point)."""
    from pyspark_anomaly_detection_spark.multimodal.jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_jpeg(bytes(payload))
                    h, w = arr.shape[0], arr.shape[1]
                    gray = (
                        int(arr.flat[0])
                        if int(arr.min()) == int(arr.max())
                        else -1
                    )
                    rows.append((mid, w, h, gray))
                except Exception:  # noqa: BLE001 - census robustness
                    rows.append((mid, -1, -1, -1))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "gray"]
            )

    return df.mapInPandas(
        run, schema="media_id long, width int, height int, gray int"
    )


@register(
    "q199_flat_jpeg_roundtrip_census",
    python_lane=True,
    oracle=f"""
    SELECT CAST(128 + ((doc_id % 25) - 12) * {_FLAT_QSTEP} AS BIGINT) AS gray,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST({_JPEG_W} * COUNT(*) AS BIGINT) AS width_sum,
           CAST({_JPEG_H} * COUNT(*) AS BIGINT) AS height_sum
    FROM documents
    WHERE doc_id % {_FLAT_EVERY} = 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def q199_flat_jpeg_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY-codec exact-roundtrip census — an end-to-end binary oracle
    over the full JPEG encode→decode pipeline: uniform-gray images whose
    gray level is a multiple of the DC quant step survive 4:2:0 JPEG
    quantization bit-exactly (all ACs quantize to zero, DC dequantizes
    exactly, chroma is exactly 128), so the DuckDB oracle predicts the
    decoded-gray census in closed form.  Any drift anywhere in the DCT/
    quant/Huffman/upsample path makes a decoded image non-uniform, maps
    it to gray = −1, and fails the hash.  Baseline and progressive
    encoders alternate by doc, so BOTH entropy layouts are proven."""
    docs = load_table(spark, sf_dir, "documents")
    stats = _decode_uniform_stats(flat_jpeg_media_from_documents(docs))
    return (
        stats.groupBy(F.col("gray").cast("long").alias("gray"))
        .agg(
            F.count("*").alias("n_media"),
            F.sum("width").cast("long").alias("width_sum"),
            F.sum("height").cast("long").alias("height_sum"),
        )
        .orderBy("gray")
    )


def gradient_png_media_from_documents(
    docs: DataFrame, every: int = _FLAT_EVERY
) -> DataFrame:
    """Row-gradient PNG payloads: scanline y is the uniform value
    (doc_id + y) % 256 in all channels; filter type cycles doc_id % 5
    and Adam7 interlacing alternates — every PNG decode path runs
    distributed, each with a closed-form pixel sum."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                ramp = (did + np.arange(_JPEG_H, dtype=np.int64)) % 256
                img = np.repeat(
                    ramp.astype(np.uint8)[:, None, None],
                    _JPEG_W,
                    axis=1,
                ).repeat(3, axis=2)
                payloads.append(
                    encode_png(
                        img,
                        filter_type=did % 5,
                        interlace=(did // every) % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return (
        docs.filter(F.col("doc_id") % every == 0)
        .select("doc_id")
        .mapInPandas(run, schema="media_id long, payload binary")
    )


@register(
    "q198_png_pixel_sum_census",
    python_lane=True,
    oracle=f"""
    WITH rows_sum AS (
      SELECT doc_id,
             (SELECT SUM((doc_id + y.k) % 256)
              FROM (SELECT unnest(range({_JPEG_H})) AS k) y) AS row_vals
      FROM documents
      WHERE doc_id % {_FLAT_EVERY} = 0
    )
    SELECT doc_id AS media_id,
           CAST(doc_id % 5 AS BIGINT) AS filter_type,
           (doc_id // {_FLAT_EVERY}) % 2 = 1 AS interlaced,
           CAST(3 * {_JPEG_W} * row_vals AS BIGINT) AS pixel_sum
    FROM rows_sum
    ORDER BY media_id
    """,
)
def q198_png_pixel_sum_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS-codec roundtrip census: per-media pixel sum of decoded
    row-gradient PNGs — closed-form in doc_id, so a green hash proves
    the scanline filters (all five, cycled) AND the Adam7 interlace
    reassembly byte-for-byte, per media file, distributed."""
    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_png(bytes(payload))
                    rows.append((mid, int(arr.sum(dtype="int64"))))
                except Exception:  # noqa: BLE001 - census robustness
                    rows.append((mid, -1))
            yield pd.DataFrame(rows, columns=["media_id", "pixel_sum"])

    docs = load_table(spark, sf_dir, "documents")
    media = gradient_png_media_from_documents(docs)
    sums = media.mapInPandas(run, schema="media_id long, pixel_sum long")
    return sums.select(
        "media_id",
        (F.col("media_id") % 5).cast("long").alias("filter_type"),
        # pure-integer floor division (pmod + div): bitwise-matches the
        # oracle's Python `//` for ANY id domain, no double rounding
        (
            F.expr(
                f"(media_id - pmod(media_id, {_FLAT_EVERY})) "
                f"div {_FLAT_EVERY}"
            )
            % 2
            == 1
        ).alias("interlaced"),
        "pixel_sum",
    ).orderBy("media_id")


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset_ms", IntegerType(), False),
        StructField("frame_w", IntegerType(), True),
        StructField("frame_h", IntegerType(), True),
        StructField("luma_mean", FloatType(), True),
        StructField("decode_ok", StringType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    RIFF/AVI payloads get REAL extraction (``codecs.decode_avi`` inside
    the Arrow batch): the frame nearest each ``every_ms`` offset is
    decoded, its luma summarized, and the frame re-encoded as a
    standalone binary-PPM payload — so downstream image operators (decode,
    resize, feature-extract) consume sampled video frames exactly like
    still images.  Non-AVI codecs (MP4 etc. — the ffmpeg swap-in point)
    keep the deterministic byte-slice stub keyed off ``duration_ms``
    metadata, with ``decode_ok = 'stub'`` so consumers can tell.  Errors
    quarantine per-row, never fail the task."""
    from pyspark_anomaly_detection_spark.multimodal import codecs

    def _rows_for(media_id: int, payload, duration_ms) -> list[dict]:
        payload = bytes(payload) if payload is not None else b""
        if payload[:4] == codecs.AVI_MAGIC and payload[8:12] == b"AVI ":
            fps, frames = codecs.decode_avi(payload)
            n, h, w = frames.shape[:3]
            duration = int(n * 1000 / fps) if fps else 0
            out = []
            for k, off in enumerate(range(0, max(duration, 1), every_ms)):
                idx = min(int(off * fps / 1000), n - 1)
                frame = frames[idx]
                f = frame.astype("int64")
                luma = (77 * f[..., 0] + 150 * f[..., 1] + 29 * f[..., 2]) >> 8
                out.append(
                    dict(
                        media_id=media_id, frame_idx=idx, offset_ms=off,
                        frame_w=w, frame_h=h, luma_mean=float(luma.mean()),
                        decode_ok="ok",
                        frame_payload=codecs.encode_ppm(frame),
                    )
                )
            return out
        dur = int(duration_ms) if duration_ms is not None else 0
        return [
            dict(
                media_id=media_id, frame_idx=k, offset_ms=off,
                frame_w=None, frame_h=None, luma_mean=None,
                decode_ok="stub",
                frame_payload=payload[off % 64 : off % 64 + 64],
            )
            for k, off in enumerate(range(0, max(dur, 1), every_ms))
        ] if dur > 0 else []

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for media_id, payload, duration_ms in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                try:
                    rows.extend(_rows_for(media_id, payload, duration_ms))
                except Exception as exc:  # quarantine, not task failure
                    rows.append(
                        dict(
                            media_id=media_id, frame_idx=0, offset_ms=0,
                            frame_w=None, frame_h=None, luma_mean=None,
                            decode_ok=f"error:{type(exc).__name__}",
                            frame_payload=None,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        df.filter(F.col("modality") == "video")
        .select("media_id", F.col(payload_col).alias("payload"), "duration_ms")
        .mapInPandas(run, FRAME_SCHEMA)
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
    """REAL image resize over ``mapInPandas``: Arrow batches of binary
    payloads in, resized payloads + updated width/height metadata out,
    per-row error capture (``resize_ok``) instead of task failure.

    Natively-decodable payloads (PPM/BMP/PNG — magic-sniffed) go through
    the real path: decode → nearest-neighbor pixel resample
    (``codecs.resize_pixels``) → re-encode as a standalone binary PPM
    (``resize_ok='ok'``).  Undecodable formats (JPEG/...) fall back to a
    deterministic byte-stride downsample marked ``resize_ok='stub'`` —
    the Pillow swap-in point, never silently wrong.
    """
    import pandas as pd

    from pyspark_anomaly_detection_spark.multimodal import codecs

    n_out = target_w * target_h
    decodable = (codecs.PPM_MAGIC, codecs.BMP_MAGIC, codecs.PNG_MAGIC[:2])

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
                    raw = bytes(payload)
                    if raw[:2] in decodable:
                        small = codecs.resize_pixels(
                            codecs.decode_image(raw), target_w, target_h
                        )
                        out["payload"].append(codecs.encode_ppm(small))
                        out["resize_ok"].append("ok")
                    else:
                        out["payload"].append(_stub_resize(raw))
                        out["resize_ok"].append("stub")
                    out["width"].append(target_w)
                    out["height"].append(target_h)
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


# ------------- frame-sampling + resize censuses (q200, q201)

#: q200/q201 synthesis cadence and resize geometry (closed-form oracle).
_FS_EVERY = 4
_RS_W, _RS_H = 5, 4  # resize target; source is the 16-row gradient


def uniform_avi_media_from_documents(
    docs: DataFrame, every: int = _FS_EVERY
) -> DataFrame:
    """REAL RIFF/AVI payloads whose frames are UNIFORM: frame f of doc d
    is the constant value (d + 7·f) % 256 in every channel — built
    entirely JVM-side (constant container skeleton + `unhex(repeat(hex))`
    frame bodies), so the luma of every decoded frame is closed-form:
    (77v+150v+29v)>>8 = v exactly for equal channels."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal import codecs

    template = codecs.encode_avi(
        np.zeros(
            (_SYNTH_AVI_FRAMES, _SYNTH_AVI_H, _SYNTH_AVI_W, 3), dtype=np.uint8
        ),
        fps=_SYNTH_AVI_FPS,
    )
    val = lambda f: F.lpad(  # noqa: E731 - tiny expression factory
        F.hex((F.col("doc_id") + 7 * f) % 256), 2, "0"
    )
    parts: list[F.Column] = []
    pos = 0
    for frame in range(_SYNTH_AVI_FRAMES):
        body_start = template.index(b"00db", pos) + 8
        parts.append(F.lit(template[pos:body_start]))
        parts.append(F.unhex(F.repeat(val(frame), _SYNTH_AVI_BODY)))
        pos = body_start + _SYNTH_AVI_BODY
    parts.append(F.lit(template[pos:]))
    return docs.filter(F.col("doc_id") % every == 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.concat(*parts).alias("payload"),
        F.lit(_SYNTH_AVI_FRAMES * 1000 // _SYNTH_AVI_FPS)
        .cast("int")
        .alias("duration_ms"),
    )


@register(
    "q200_frame_sample_census",
    python_lane=True,
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(k.k AS BIGINT) AS frame_idx,
           CAST(250 * k.k AS BIGINT) AS offset_ms,
           CAST({_SYNTH_AVI_W} AS BIGINT) AS frame_w,
           CAST({_SYNTH_AVI_H} AS BIGINT) AS frame_h,
           CAST((doc_id + 7 * k.k) % 256 AS BIGINT) AS luma
    FROM documents
    CROSS JOIN (SELECT unnest(range({_SYNTH_AVI_FRAMES})) AS k) k
    WHERE doc_id % {_FS_EVERY} = 0
    ORDER BY media_id, frame_idx
    """,
)
def q200_frame_sample_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as an end-to-end binary oracle: uniform-frame
    AVIs (value closed-form in (doc, frame)) are container-encoded
    JVM-side, then ``sample_frames`` walks the RIFF tree, decodes the
    frame nearest each 250 ms offset, and reports its luma — at 4 fps ×
    4 frames each offset lands exactly on frame k, so a green hash
    proves the container walk, frame indexing, DIB decode, and luma
    arithmetic per sampled frame.  At 100 TB this lane is the
    ffmpeg-swap-in point; the Spark plumbing (Arrow batches, per-row
    quarantine, metadata-only stub path) is what the census pins."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(uniform_avi_media_from_documents(docs), every_ms=250)
    return (
        frames.filter(F.col("decode_ok") == "ok")
        .select(
            "media_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("offset_ms").cast("long").alias("offset_ms"),
            F.col("frame_w").cast("long").alias("frame_w"),
            F.col("frame_h").cast("long").alias("frame_h"),
            F.col("luma_mean").cast("long").alias("luma"),
        )
        .orderBy("media_id", "frame_idx")
    )


@register(
    "q201_resize_census",
    python_lane=True,
    oracle=f"""
    WITH samp AS (
      SELECT doc_id,
             ((2 * k.k + 1) * {_SYNTH_H}) // (2 * {_RS_H}) AS sy
      FROM documents
      CROSS JOIN (SELECT unnest(range({_RS_H})) AS k) k
      WHERE doc_id % {_FS_EVERY} = 0
    ),
    sums AS (
      SELECT doc_id, SUM((doc_id + sy) % 256) AS s FROM samp GROUP BY doc_id
    )
    SELECT doc_id AS media_id,
           CAST({_RS_W} AS BIGINT) AS width,
           CAST({_RS_H} AS BIGINT) AS height,
           CAST(3 * {_RS_W} * s AS BIGINT) AS pixel_sum
    FROM sums
    ORDER BY media_id
    """,
)
def q201_resize_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize as an end-to-end binary oracle: row-gradient PPMs
    (row y = (doc + y) % 256) go through the REAL resize lane — decode →
    pixel-center nearest-neighbor resample → re-encode PPM — and the
    resized payload is decoded back to a pixel sum.  The oracle computes
    the same sum from the sampling formula sy = ⌊(2y+1)·H / 2T⌋, so a
    green hash proves the decode, the exact pixel-center row selection,
    and the re-encode, per media file."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal import codecs

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                ramp = (did + np.arange(_SYNTH_H, dtype=np.int64)) % 256
                img = np.repeat(
                    ramp.astype(np.uint8)[:, None, None], _SYNTH_W, axis=1
                ).repeat(3, axis=2)
                payloads.append(codecs.encode_ppm(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "modality": "image",
                    "payload": payloads,
                }
            )

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = codecs.decode_ppm(bytes(payload))
                    rows.append(
                        (mid, arr.shape[1], arr.shape[0], int(arr.sum(dtype="int64")))
                    )
                except Exception:  # noqa: BLE001 - census robustness
                    rows.append((mid, -1, -1, -1))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixel_sum"]
            )

    docs = load_table(spark, sf_dir, "documents")
    media = (
        docs.filter(F.col("doc_id") % _FS_EVERY == 0)
        .select("doc_id")
        .mapInPandas(
            synth, schema="media_id long, modality string, payload binary"
        )
    )
    resized = resize_images(media, target_w=_RS_W, target_h=_RS_H)
    return (
        resized.filter(F.col("resize_ok") == "ok")
        .mapInPandas(
            measure,
            schema="media_id long, width long, height long, pixel_sum long",
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------- q208
# Perceptual-hash (dHash) image dedup: the multimodal near-dup operator.
# Images are 32×32 grayscale-in-RGB PNGs whose pixel value is
# (x·y·k) % 200 + s with k = (doc_id % 5) + 2 (five structure classes)
# and s = (doc_id % 3)·20 (three brightness variants).  Because the
# shift s never wraps (max 199 + 40 < 256), adjacent-pixel ORDERINGS are
# s-invariant — so the dHash collapses brightness variants of the same
# structure to ONE hash, which is exactly what perceptual hashing is
# for, while exact byte hashes keep all 15 (k, s) images distinct.  The
# whole pipeline (encode → real PNG decode → pixel-center NN downsample
# → 56-bit dHash → census) is closed-form in doc_id, so DuckDB verifies
# it without seeing a byte (the q189/q198 binary-oracle pattern).

_PHASH_WH = 32  # square source image
_PHASH_T = 8  # downsample grid (8×8 → 7 comparisons × 8 rows = 56 bits)


def phash_png_media_from_documents(
    docs: DataFrame, every: int = _FLAT_EVERY
) -> DataFrame:
    """Structured-texture PNG payloads for the dHash census (see module
    comment above for the closed pixel form)."""
    import numpy as np

    from pyspark_anomaly_detection_spark.multimodal.codecs import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                k = did % 5 + 2
                s = (did % 3) * 20
                xy = np.arange(_PHASH_WH, dtype=np.int64)
                gray = ((np.outer(xy, xy) * k) % 200 + s).astype(np.uint8)
                img = np.repeat(gray[:, :, None], 3, axis=2)
                payloads.append(encode_png(img, filter_type=did % 5))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    return (
        docs.filter(F.col("doc_id") % every == 0)
        .select("doc_id")
        .mapInPandas(run, schema="media_id long, payload binary")
    )


def dhash56(arr) -> int:
    """56-bit difference hash of an RGB array: pixel-center NN downsample
    to the 8×8 grid (the q201 rule sy = ⌊(2y+1)·H/(2T)⌋), then
    bit(j·7+i) = 1 iff gray[j, i+1] > gray[j, i]."""
    import numpy as np

    g = arr[:, :, 0].astype(np.int64)
    ys = ((2 * np.arange(_PHASH_T) + 1) * g.shape[0]) // (2 * _PHASH_T)
    xs = ((2 * np.arange(_PHASH_T) + 1) * g.shape[1]) // (2 * _PHASH_T)
    small = g[np.ix_(ys, xs)]
    bits = small[:, 1:] > small[:, :-1]
    h = 0
    for j in range(_PHASH_T):
        for i in range(_PHASH_T - 1):
            if bits[j, i]:
                h |= 1 << (j * (_PHASH_T - 1) + i)
    return h


def image_dhashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, dhash, img_key) for the synthesized census corpus:
    real PNG decode → 56-bit dHash + exact-bytes md5 key, distributed."""
    import hashlib

    from pyspark_anomaly_detection_spark.multimodal.codecs import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    arr = decode_image(bytes(payload))
                    rows.append(
                        (
                            mid,
                            dhash56(arr),
                            hashlib.md5(bytes(payload)).hexdigest(),
                        )
                    )
                except Exception:  # noqa: BLE001 - census robustness
                    rows.append((mid, -1, ""))
            yield pd.DataFrame(
                rows, columns=["media_id", "dhash", "img_key"]
            )

    docs = load_table(spark, sf_dir, "documents")
    media = phash_png_media_from_documents(docs)
    return media.mapInPandas(
        run, schema="media_id long, dhash long, img_key string"
    )




@register(
    "q208_image_dhash_dedup_census",
    python_lane=True,
    # Closed form: with W = H = 32, T = 8 the sampled coordinate is
    # s(i) = ⌊(2i+1)·32/16⌋ = 4i+2, so the sampled gray is
    # ((4i+2)(4j+2)k) % 200 (+ s, which never changes an ordering).
    # The oracle computes each k-class's 56-bit hash from that form and
    # groups the sampled docs by it — hashing the same integers the real
    # decode produces only if every stage (PNG filters, NN downsample,
    # comparison bit packing) is byte-exact.
    oracle=f"""
    WITH ks AS (SELECT unnest(range(2, 7)) AS k),
    grid AS (
      SELECT i.i AS i, j.j AS j
      FROM (SELECT unnest(range({_PHASH_T - 1})) AS i) i,
           (SELECT unnest(range({_PHASH_T})) AS j) j
    ),
    hashes AS (
      SELECT k,
        CAST(SUM(CASE WHEN ((4*(i+1)+2) * (4*j+2) * k) % 200
                    > ((4*i+2) * (4*j+2) * k) % 200
                 THEN (CAST(1 AS BIGINT) << (j*{_PHASH_T - 1}+i))
                 ELSE 0 END) AS BIGINT) AS dhash
      FROM ks, grid GROUP BY k
    ),
    docs_k AS (
      SELECT doc_id, (doc_id % 5) + 2 AS k, doc_id % 3 AS s
      FROM documents WHERE doc_id % {_FLAT_EVERY} = 0
    )
    SELECT h.dhash AS dhash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d.k * 10 + d.s) AS BIGINT) AS n_images,
           CAST(MIN(d.doc_id) AS BIGINT) AS min_doc
    FROM docs_k d JOIN hashes h ON d.k = h.k
    GROUP BY h.dhash
    ORDER BY min_doc
    """,
)
def q208_image_dhash_dedup_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual near-dup image census: real PNG decode → dHash →
    group.  Brightness variants (same k, different s — distinct bytes,
    distinct exact hashes) collapse to one dHash; distinct structures
    (different k) stay apart.  n_docs counts collapsed docs per
    perceptual hash, n_images the distinct exact images it absorbed."""
    hashed = image_dhashes(spark, sf_dir)
    return (
        hashed.groupBy("dhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("img_key").alias("n_images"),
            F.min("media_id").alias("min_doc"),
        )
        .orderBy("min_doc")
    )


def dhash_near_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 4,
) -> DataFrame:
    """Hamming-radius self-join over perceptual hashes WITHOUT all-pairs:
    split the 56-bit hash into ``max_hamming + 1`` bands — by pigeonhole
    any pair within the radius matches EXACTLY on at least one band, so
    a band-equality equi-join (high-cardinality key, shuffle-friendly)
    produces a complete candidate set, then one JVM ``bit_count(a XOR
    b)`` verifies.  The image twin of MinHash banding: linear in N for
    non-degenerate hash distributions, never a cartesian product."""
    n_bands = max_hamming + 1
    total_bits = _PHASH_T * (_PHASH_T - 1)
    band_bits = -(-total_bits // n_bands)  # ceil
    mask = (1 << band_bits) - 1
    bands = hashes.select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(
            F.array(*[F.lit(b) for b in range(n_bands)])
        ).alias("_band"),
    ).withColumn(
        "_bv",
        F.expr(f"shiftright({hash_col}, _band * {band_bits}) & {mask}"),
    )
    left = bands.select(
        F.col(id_col).alias("id_a"),
        F.col(hash_col).alias("h_a"),
        "_band",
        "_bv",
    )
    right = bands.select(
        F.col(id_col).alias("id_b"),
        F.col(hash_col).alias("h_b"),
        "_band",
        "_bv",
    )
    cand = (
        left.join(right, ["_band", "_bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    ).filter(F.col("hamming") <= max_hamming)


@register(
    "q209_image_neardup_pair_histogram",
    python_lane=True,
    # The oracle recomputes every pairwise Hamming distance from the
    # closed-form hashes with an ALL-PAIRS join (fine at oracle scale) —
    # while the Spark side uses the pigeonhole band join.  A green hash
    # therefore proves the banding's candidate set is COMPLETE at the
    # radius, end-to-end through the real decode, not just on fixtures.
    oracle=f"""
    WITH ks AS (SELECT unnest(range(2, 7)) AS k),
    grid AS (
      SELECT i.i AS i, j.j AS j
      FROM (SELECT unnest(range({_PHASH_T - 1})) AS i) i,
           (SELECT unnest(range({_PHASH_T})) AS j) j
    ),
    hashes AS (
      SELECT k,
        CAST(SUM(CASE WHEN ((4*(i+1)+2) * (4*j+2) * k) % 200
                    > ((4*i+2) * (4*j+2) * k) % 200
                 THEN (CAST(1 AS BIGINT) << (j*{_PHASH_T - 1}+i))
                 ELSE 0 END) AS BIGINT) AS dhash
      FROM ks, grid GROUP BY k
    ),
    doc_hash AS (
      SELECT d.doc_id, h.dhash
      FROM (SELECT doc_id, (doc_id % 5) + 2 AS k FROM documents
            WHERE doc_id % {_FLAT_EVERY} = 0) d
      JOIN hashes h ON d.k = h.k
    ),
    pairs AS (
      SELECT bit_count(xor(a.dhash, b.dhash)) AS hamming
      FROM doc_hash a JOIN doc_hash b ON a.doc_id < b.doc_id
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE hamming <= 4
    GROUP BY hamming ORDER BY hamming
    """,
)
def q209_image_neardup_pair_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual near-dup PAIRS at Hamming radius 4 via the pigeonhole
    band join (dhash_near_pairs — never all-pairs on the Spark side),
    summarized as a (hamming, n_pairs) histogram.  Brightness variants
    of the same structure land at distance 0; distinct structures fall
    outside the radius."""
    from pyspark_anomaly_detection_spark.cachepool import tracked_persist

    # persist: the band self-join reads the decoded-hash frame on BOTH
    # sides — without this the PNG decode pipeline runs twice
    hashed = tracked_persist(
        image_dhashes(spark, sf_dir).select("media_id", "dhash")
    )
    pairs = dhash_near_pairs(hashed)
    return (
        pairs.groupBy(F.col("hamming").cast("long").alias("hamming"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("hamming")
    )
