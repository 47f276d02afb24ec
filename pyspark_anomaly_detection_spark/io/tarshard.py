"""WebDataset-style tar shards (q212) — the standard packaging for
multimodal training pairs: a shard is a POSIX ustar archive whose
members group by basename stem (``000123.txt`` + ``000123.png`` is one
sample), readers stream samples sequentially per shard, and shards are
the parallelism unit (exactly how WebDataset feeds PyTorch loaders).

From-scratch ustar codec, stdlib-only: 512-byte headers (name, octal
size, checksum over a space-filled checksum field, ``ustar`` magic),
512-aligned member payloads, two zero blocks of trailer.  The reader
walks headers by offset arithmetic — never scanning for magic — and
verifies each header checksum; a bad checksum or truncated member stops
the walk cleanly.

q212 proves the round trip with the binary-oracle pattern: Spark packs
(text, PNG) pairs into real tar shards (one per 16 sampled docs),
re-reads them distributed, pairs members by stem, and censuses bytes
per shard; DuckDB computes the same census closed-form — text bytes
from ``strlen(text)``, PNG bytes from the byte-exact size formula of
the q208 image family (uncompressed-stored zlib framing makes the
payload size a closed function of the image dimensions).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

_BLOCK = 512
#: q212 sampling/grouping: every 4th doc, 16 samples per shard.
_SHARD_EVERY = 4
_SHARD_GROUP = 64


def _tar_header(name: str, size: int) -> bytes:
    """POSIX ustar header for a regular file (mode 0644, numeric owner
    0/0, mtime 0 — deterministic bytes for reproducible shards)."""
    h = bytearray(_BLOCK)
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"tar member name too long: {name!r}")
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}".encode() + b"\x00"
    h[136:148] = b"00000000000\x00"
    h[148:156] = b" " * 8  # checksum field blanked for the sum
    h[156] = 0x30  # typeflag '0' regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}".encode() + b"\x00 "
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """(name, payload) members → ustar archive bytes."""
    out = bytearray()
    for name, payload in members:
        out += _tar_header(name, len(payload))
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def parse_tar(blob: bytes) -> list[tuple[str, bytes]]:
    """Walk ustar members by offset arithmetic, verifying each header
    checksum.  Stops cleanly (never raises) on the zero-block trailer,
    a checksum mismatch, or a truncated member."""
    out = []
    pos = 0
    n = len(blob)
    while pos + _BLOCK <= n:
        hdr = blob[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            break
        try:
            stored = int(hdr[148:156].rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
            size = int(hdr[124:136].rstrip(b"\x00 ") or b"0", 8)
        except ValueError:
            break
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if summed != stored:
            break
        name = hdr[:100].rstrip(b"\x00").decode("utf-8", "replace")
        body_start = pos + _BLOCK
        if body_start + size > n:
            break
        out.append((name, blob[body_start : body_start + size]))
        pos = body_start + size + (-size % _BLOCK)
    return out


def webdataset_shards_from_documents(docs: DataFrame) -> DataFrame:
    """(shard_id, blob): every ``_SHARD_EVERY``-th doc contributes one
    sample — ``<doc>.txt`` (the text, UTF-8) + ``<doc>.png`` (the q208
    structured-texture image) — packed in doc order per shard."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
            _PHASH_WH,
        )
        from pyspark_anomaly_detection_spark.multimodal.codecs import encode_png

        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes]] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(d)
            k = did % 5 + 2
            s = (did % 3) * 20
            xy = np.arange(_PHASH_WH, dtype=np.int64)
            gray = ((np.outer(xy, xy) * k) % 200 + s).astype(np.uint8)
            img = np.repeat(gray[:, :, None], 3, axis=2)
            # NULL text → empty .txt member, never the literal "None"
            # (nulls fuzz variant caught str(None) leaking 4 bytes)
            members.append(
                (f"{did:09d}.txt", ("" if t is None else str(t)).encode("utf-8"))
            )
            # level=0 (stored deflate): member size closed-form for the oracle
            members.append(
                (f"{did:09d}.png", encode_png(img, filter_type=0, level=0))
            )
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "blob": [build_tar(members)],
            }
        )

    sampled = (
        docs.filter(F.col("doc_id") % _SHARD_EVERY == 0)
        .select(
            "doc_id",
            "text",
            F.expr(
                f"(doc_id - pmod(doc_id, {_SHARD_GROUP})) div {_SHARD_GROUP}"
            ).alias("shard_id"),
        )
    )
    return sampled.groupBy("shard_id").applyInPandas(
        build, schema="shard_id long, blob binary"
    )


def png_stored_size(wh: int) -> int:
    """Byte-exact size of the q208-family PNG (filter 0, no interlace)
    when zlib chooses stored (uncompressed) deflate blocks — closed in
    the image dimensions, which is what lets the oracle predict member
    sizes without building a byte.  Raw stream = h·(1 + 3·w) filtered
    bytes; zlib framing = 2-byte header + ceil(raw/65535)·5 block
    headers + 4-byte adler; PNG framing = 8 magic + (12+13) IHDR +
    12+IDAT + 12 IEND."""
    raw = wh * (1 + 3 * wh)
    zlib_len = 2 + raw + 5 * ((raw + 65534) // 65535) + 4
    return 8 + 25 + (12 + zlib_len) + 12


@register(
    "q212_webdataset_roundtrip_census",
    python_lane=True,
    # PNG member size is closed-form ONLY if zlib emits stored blocks
    # for the high-entropy texture; that holds for this family and is
    # additionally pinned by tests/test_tarshard.py — if a zlib ever
    # compressed it, the hash (and the pin) would go red, loudly.
    oracle=f"""
    SELECT
      (doc_id - (doc_id % {_SHARD_GROUP})) // {_SHARD_GROUP} AS shard_id,
      CAST(COUNT(*) AS BIGINT) AS n_samples,
      CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
      CAST(COUNT(*) * {png_stored_size(32)} AS BIGINT) AS image_bytes,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE doc_id % {_SHARD_EVERY} = 0
    GROUP BY 1
    ORDER BY shard_id
    """,
)
def q212_webdataset_roundtrip_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WebDataset shard round trip: (text, PNG) pairs → real ustar
    shards → distributed member walk with checksum verification → pair
    members by basename stem → per-shard census.  The oracle predicts
    text bytes from strlen and PNG bytes from the closed stored-deflate
    size formula — a green hash proves header arithmetic, checksums,
    512-alignment, and stem pairing are all byte-exact."""

    def reparse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf["shard_id"], pdf["blob"]):
                samples: dict[str, dict[str, int]] = {}
                for name, payload in parse_tar(bytes(blob)):
                    stem, _, ext = name.rpartition(".")
                    samples.setdefault(stem, {})[ext] = len(payload)
                for stem, exts in samples.items():
                    if "txt" in exts and "png" in exts:
                        rows.append(
                            (
                                int(sid),
                                int(stem),
                                exts["txt"],
                                exts["png"],
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["shard_id", "doc_id", "txt_len", "png_len"],
            )

    docs = load_table(spark, sf_dir, "documents")
    shards = webdataset_shards_from_documents(docs)
    recs = shards.mapInPandas(
        reparse,
        schema="shard_id long, doc_id long, txt_len long, png_len long",
    )
    return (
        recs.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("txt_len").alias("text_bytes"),
            F.sum("png_len").alias("image_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard_id")
    )
