"""WARC (ISO 28500) record codec — the web-corpus ingest format every
large-scale LLM text pipeline starts from (Common Crawl ships WARC).

From-scratch, stdlib-only: a writer that frames documents as
``WARC-Type: response`` records (plus a leading ``warcinfo`` record the
reader must SKIP — type filtering is part of the contract), and a reader
that walks records by parsing headers and slicing ``Content-Length``
octets — never by splitting on markers, which would corrupt on payloads
containing header-like bytes.

q210 proves the round trip end-to-end with the binary-oracle pattern
(cf. q189/q198): Spark builds real WARC blobs from the documents table
(one blob per 16 sampled docs), re-parses them distributed, and censuses
records per blob; DuckDB computes the same census closed-form from the
documents table without seeing a byte.  A green hash shows the framing,
the octet accounting, and the warcinfo skip are all exact.

Scale shape: one blob ≙ one WARC file; building is ``applyInPandas``
per file-group, parsing is ``mapInPandas`` per blob — both
embarrassingly parallel over files, the same layout a 100 TB Common
Crawl read has (files are the parallelism unit; records stream within
a file).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_anomaly_detection_spark.io.readers import load_table
from pyspark_anomaly_detection_spark.registry import register

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"
#: sampling/grouping for q210: every 4th doc, 16 docs per WARC blob.
_WARC_EVERY = 4
_WARC_GROUP = 64  # doc_id // 64 → file_id (16 sampled docs per file)


def build_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """Frame (warc_type, target_uri, payload) triples as one WARC file,
    prefixed with a ``warcinfo`` record describing the writer."""
    out = bytearray()
    info = b"software: pyspark-anomaly-detection-spark warc writer\r\n"
    out += _record("warcinfo", None, info)
    for wtype, uri, payload in records:
        out += _record(wtype, uri, payload)
    return bytes(out)


def _record(wtype: str, uri: str | None, payload: bytes) -> bytes:
    head = bytearray()
    head += _WARC_VERSION + _CRLF
    head += f"WARC-Type: {wtype}".encode() + _CRLF
    head += b"WARC-Date: 2023-06-01T00:00:00Z" + _CRLF
    if uri is not None:
        head += f"WARC-Target-URI: {uri}".encode() + _CRLF
    head += f"Content-Length: {len(payload)}".encode() + _CRLF
    head += _CRLF
    return bytes(head) + payload + _CRLF + _CRLF


_URI_DOC = re.compile(r"/doc/(\d+)$")


def parse_warc(blob: bytes) -> list[dict]:
    """Walk a WARC file's records: headers to the blank line, then slice
    exactly ``Content-Length`` payload octets — resilient to payloads
    that contain header-like text.  Malformed tails stop the walk (never
    raise); unknown header lines are ignored."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(_WARC_VERSION, pos):
            break  # trailing garbage / truncation: stop, don't raise
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            key, _, val = line.partition(b":")
            if val:
                headers[key.decode("ascii", "replace").strip().lower()] = (
                    val.decode("utf-8", "replace").strip()
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated payload
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "content_length": clen,
                "payload": blob[body_start : body_start + clen],
            }
        )
        pos = body_start + clen + 4  # payload + \r\n\r\n
    return out


def warc_blobs_from_documents(docs: DataFrame) -> DataFrame:
    """(file_id, blob): every ``_WARC_EVERY``-th doc framed as a response
    record, ``_WARC_GROUP // _WARC_EVERY`` docs per blob, URIs carrying
    the doc id for round-trip identification."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [
            (
                "response",
                f"http://corpus.example/doc/{int(d)}",
                # NULL text → EMPTY payload (Content-Length 0), never
                # the literal string "None" (nulls fuzz variant caught
                # str(None) leaking 4 bytes into the archive)
                ("" if t is None else str(t)).encode("utf-8"),
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {"file_id": [int(pdf["file_id"].iloc[0])], "blob": [build_warc(recs)]}
        )

    sampled = (
        docs.filter(F.col("doc_id") % _WARC_EVERY == 0)
        .select(
            "doc_id",
            "text",
            (
                F.expr(f"(doc_id - pmod(doc_id, {_WARC_GROUP})) div {_WARC_GROUP}")
            ).alias("file_id"),
        )
    )
    return sampled.groupBy("file_id").applyInPandas(
        build, schema="file_id long, blob binary"
    )


@register(
    "q210_warc_roundtrip_census",
    python_lane=True,
    oracle=f"""
    SELECT
      (doc_id - (doc_id % {_WARC_GROUP})) // {_WARC_GROUP} AS file_id,
      CAST(COUNT(*) AS BIGINT) AS n_records,
      CAST(SUM(strlen(text)) AS BIGINT) AS payload_bytes,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE doc_id % {_WARC_EVERY} = 0
    GROUP BY 1
    ORDER BY file_id
    """,
)
def q210_warc_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest round trip: documents → real WARC blobs → distributed
    record walk → per-file census of response records (the warcinfo
    record must be skipped; doc ids are recovered from the target URIs;
    payload octets re-counted from the sliced bodies).  The oracle
    derives the census straight from the documents table — a green hash
    proves the framing and the Content-Length walk are octet-exact."""

    def reparse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["blob"]):
                for rec in parse_warc(bytes(blob)):
                    if rec["warc_type"] != "response":
                        continue
                    m = _URI_DOC.search(rec["target_uri"] or "")
                    rows.append(
                        (
                            int(fid),
                            int(m.group(1)) if m else -1,
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["file_id", "doc_id", "payload_len"]
            )

    docs = load_table(spark, sf_dir, "documents")
    blobs = warc_blobs_from_documents(docs)
    recs = blobs.mapInPandas(
        reparse, schema="file_id long, doc_id long, payload_len long"
    )
    return (
        recs.groupBy("file_id")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("payload_len").alias("payload_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("file_id")
    )
