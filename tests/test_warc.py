"""WARC codec (io/warc.py): framing round trips, Content-Length walking
(not marker splitting), warcinfo skipping, and malformed-tail tolerance."""

from __future__ import annotations

from pyspark_anomaly_detection_spark.io.warc import (
    build_warc,
    parse_warc,
)


def _recs():
    return [
        ("response", "http://x/doc/1", b"hello world"),
        ("response", "http://x/doc/2", b""),
        ("request", "http://x/doc/2", b"GET / HTTP/1.1"),
    ]


def test_roundtrip_preserves_payloads_and_types():
    blob = build_warc(_recs())
    got = parse_warc(blob)
    # warcinfo + the three records, in order
    assert [r["warc_type"] for r in got] == [
        "warcinfo", "response", "response", "request",
    ]
    assert got[1]["payload"] == b"hello world"
    assert got[2]["payload"] == b""
    assert got[2]["content_length"] == 0
    assert got[3]["target_uri"] == "http://x/doc/2"


def test_payload_containing_header_like_bytes_is_not_split():
    """The killer case for marker-splitting parsers: a payload that
    embeds a full WARC header block.  Content-Length walking must keep
    it as ONE record."""
    trap = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    blob = build_warc([("response", "http://x/doc/9", trap)])
    got = parse_warc(blob)
    assert len(got) == 2  # warcinfo + the one response
    assert got[1]["payload"] == trap


def test_truncated_payload_and_garbage_tail_stop_cleanly():
    blob = build_warc([("response", "http://x/doc/1", b"abcdef")])
    # cut inside the final payload: record dropped, no raise
    assert [r["warc_type"] for r in parse_warc(blob[:-9])] == ["warcinfo"]
    # trailing garbage after a valid file: parsed records unaffected
    got = parse_warc(blob + b"\x00garbage\xff")
    assert [r["warc_type"] for r in got] == ["warcinfo", "response"]
    # non-numeric Content-Length stops the walk, never raises
    bad = blob.replace(b"Content-Length: 6", b"Content-Length: x", 1)
    assert all(r["warc_type"] == "warcinfo" for r in parse_warc(bad))


def test_unicode_payload_octet_exact():
    text = "héllo wörld — ünïcode"
    blob = build_warc([("response", "http://x/doc/3", text.encode())])
    rec = parse_warc(blob)[1]
    assert rec["content_length"] == len(text.encode())
    assert rec["payload"].decode() == text
