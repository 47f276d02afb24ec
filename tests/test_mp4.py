"""MP4/ISO-BMFF box-walker tests (multimodal/mp4.py): hand-assembled
boxes with known arithmetic, 64-bit sizes, malformed degradation."""

from __future__ import annotations

import struct

from pyspark_anomaly_detection_spark.multimodal.mp4 import (
    build_mp4,
    parse_mp4,
)


def test_roundtrip_both_mvhd_versions_and_timescales():
    a = parse_mp4(build_mp4(5000, video_tracks=1, audio_tracks=1,
                            width=640, height=360))
    assert a["duration_ms"] == 5000 and a["timescale"] == 1000
    assert a["handlers"] == ["vide", "soun"]
    assert (a["width"], a["height"]) == (640, 360)
    b = parse_mp4(build_mp4(123456, timescale=90000, version1_mvhd=True,
                            width=1920, height=1080))
    assert b["duration_ms"] == 123456 and b["timescale"] == 90000


def test_hand_assembled_largesize_box():
    """A moov wrapped in a 64-bit largesize header (size==1 + 8-byte
    length) — a layout the writer never emits."""
    inner = build_mp4(2000)
    # find the moov box and re-wrap it with largesize
    i = inner.find(b"moov") - 4
    (size,) = struct.unpack_from(">I", inner, i)
    moov_body = inner[i + 8 : i + size]
    largesize = struct.pack(">I4sQ", 1, b"moov", 16 + len(moov_body)) + moov_body
    data = inner[:i] + largesize + inner[i + size:]
    meta = parse_mp4(data)
    assert meta["duration_ms"] == 2000


def test_size_zero_box_runs_to_end():
    data = build_mp4(700)
    i = data.find(b"mdat") - 4
    data = data[:i] + struct.pack(">I", 0) + data[i + 4:]
    assert parse_mp4(data)["duration_ms"] == 700


def test_garbage_and_truncation_degrade():
    assert parse_mp4(b"") is None
    assert parse_mp4(b"random bytes, not video") is None
    assert parse_mp4(build_mp4(1000)[:30]) is None
    # malformed child size inside moov: stop cleanly, keep mvhd results
    data = bytearray(build_mp4(3000, video_tracks=1))
    i = bytes(data).find(b"trak") - 4
    struct.pack_into(">I", data, i, 4)  # size < 8: malformed
    meta = parse_mp4(bytes(data))
    assert meta is not None and meta["duration_ms"] == 3000


def test_distributed_mp4_census(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        extract_mp4_info,
        mp4_media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = extract_mp4_info(mp4_media_from_documents(docs)).collect()
    assert rows and all(r.parsed_ok for r in rows)
    for r in rows:
        assert r.duration_ms == 1000 + (r.media_id % 600) * 100
        assert r.n_video == 1 + r.media_id % 2
        assert r.n_audio == r.media_id % 3
        assert r.width == 320 * (1 + r.media_id % 4)


def test_parse_mp4_empty_mvhd_and_tkhd_degrade():
    """A size-8 mvhd/tkhd (no body) that ends the tree must degrade to a
    partial census, not IndexError (round-6 ADVICE crash)."""
    import struct

    from pyspark_anomaly_detection_spark.multimodal.mp4 import parse_mp4

    def box(typ, body=b""):
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x00\x00")
    trak = box(b"trak", box(b"tkhd"))  # empty tkhd
    moov = box(b"moov", box(b"mvhd") + trak)  # empty mvhd
    out = parse_mp4(ftyp + moov)
    assert out is not None and out["brand"] == "isom"
    assert "timescale" not in out  # degraded, not crashed
    assert out["n_tracks"] == 0  # no hdlr under the empty-tkhd trak
