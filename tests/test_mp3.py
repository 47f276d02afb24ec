"""MP3 frame-header walker tests (multimodal/mp3.py).

q190's oracle proves the distributed pipeline end to end; these pin the
header ARITHMETIC against hand computations from the public ISO tables
and the walker's degradation behavior on the garbage real corpora
contain.
"""

from __future__ import annotations

import struct

from pyspark_anomaly_detection_spark.multimodal.mp3 import (
    build_mp3,
    mp3_stream_info,
    parse_frame_header,
)


def test_frame_size_hand_arithmetic():
    """MPEG-1 Layer III: size = 144 · bitrate / rate (+padding).
    128 kbps @ 44.1 kHz → floor(144·128000/44100) = 417."""
    fr = parse_frame_header(build_mp3(1))
    assert fr["frame_size"] == 417
    assert fr["samples"] == 1152
    assert fr["version"] == "MPEG1" and fr["layer"] == 3
    # 320 kbps @ 48 kHz → 144·320000/48000 = 960 exactly
    fr = parse_frame_header(build_mp3(1, bitrate_kbps=320, sample_rate=48000))
    assert fr["frame_size"] == 960


def test_stream_walk_counts_and_duration():
    info = mp3_stream_info(build_mp3(38))
    assert info["n_frames"] == 38
    assert info["duration_ms"] == 38 * 1152 * 1000 // 44100  # 992
    assert info["mean_bitrate"] == 128000
    assert info["channels"] == 2
    assert info["parsed_ok"]


def test_id3v2_tag_skipped():
    tagged = build_mp3(7, id3_bytes=500)
    bare = build_mp3(7)
    a, b = mp3_stream_info(tagged), mp3_stream_info(bare)
    assert a == b
    assert tagged[:3] == b"ID3" and len(tagged) == len(bare) + 510


def test_mono_flag():
    assert mp3_stream_info(build_mp3(3, mono=True))["channels"] == 1


def test_garbage_and_truncation():
    assert mp3_stream_info(b"") is None
    assert mp3_stream_info(b"this is not audio at all....") is None
    cut = build_mp3(4)[:-50]  # last frame loses part of its payload
    info = mp3_stream_info(cut)
    assert info["n_frames"] == 3  # truncated tail frame NOT counted
    assert not info["parsed_ok"]


def test_trailing_garbage_flags_not_ok():
    data = build_mp3(5) + b"\x00garbage after the stream"
    info = mp3_stream_info(data)
    assert info["n_frames"] == 5
    assert not info["parsed_ok"]


def test_reserved_fields_rejected():
    good = struct.unpack(">I", build_mp3(1)[:4])[0]
    bad_version = (good & ~(0x3 << 19)) | (1 << 19)  # reserved version
    bad_layer = good & ~(0x3 << 17)                  # layer bits 00
    bad_rate = good | (0x3 << 10)                    # sample-rate 11
    bad_bitrate = good | (0xF << 12)                 # bitrate 1111
    for h in (bad_version, bad_layer, bad_rate, bad_bitrate):
        assert parse_frame_header(struct.pack(">I", h) + bytes(500)) is None


def test_distributed_mp3_census(spark, sf_dir):
    from pyspark_anomaly_detection_spark.io.readers import load_table
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        extract_mp3_info,
        mp3_media_from_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = extract_mp3_info(mp3_media_from_documents(docs)).collect()
    assert rows and all(r.parsed_ok for r in rows)
    for r in rows:
        assert r.n_frames == 20 + r.media_id % 30
        assert r.mean_bitrate == (64, 128, 192, 320)[r.media_id % 4] * 1000
        assert r.channels == (1 if r.media_id % 2 == 1 else 2)
