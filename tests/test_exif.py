"""EXIF parser/writer tests (multimodal/exif.py).

The q189 oracle proves the whole distributed pipeline; these tests pin
the parser against byte layouts the WRITER DID NOT PRODUCE — a
hand-assembled minimal TIFF, both endiannesses, inline vs out-of-line
values, and malformed structures that must degrade, not raise.
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark_anomaly_detection_spark.multimodal.exif import (
    TAG_ORIENTATION,
    build_exif_app1,
    inject_exif,
    parse_exif,
)
from pyspark_anomaly_detection_spark.multimodal.jpeg import (
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _jpeg():
    return encode_jpeg_baseline(np.full((16, 24, 3), 99, dtype=np.uint8))


def test_roundtrip_both_endians():
    for be in (False, True):
        app1 = build_exif_app1(
            orientation=6,
            make="TestCam",
            model="X100",
            datetime_str="2026:08:14 10:00:00",
            width=24,
            height=16,
            big_endian=be,
        )
        meta = parse_exif(inject_exif(_jpeg(), app1))
        assert meta == {
            "orientation": 6,
            "make": "TestCam",
            "model": "X100",
            "datetime": "2026:08:14 10:00:00",
            "pixel_x": 24,
            "pixel_y": 16,
        }


def test_hand_assembled_minimal_tiff():
    """A TIFF built field-by-field in the test (big-endian, one
    orientation SHORT inline) — independent of the writer's layout
    choices."""
    tiff = struct.pack(">2sHI", b"MM", 42, 8)
    tiff += struct.pack(">H", 1)  # one entry
    tiff += struct.pack(">HHI", TAG_ORIENTATION, 3, 1)
    tiff += struct.pack(">H", 8) + b"\x00\x00"  # SHORT value 8, inline
    tiff += struct.pack(">I", 0)  # next IFD
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    meta = parse_exif(inject_exif(_jpeg(), app1))
    assert meta == {"orientation": 8}


def test_no_exif_returns_none():
    assert parse_exif(_jpeg()) is None
    assert parse_exif(encode_jpeg_progressive(
        np.full((16, 16, 3), 42, dtype=np.uint8))) is None


def test_progressive_jpeg_with_exif():
    img = np.full((16, 24, 3), 50, dtype=np.uint8)
    app1 = build_exif_app1(orientation=3)
    meta = parse_exif(inject_exif(encode_jpeg_progressive(img), app1))
    assert meta == {"orientation": 3}


def test_malformed_exif_degrades_not_raises():
    jpeg = _jpeg()
    app1 = build_exif_app1(orientation=5, make="A", width=24, height=16)
    # truncate the TIFF body mid-IFD
    cut = inject_exif(jpeg, app1[:24] + b"\x00" * 2)
    assert parse_exif(cut) in (None, {})
    # wild value offset (points past the segment)
    bad_tiff = struct.pack("<2sHI", b"II", 42, 8)
    bad_tiff += struct.pack("<H", 1)
    bad_tiff += struct.pack("<HHI", 0x010F, 2, 4000)  # ASCII, absurd count
    bad_tiff += struct.pack("<I", 99999)  # offset far outside
    bad_tiff += struct.pack("<I", 0)
    payload = b"Exif\x00\x00" + bad_tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    assert parse_exif(inject_exif(jpeg, app1)) is None  # field skipped → empty
    # wrong byte-order mark
    payload = b"Exif\x00\x00" + b"XX" + bad_tiff[2:]
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    assert parse_exif(inject_exif(jpeg, app1)) is None


def test_exif_survives_before_other_segments():
    """APP1 injected after SOI precedes DQT/SOF — the parser must stop
    scanning at SOS and find the segment regardless of what follows."""
    app1 = build_exif_app1(orientation=2, make="Z")
    tagged = inject_exif(_jpeg(), app1)
    assert tagged[2:4] == b"\xff\xe1"
    meta = parse_exif(tagged)
    assert meta["orientation"] == 2 and meta["make"] == "Z"


def test_distributed_exif_census(spark, sf_dir):
    """q189 end to end at test scale: every synthesized payload parses
    ok, and the census matches the closed form."""
    from pyspark_anomaly_detection_spark.multimodal.binary_ops import (
        extract_exif,
        jpeg_media_from_documents,
    )
    from pyspark_anomaly_detection_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    ex = extract_exif(jpeg_media_from_documents(docs, with_exif=True))
    rows = ex.collect()
    assert rows and all(r.exif_ok == "ok" for r in rows)
    for r in rows:
        assert r.orientation == 1 + r.media_id % 8
        assert r.make == f"Cam{r.media_id % 3}"
        assert (r.pixel_x, r.pixel_y) == (24, 16)


def test_decode_jpeg_tolerates_exif_segment():
    """The decoder must skip APP1 like any APPn: decoding an
    EXIF-tagged payload yields the identical pixels."""
    import numpy as np
    from pyspark_anomaly_detection_spark.multimodal.jpeg import decode_jpeg

    img = np.full((16, 24, 3), 99, dtype=np.uint8)
    plain = _jpeg()
    tagged = inject_exif(plain, build_exif_app1(orientation=7, make="X"))
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(tagged))


def test_parse_exif_self_referential_ifd_terminates():
    """Malformed TIFF whose ExifIFD pointer loops back at IFD0: the
    visited-offset guard must terminate the walk (previously
    RecursionError), honoring the never-raises contract."""
    import struct

    from pyspark_anomaly_detection_spark.multimodal.exif import (
        TAG_EXIF_IFD,
        parse_exif,
    )

    bo = "<"
    # IFD0 at offset 8 with one entry: ExifIFD pointer -> offset 8 (itself)
    ifd = struct.pack(f"{bo}H", 1)
    ifd += struct.pack(f"{bo}HHI", TAG_EXIF_IFD, 4, 1) + struct.pack(f"{bo}I", 8)
    ifd += struct.pack(f"{bo}I", 0)  # next-IFD
    tiff = b"II" + struct.pack(f"{bo}HI", 42, 8) + ifd
    payload = b"Exif\x00\x00" + tiff
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", 2 + len(payload))
        + payload
        + b"\xff\xd9"
    )
    parse_exif(jpeg)  # must return (any value), not raise


def test_parse_exif_mutual_ifd_cycle_terminates():
    """Two IFDs pointing at each other — the guard must break the cycle,
    not just direct self-reference."""
    import struct

    from pyspark_anomaly_detection_spark.multimodal.exif import (
        TAG_EXIF_IFD,
        parse_exif,
    )

    bo = "<"

    def ifd(ptr):
        b = struct.pack(f"{bo}H", 1)
        b += struct.pack(f"{bo}HHI", TAG_EXIF_IFD, 4, 1) + struct.pack(f"{bo}I", ptr)
        b += struct.pack(f"{bo}I", 0)
        return b

    ifd_a = ifd(8 + 18)  # IFD B offset
    ifd_b = ifd(8)       # back to IFD A
    tiff = b"II" + struct.pack(f"{bo}HI", 42, 8) + ifd_a + ifd_b
    payload = b"Exif\x00\x00" + tiff
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", 2 + len(payload))
        + payload
        + b"\xff\xd9"
    )
    parse_exif(jpeg)
