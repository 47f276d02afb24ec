"""ustar codec (io/tarshard.py): stdlib-tarfile interop, checksum
verification, truncation tolerance, and the stored-PNG size pin the
q212 oracle depends on."""

from __future__ import annotations

import io
import tarfile

import numpy as np

from pyspark_anomaly_detection_spark.io.tarshard import (
    build_tar,
    parse_tar,
    png_stored_size,
)


def _members():
    return [
        ("000000001.txt", b"hello world"),
        ("000000001.png", b"\x89PNG fake payload" * 40),
        ("empty.bin", b""),
        ("exact_block.bin", b"x" * 512),
    ]


def test_roundtrip_and_alignment():
    blob = build_tar(_members())
    assert len(blob) % 512 == 0
    assert parse_tar(blob) == _members()


def test_stdlib_tarfile_reads_our_archives():
    """Interop: Python's tarfile must accept our ustar bytes verbatim —
    proof the headers are spec-correct, not merely self-consistent."""
    blob = build_tar(_members())
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == _members()


def test_we_read_stdlib_tarfile_archives():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in _members():
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    got = parse_tar(buf.getvalue())
    assert got == _members()


def test_corrupt_checksum_and_truncation_stop_cleanly():
    blob = bytearray(build_tar(_members()))
    # flip a byte inside the SECOND member's header name field
    second_hdr = 512 + 512  # first header + padded 11-byte payload
    blob[second_hdr + 3] ^= 0xFF
    got = parse_tar(bytes(blob))
    assert got == _members()[:1]  # walk stops at the corrupt header
    # truncation inside a payload drops that member, keeps priors
    whole = build_tar(_members())
    assert parse_tar(whole[: 512 + 5]) == []


def test_png_stored_size_formula_is_exact():
    """The q212 oracle predicts PNG member sizes from this formula; pin
    it against real encodes across the image family."""
    from pyspark_anomaly_detection_spark.multimodal.codecs import encode_png

    for did in (0, 1, 7, 23, 100):
        k = did % 5 + 2
        s = (did % 3) * 20
        xy = np.arange(32, dtype=np.int64)
        gray = ((np.outer(xy, xy) * k) % 200 + s).astype(np.uint8)
        img = np.repeat(gray[:, :, None], 3, axis=2)
        assert len(encode_png(img, filter_type=0, level=0)) == png_stored_size(32)
    # and a non-square sanity point
    img2 = np.zeros((16, 40, 3), dtype=np.uint8)
    raw = 16 * (1 + 3 * 40)
    expect = 8 + 25 + (12 + 2 + raw + 5 + 4) + 12
    assert len(encode_png(img2, filter_type=0, level=0)) == expect
