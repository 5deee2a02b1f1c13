"""Decode-path contract for multimodal_decode (VERDICT r01 finding #6):
PIL, when importable, must be USED (not a NotImplementedError tripwire) —
real image bytes decode to true dimensions with status 'pil'; non-image
bytes fall back to the deterministic fake with status 'fake'. The PNG bytes
are synthesized from the public format spec (signature + IHDR + IDAT +
IEND), so the test needs no image fixtures or libraries to build them."""

from __future__ import annotations

import struct
import zlib

import pytest


def _png(width: int, height: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG of the given dimensions."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0 + zero pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_fake_branch_on_non_image_bytes(spark):
    from url_counter_mapreduce_spark.operators.multimodal import decode_blobs

    df = spark.createDataFrame([(1, b"definitely not an image")], "doc_id long, payload binary")
    rows = decode_blobs(df).collect()
    assert rows[0].decode_status == "fake"
    assert 64 <= rows[0].width < 256 and 64 <= rows[0].height < 256


def test_pil_branch_decodes_real_png(spark):
    pytest.importorskip("PIL")
    from url_counter_mapreduce_spark.operators.multimodal import decode_blobs

    df = spark.createDataFrame(
        [(1, _png(12, 7)), (2, _png(300, 2)), (3, b"junk bytes")],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_blobs(df).collect()}
    assert (rows[1].decode_status, rows[1].width, rows[1].height, rows[1].n_frames) == ("pil", 12, 7, 1)
    assert (rows[2].decode_status, rows[2].width, rows[2].height) == ("pil", 300, 2)
    assert rows[3].decode_status == "fake"  # mixed batch: junk still falls back
