"""Structural image-header decode: round-trip through real containers,
corrupt-input rejection, and endianness traps."""

from __future__ import annotations

import hashlib
import struct

import pytest

from kafka_go_streamer_spark.multimodal import (
    CONTAINER_OVERHEAD,
    parse_image_header,
    synthesize_image_blob,
)

CONTENT = b"some payload bytes for the content body"


@pytest.mark.parametrize("fmt", ["png", "jpeg", "gif"])
def test_roundtrip(fmt):
    blob = synthesize_image_blob(CONTENT, fmt, width=640, height=480)
    meta = parse_image_header(blob)
    assert meta["format"] == fmt
    assert (meta["width"], meta["height"]) == (640, 480)
    assert meta["channels"] == 3
    assert meta["byte_len"] == len(CONTENT) + CONTAINER_OVERHEAD[fmt]
    assert meta["content_hash"] == hashlib.sha256(CONTENT).hexdigest()


def test_asymmetric_dims_not_swapped():
    """JPEG stores height before width and GIF is little-endian — a
    parser that gets either wrong passes square-image tests."""
    for fmt in ("png", "jpeg", "gif"):
        meta = parse_image_header(
            synthesize_image_blob(CONTENT, fmt, width=300, height=7)
        )
        assert (meta["width"], meta["height"]) == (300, 7), fmt


def test_png_crc_verified():
    blob = bytearray(synthesize_image_blob(CONTENT, "png", 64, 64))
    blob[18] ^= 0xFF  # flip a width byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        parse_image_header(bytes(blob))


def test_jpeg_walks_past_other_segments():
    """SOF need not be the first marker — insert an APP0 (JFIF) segment
    ahead of it and the walker must skip over it."""
    plain = synthesize_image_blob(CONTENT, "jpeg", 123, 45)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    with_app0 = plain[:2] + app0 + plain[2:]
    meta = parse_image_header(with_app0)
    assert (meta["width"], meta["height"]) == (123, 45)


def test_rejects_garbage_and_empty():
    with pytest.raises(ValueError):
        parse_image_header(b"")
    with pytest.raises(ValueError):
        parse_image_header(b"not an image at all")


def test_png_channels_from_color_type():
    blob = bytearray(synthesize_image_blob(CONTENT, "png", 10, 10))
    # patch color type (offset 16+9) to 6 = RGBA, then refresh the CRC
    import zlib

    blob[25] = 6
    ihdr = bytes(blob[16:29])
    blob[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    assert parse_image_header(bytes(blob))["channels"] == 4
