"""Unit tests for the multimodal pipeline: the REAL image-header parser
(PNG/JPEG/GIF), the minimal encoders, and the Arrow batch shape."""

from __future__ import annotations

import base64
import struct

import pytest

from de_project_airflow_etl_spark.operators.multimodal import (
    decode_image, encode_jpeg_header, encode_png_header, multimodal_features,
    synth_payload,
)

# The canonical 1x1 transparent PNG (8-bit RGBA), as served by a million
# tracking pixels — a REAL file produced by a real encoder, not ours.
REAL_1PX_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")


def test_decode_real_world_png():
    meta = decode_image(REAL_1PX_PNG)
    assert meta == {"width": 1, "height": 1, "channels": 4,
                    "format": "png"}


def test_png_roundtrip_and_crc():
    payload = encode_png_header(640, 480, color_type=2)
    meta = decode_image(payload)
    assert meta == {"width": 640, "height": 480, "channels": 3,
                    "format": "png"}
    # IHDR CRC must be the spec CRC32 over chunk type + data
    import zlib
    assert struct.unpack(">I", payload[29:33])[0] == \
        zlib.crc32(payload[12:29])


def test_jpeg_roundtrip_walks_markers():
    payload = encode_jpeg_header(1920, 1080, n_components=3)
    meta = decode_image(payload)
    assert meta == {"width": 1920, "height": 1080, "channels": 3,
                    "format": "jpeg"}
    # grayscale variant
    assert decode_image(encode_jpeg_header(8, 8, 1))["channels"] == 1


def test_gif_logical_screen_descriptor():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00;"
    assert decode_image(gif) == {"width": 320, "height": 200,
                                 "channels": 3, "format": "gif"}


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"not an image at all")
    with pytest.raises(ValueError, match="IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    with pytest.raises(ValueError, match="no SOF"):
        decode_image(b"\xff\xd8\xff\xd9")


def test_decode_truncated_payloads_raise_value_error():
    """Truncated streams are ValueError like every other malformed case
    — never struct.error (which would crash a mapInPandas worker with a
    different, uncatchable-by-contract exception)."""
    # JPEG cut off inside the SOF header (after the 4 len/marker bytes)
    full = encode_jpeg_header(64, 64, 3)
    sof_at = full.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_image(full[:sof_at + 7])
    # zero/undersized segment length can no longer loop or mis-walk
    with pytest.raises(ValueError, match="segment length"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x01rest")
    # GIF cut off inside the logical screen descriptor
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_image(b"GIF89a\x40")


def test_map_in_pandas_features(spark, sf_dir):
    feats = multimodal_features(spark, sf_dir)
    rows = feats.collect()
    assert len(rows) == 500
    by_id = {r["doc_id"]: r for r in rows}
    from de_project_airflow_etl_spark.tables import load
    doc0 = load(spark, sf_dir, "documents").filter("doc_id = 0").first()
    payload = synth_payload(0, doc0["text"])
    expected = decode_image(payload)
    got = by_id[0]
    assert got["n_bytes"] == len(payload)
    assert (got["width"], got["height"], got["channels"], got["format"]) \
        == (expected["width"], expected["height"], expected["channels"],
            expected["format"])
