"""Multimodal binary columns: REAL PNG/JPEG header decode (pure-Python
struct parsing of payloads synthesized as structurally valid headers),
magic-byte format gate, per-row error isolation, batch shape."""

from __future__ import annotations

import zlib

from engine.multimodal import (
    JPEG_N_BYTES,
    MEDIA_META_SCHEMA,
    PNG_N_BYTES,
    _decode_image,
    extract_media_meta,
    synthesize_media,
)


def test_media_meta_roundtrip(spark):
    docs = spark.createDataFrame(
        [(6, "hello world"), (1, "xyz"), (2, "longer text value here"),
         (9, "jpeg carrier row"), (12, "café…")],
        "doc_id long, text string",
    )
    meta = extract_media_meta(synthesize_media(docs))
    assert meta.schema == MEDIA_META_SCHEMA
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert rows[6]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video" and rows[9]["kind"] == "image"
    assert all(r["decode_ok"] for r in rows.values())
    # PNG row (doc_id%6==0): dims REALLY parsed back out of the IHDR
    assert rows[6]["n_bytes"] == PNG_N_BYTES
    assert rows[6]["width"] == len("hello world") % 640 + 1
    assert rows[6]["height"] == len("hello world") % 480 + 1
    assert rows[6]["n_frames"] == 1
    # JPEG row (doc_id%6==3): dims parsed from the SOF0 segment
    assert rows[9]["n_bytes"] == JPEG_N_BYTES
    assert rows[9]["width"] == len("jpeg carrier row") % 640 + 1
    assert rows[9]["height"] == len("jpeg carrier row") % 480 + 1
    # audio gets frames only
    assert rows[1]["width"] is None and rows[1]["n_frames"] == 3 * 4
    # non-ASCII text: dimensions derive from BYTE length (oracle's
    # strlen), not character length
    assert rows[12]["width"] == len("café…".encode()) % 640 + 1
    assert rows[12]["width"] != len("café…") % 640 + 1


def test_synthesized_png_is_structurally_valid(spark):
    """The codegen-built payload is a real PNG header: signature, IHDR
    first, CRC32 correct — checked in Python, independent of the
    engine's own parser."""
    docs = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    # doc_id 0 is the planted-corrupt slot; re-key to a clean PNG slot
    docs = docs.selectExpr("doc_id + 6 AS doc_id", "text")
    payload = bytes(synthesize_media(docs).collect()[0]["payload"])
    assert payload[:8] == bytes.fromhex("89504e470d0a1a0a")
    assert payload[12:16] == b"IHDR"
    length = int.from_bytes(payload[8:12], "big")
    crc = int.from_bytes(payload[16 + length : 20 + length], "big")
    assert zlib.crc32(payload[12 : 16 + length]) & 0xFFFFFFFF == crc
    assert int.from_bytes(payload[16:20], "big") == 6 % 640 + 1
    assert int.from_bytes(payload[20:24], "big") == 6 % 480 + 1
    assert payload.endswith(bytes.fromhex("49454e44ae426082"))


def test_magic_byte_gate_and_error_isolation(spark):
    # planted corrupt slot: doc_id % 30 == 0 carries raw text bytes
    docs = spark.createDataFrame(
        [(30, "not an image at all"), (36, "fine png")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in extract_media_meta(synthesize_media(docs)).collect()
    }
    bad, good = rows[30], rows[36]
    assert not bad["decode_ok"] and bad["error"] == "UNSUPPORTED_IMAGE_FORMAT"
    assert bad["width"] is None and bad["n_bytes"] == len("not an image at all")
    assert good["decode_ok"] and good["error"] is None and good["width"] is not None


def test_media_error_isolation(spark):
    media = spark.createDataFrame(
        [(0, "image", bytearray(b"ok")), (1, "image", None)],
        "doc_id long, kind string, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_media_meta(media).collect()}
    # garbage bytes hit the magic-byte gate, not the fake-success path
    assert not rows[0]["decode_ok"]
    assert rows[0]["error"] == "UNSUPPORTED_IMAGE_FORMAT"
    # null payload → error row, partition did not fail
    assert not rows[1]["decode_ok"] and "NULL_PAYLOAD" in rows[1]["error"]


def test_decode_image_corrupted_crc_and_truncation():
    """Unit-level parser gates: bad CRC, truncated IHDR, JPEG without
    SOF all raise typed errors (→ error rows, never partition failures)."""
    import pytest

    png_sig = bytes.fromhex("89504e470d0a1a0a")
    ihdr = b"IHDR" + (5).to_bytes(4, "big") + (7).to_bytes(4, "big") + bytes(5)
    good = (
        png_sig + (13).to_bytes(4, "big") + ihdr
        + (zlib.crc32(ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
        + bytes.fromhex("0000000049454e44ae426082")
    )
    assert _decode_image(good) == (5, 7)
    bad_crc = bytearray(good)
    bad_crc[-13] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError, match="PNG_BAD_CRC"):
        _decode_image(bytes(bad_crc))
    with pytest.raises(ValueError, match="PNG_TRUNCATED"):
        _decode_image(png_sig + b"\x00\x00")
    with pytest.raises(ValueError, match="JPEG_NO_SOF"):
        _decode_image(b"\xff\xd8\xff\xe0\x00\x02")
