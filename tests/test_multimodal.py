"""Multimodal binary-column plumbing: schema, batch shape, error
isolation. The codec is stubbed (no image libs in-container); the
Spark-side plumbing is real and tested."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.multimodal import (
    MEDIA_META_SCHEMA,
    extract_media_meta,
    synthesize_media,
)


def test_media_meta_roundtrip(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "xyz"), (2, "longer text value here")],
        "doc_id long, text string",
    )
    meta = extract_media_meta(synthesize_media(docs))
    assert meta.schema == MEDIA_META_SCHEMA
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video"
    # n_bytes == utf-8 byte length of the source text
    assert rows[0]["n_bytes"] == len("hello world".encode())
    assert all(r["decode_ok"] for r in rows.values())
    # image gets dims + 1 frame; audio gets frames only
    assert rows[0]["width"] is not None and rows[0]["n_frames"] == 1
    assert rows[1]["width"] is None and rows[1]["n_frames"] == 3 * 4


def test_media_error_isolation(spark):
    media = spark.createDataFrame(
        [(0, "image", bytearray(b"ok")), (1, "image", None)],
        "doc_id long, kind string, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_media_meta(media).collect()}
    assert rows[0]["decode_ok"] and rows[0]["error"] is None
    # null payload → error row, partition did not fail
    assert not rows[1]["decode_ok"] and "NULL_PAYLOAD" in rows[1]["error"]
