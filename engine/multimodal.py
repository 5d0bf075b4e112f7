"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched `mapInPandas`.

The reference is literally an image feature service (cv2.imdecode at
utils.py:107-109, resize at image_processor.py:83-118, magic-byte
format gate at image_validator.py:64-89, per-feature error isolation
at analyze.py:96-111). Here BOTH the plumbing and the image header
decode are real:

- `synthesize_media` emits structurally valid PNG (signature + IHDR
  with a correct CRC32 + IEND) and JPEG (SOI + SOF0 + EOI) payloads
  whose dimensions derive deterministically from the text length —
  built entirely from codegen column expressions (concat/unhex/crc32),
  no Python. A planted subset carries raw text bytes (no image magic)
  to exercise the format gate.
- `_decode_image` parses those headers with pure-Python `struct`:
  PNG magic → IHDR width/height + CRC verification; JPEG SOI → walk
  segments to the first SOF marker → height/width. A payload with
  neither magic raises UNSUPPORTED_IMAGE_FORMAT — the reference's
  imghdr whitelist (image_validator.py:64-89) as an error-row path.
  Full pixel decode (not needed for metadata) remains a cluster-side
  cv2/PIL swap-in, flagged below.

Scale shape: binary columns never shuffle — the extract is a narrow
mapInPandas over the scan, emitting only small typed metadata rows.
Arrow batch size bounds worker memory (payloads stream batch-by-batch).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType(), nullable=True),
    ]
)

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

_KINDS = ["image", "audio", "video"]

_PNG_SIG = bytes.fromhex("89504e470d0a1a0a")
# bit depth 8, color type 2 (truecolor), compression/filter/interlace 0
_PNG_IHDR_TAIL = bytes.fromhex("0802000000")
_PNG_IEND = bytes.fromhex("0000000049454e44ae426082")
# JPEG SOF0: len 0x0011 (17) = len(2)+precision(1)+H(2)+W(2)+Nf(1)+3*3
_JPEG_HEAD = b"\xff\xd8\xff\xc0\x00\x11\x08"
_JPEG_COMPS = bytes.fromhex("03011100021101031101")  # Nf=3 + 3 component specs
_JPEG_EOI = b"\xff\xd9"
# PNG: 8 sig + 25 IHDR chunk + 12 IEND; JPEG: 2 SOI + 19 SOF0 + 2 EOI
PNG_N_BYTES = 45
JPEG_N_BYTES = 23


def _be(col: Column, nbytes: int) -> Column:
    """Integer column → fixed-width big-endian binary."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), nbytes * 2, "0"))


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents table: kind cycles
    by doc_id (0=image, 1=audio, 2=video mod 3). Image rows carry a
    structurally valid PNG (doc_id % 6 == 0) or JPEG (doc_id % 6 == 3)
    whose width/height are (len(text) % 640 + 1, len(text) % 480 + 1);
    rows with doc_id % 30 == 0 instead carry the raw UTF-8 text bytes —
    a magic-byte mismatch that must land in the error column, not fail
    the partition. Audio/video payloads are the raw text bytes (their
    codecs are honest stubs; see `_extract_batch`).

    The payload bytes — including the PNG IHDR CRC32 — are built from
    codegen column expressions (concat/unhex/lpad/crc32): no Python in
    the synthesis path. (No external data; fully reproducible.)"""
    # BYTE length (octet_length), not character length: the DuckDB
    # oracle's strlen counts bytes, and char-length would silently
    # diverge on any non-ASCII text (latent engine/oracle mismatch
    # flagged by the round-3 review; masked so far only because the
    # testdata documents tables happen to be ASCII)
    w = (F.octet_length("text") % 640 + 1).cast("bigint")
    h = (F.octet_length("text") % 480 + 1).cast("bigint")
    ihdr_data = F.concat(F.lit(b"IHDR"), _be(w, 4), _be(h, 4), F.lit(_PNG_IHDR_TAIL))
    png = F.concat(
        F.lit(_PNG_SIG),
        F.lit(bytes.fromhex("0000000d")),
        ihdr_data,
        _be(F.crc32(ihdr_data), 4),
        F.lit(_PNG_IEND),
    )
    jpeg = F.concat(
        F.lit(_JPEG_HEAD), _be(h, 2), _be(w, 2), F.lit(_JPEG_COMPS), F.lit(_JPEG_EOI)
    )
    raw = F.encode(F.col("text"), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = (
        F.when(F.col("doc_id") % 30 == 0, raw)  # planted corrupt "image"
        .when(F.col("doc_id") % 6 == 0, png)
        .when(F.col("doc_id") % 6 == 3, jpeg)
        .otherwise(raw)
    )
    return docs.select(F.col("doc_id"), kind.alias("kind"), payload.alias("payload"))


# SOF0-SOF15 carry frame dimensions, except DHT/JPG/DAC (C4, C8, CC)
_JPEG_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Parse an image payload's header → (width, height). Pure-Python
    `struct` parsing of PNG IHDR (with CRC verification) and JPEG SOF —
    REAL decoding of the formats `synthesize_media` emits; the
    reference's magic-byte whitelist (image_validator.py:64-89) is the
    UNSUPPORTED_IMAGE_FORMAT raise. Pixel-level decode (unneeded for
    metadata) is the one cluster-side swap-in (cv2.imdecode,
    reference utils.py:107-109)."""
    if payload[:8] == _PNG_SIG:
        if len(payload) < 33 or payload[12:16] != b"IHDR":
            raise ValueError("PNG_TRUNCATED")
        (length,) = struct.unpack(">I", payload[8:12])
        w, h = struct.unpack(">II", payload[16:24])
        (crc,) = struct.unpack(">I", payload[16 + length : 20 + length])
        if zlib.crc32(payload[12 : 16 + length]) & 0xFFFFFFFF != crc:
            raise ValueError("PNG_BAD_CRC")
        return w, h
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG_BAD_MARKER")
            marker = payload[i + 1]
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(payload):
                    raise ValueError("JPEG_TRUNCATED")
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seglen
        raise ValueError("JPEG_NO_SOF")
    raise ValueError("UNSUPPORTED_IMAGE_FORMAT")


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch kernel with per-row error isolation (the reference's
    per-feature try/except, analyze.py:109-111): a failing row emits an
    error row, never fails the partition."""
    out = []
    for doc_id, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
        row = {
            "doc_id": doc_id,
            "kind": kind,
            "n_bytes": None,
            "width": None,
            "height": None,
            "n_frames": None,
            "decode_ok": False,
            "error": None,
        }
        try:
            if payload is None:
                raise ValueError("NULL_PAYLOAD")
            n = len(payload)
            row["n_bytes"] = n
            if kind == "image":
                row["width"], row["height"] = _decode_image(bytes(payload))
                row["n_frames"] = 1
            elif kind == "audio":
                # STUB: sample-count fake (real: soundfile/librosa)
                row["n_frames"] = n * 4
            else:  # video — STUB dims/frame-sample fake (real: pyav/ffmpeg)
                row["n_frames"] = (n // 100) + 1
                row["width"], row["height"] = (n % 640) + 1, (n % 480) + 1
            row["decode_ok"] = True
        except Exception as exc:  # noqa: BLE001 — error-isolation contract
            row["error"] = str(exc)[:200]
        out.append(row)
    return pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    return media.mapInPandas(gen, schema=MEDIA_META_SCHEMA)
