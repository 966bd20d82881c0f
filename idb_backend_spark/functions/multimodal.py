"""Multimodal binary columns: media validation, decode plumbing,
derivative stubs (reference idb/helpers/media_validation.py — F24;
idigbio_ingestion/mediaing/derivatives.py — F25).

Model: media content is an opaque ``binary`` column beside typed metadata
(mime, bucket, dims); all per-blob work runs through Arrow-batched
``mapInPandas`` so a 100 TB media table streams batch-wise through
executors without ever materializing per-row Python objects.

Magic-byte sniffing (the reference's validation core) is real logic here;
pixel decode / resize / spectrogram need imaging libraries not present in
this container, so ``decode_image`` is STUBBED: with ``fake=True`` it
produces deterministic pseudo-dimensions (hash-derived) so the plumbing —
schema, batching, partitioning — is fully exercised and tested; with
``fake=False`` it raises NotImplementedError where PIL would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: magic-byte prefixes -> (mime, bucket) (media_validation.py sniff table)
_MAGIC: list[tuple[bytes, str, str]] = [
    (b"\xff\xd8\xff", "image/jpeg", "images"),
    (b"\x89PNG\r\n\x1a\n", "image/png", "images"),
    (b"GIF87a", "image/gif", "images"),
    (b"GIF89a", "image/gif", "images"),
    (b"II*\x00", "image/tiff", "images"),
    (b"MM\x00*", "image/tiff", "images"),
    (b"ID3", "audio/mpeg", "sounds"),
    (b"\xff\xfb", "audio/mpeg", "sounds"),
    (b"OggS", "audio/ogg", "sounds"),
    (b"%PDF", "application/pdf", "debugfile"),
]

#: media buckets (media_validation.py get_default_bucket)
BUCKETS = ("images", "sounds", "videos", "debugfile")


def sniff_mime(head: bytes | None) -> tuple[str | None, str | None]:
    """First-1KB magic-byte sniff -> (detected mime, bucket)
    (media_validation.py; used at db.py:694-706)."""
    if not head:
        return None, None
    for magic, mime, bucket in _MAGIC:
        if head.startswith(magic):
            return mime, bucket
    if len(head) >= 12 and head[:4] == b"RIFF":
        if head[8:12] == b"WAVE":
            return "audio/x-wav", "sounds"
        if head[8:12] == b"AVI ":
            return "video/x-msvideo", "videos"
    if len(head) >= 12 and head[4:8] == b"ftyp":
        return "video/mp4", "videos"
    return None, None


MEDIA_META_SCHEMA = StructType(
    [
        StructField("etag", StringType()),
        StructField("detected_mime", StringType()),
        StructField("bucket", StringType()),
        StructField("size_bytes", IntegerType()),
    ]
)


def validate_media(
    df: DataFrame, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """F24 — per-blob validation via mapInPandas: sha1 etag, sniffed mime,
    storage bucket, size. Mime/type compatibility is a plain column
    comparison downstream (stated_mime == detected_mime)."""
    out_schema = StructType(
        [df.schema[id_col], *MEDIA_META_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob) if blob is not None else None
                if b is None:
                    rows.append((_id, None, None, None, None))
                    continue
                mime, bucket = sniff_mime(b[:1024])
                rows.append(
                    (_id, hashlib.sha1(b).hexdigest(), mime, bucket, len(b))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "etag", "detected_mime", "bucket", "size_bytes"],
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def _fake_dims(b: bytes) -> tuple[int, int]:
    h = hashlib.sha1(b).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


DECODE_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    fake: bool = True,
) -> DataFrame:
    """F25 (decode step) — image decode via mapInPandas.

    STUB: real pixel decode requires PIL (absent here); ``fake=True``
    yields deterministic hash-derived dimensions so schema/batch plumbing
    is real and tested. Plug PIL into ``_decode_one`` for production.
    """
    out_schema = StructType([df.schema[id_col], *DECODE_SCHEMA.fields])

    def _decode_one(b: bytes) -> tuple[int, int, str]:
        if fake:
            w, h = _fake_dims(b)
            return w, h, "RGB"
        raise NotImplementedError(
            "image decode requires PIL; install pillow and replace this stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    rows.append((_id, None, None, None))
                    continue
                w, h, mode = _decode_one(bytes(blob))
                rows.append((_id, w, h, mode))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "mode"]
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def derivative_plan(
    decoded: DataFrame, widths: tuple[int, ...] = (260, 600)
) -> DataFrame:
    """F25 (derivative sizing) — thumbnail/webview target dimensions
    (derivatives.py:24-27: widths 260/600, proportional height). Pure
    expression: the resize itself happens in the decode UDF."""
    out = decoded
    for w in widths:
        out = out.withColumn(
            f"deriv_{w}_height",
            F.when(
                F.col("width").isNotNull() & (F.col("width") > 0),
                F.round(F.col("height") * w / F.col("width")).cast("int"),
            ),
        )
    return out
