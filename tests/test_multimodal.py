"""F24/F25 multimodal tests: magic-byte sniffing, mapInPandas validation
pipeline, stubbed decode plumbing, derivative sizing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.functions import multimodal as mm

JPEG = b"\xff\xd8\xff\xe0" + b"j" * 100
PNG = b"\x89PNG\r\n\x1a\n" + b"p" * 50
WAV = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"w" * 20
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"m" * 20
JUNK = b"hello world this is not media"


def test_sniff_mime():
    assert mm.sniff_mime(JPEG) == ("image/jpeg", "images")
    assert mm.sniff_mime(PNG) == ("image/png", "images")
    assert mm.sniff_mime(WAV) == ("audio/x-wav", "sounds")
    assert mm.sniff_mime(MP4) == ("video/mp4", "videos")
    assert mm.sniff_mime(b"%PDF-1.4") == ("application/pdf", "debugfile")
    assert mm.sniff_mime(JUNK) == (None, None)
    assert mm.sniff_mime(None) == (None, None)


def _media_df(spark):
    return spark.createDataFrame(
        [("a", JPEG), ("b", PNG), ("c", WAV), ("d", JUNK), ("e", None)],
        "id string, content binary",
    )


def test_validate_media(spark):
    out = {r["id"]: r for r in mm.validate_media(_media_df(spark)).collect()}
    assert out["a"]["detected_mime"] == "image/jpeg"
    assert out["a"]["bucket"] == "images"
    assert out["a"]["etag"] == hashlib.sha1(JPEG).hexdigest()
    assert out["a"]["size_bytes"] == len(JPEG)
    assert out["c"]["bucket"] == "sounds"
    assert out["d"]["detected_mime"] is None
    assert out["e"]["etag"] is None


def test_decode_and_derivatives(spark):
    decoded = mm.decode_image(_media_df(spark))
    out = {r["id"]: r for r in decoded.collect()}
    # deterministic fake dims: same input -> same dims
    again = {r["id"]: r for r in mm.decode_image(_media_df(spark)).collect()}
    assert out["a"]["width"] == again["a"]["width"]
    assert 64 <= out["a"]["width"] <= 255
    assert out["e"]["width"] is None

    plan = mm.derivative_plan(decoded).collect()
    for r in plan:
        if r["width"]:
            assert r["deriv_260_height"] == round(r["height"] * 260 / r["width"])


def test_decode_real_path_raises(spark):
    with pytest.raises(Exception) as ei:
        mm.decode_image(_media_df(spark), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "PIL" in str(ei.value)
