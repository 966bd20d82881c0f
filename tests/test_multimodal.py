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
    assert mm.sniff_mime(MP4) == ("video/mp4", "video")
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
    decoded = mm.decode_image(_media_df(spark), fake=True)
    out = {r["id"]: r for r in decoded.collect()}
    # deterministic fake dims: same input -> same dims
    again = {
        r["id"]: r
        for r in mm.decode_image(_media_df(spark), fake=True).collect()
    }
    assert out["a"]["width"] == again["a"]["width"]
    assert 64 <= out["a"]["width"] <= 255
    assert out["e"]["width"] is None

    plan = mm.derivative_plan(decoded).collect()
    for r in plan:
        if r["width"]:
            assert r["deriv_260_height"] == round(r["height"] * 260 / r["width"])


def test_generate_derivatives_fake_plumbing(spark):
    rows = mm.generate_derivatives(_media_df(spark), fake=True).collect()
    by = {(r["id"], r["dtype"]): r for r in rows}
    # one row per (decodable blob, dtype); nulls produce nothing
    assert {k[0] for k in by} == {"a", "b", "c", "d"}
    assert {k[1] for k in by if k[0] == "a"} == set(mm.DTYPES)
    # fullsize passes JPEG sources through byte-identical
    assert bytes(by[("a", "fullsize")]["content"]) == JPEG
    # sized derivatives: proportional, never upscaled
    for _id in "abcd":
        w0, h0 = by[(_id, "fullsize")]["width"], by[(_id, "fullsize")]["height"]
        for d, tw in mm.WIDTHS.items():
            r = by[(_id, d)]
            if w0 > tw:
                assert r["width"] == tw
                assert r["height"] == int(h0 * tw / w0)
            else:
                assert (r["width"], r["height"]) == (w0, h0)
            assert bytes(r["content"]).startswith(b"\xff\xd8\xff")


@pytest.mark.skipif(mm.HAS_PIL, reason="pillow present: real path active")
def test_decode_real_path_raises_without_pil(spark):
    with pytest.raises(Exception) as ei:
        mm.decode_image(_media_df(spark), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "pillow" in str(ei.value)


@pytest.mark.skipif(not mm.HAS_PIL, reason="pillow not installed")
def test_real_kernel_decodes_and_resizes(spark):
    """Lights up automatically when pillow is installed — no code change."""
    img = mm._PILImage.new("RGB", (800, 400), (10, 200, 30))
    import io as _io

    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([("x", png)], "id string, content binary")

    out = {r["id"]: r for r in mm.decode_image(df, fake=False).collect()}
    assert (out["x"]["width"], out["x"]["height"]) == (800, 400)

    dv = {
        r["dtype"]: r
        for r in mm.generate_derivatives(df, fake=False).collect()
    }
    assert (dv["thumbnail"]["width"], dv["thumbnail"]["height"]) == (260, 130)
    assert (dv["webview"]["width"], dv["webview"]["height"]) == (600, 300)
    # PNG source re-encodes to JPEG for fullsize
    assert bytes(dv["fullsize"]["content"]).startswith(b"\xff\xd8\xff")


def _wav_bytes(samples, rate=1000, width=2, channels=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        dt = {1: "i1", 2: "<i2", 4: "<i4"}[width]
        w.writeframes(np.asarray(samples).astype(dt).tobytes())
    return buf.getvalue()


def test_wav_rms_peaks_constant_amplitude():
    import numpy as np

    # 107 chunks x 10 samples of a +-1000 square wave: every chunk RMS is
    # exactly 1000 -> normalized peaks are all db_ceiling (60)
    samples = np.tile([1000.0, -1000.0], 5 * mm.AUDIO_BAR_COUNT)
    duration, peaks = mm.wav_rms_peaks(_wav_bytes(samples))
    assert duration == 1070
    assert peaks == [mm.AUDIO_DB_CEILING] * mm.AUDIO_BAR_COUNT


def test_wav_rms_peaks_silence_and_garbage():
    import numpy as np

    duration, peaks = mm.wav_rms_peaks(
        _wav_bytes(np.zeros(10 * mm.AUDIO_BAR_COUNT))
    )
    assert duration == 1070
    assert peaks == [0] * mm.AUDIO_BAR_COUNT
    assert mm.wav_rms_peaks(b"not a wav at all") is None
    assert mm.wav_rms_peaks(b"RIFF\x00\x00\x00\x00WAVEjunk") is None


def test_wav_rms_peaks_stereo_averages_channels():
    import numpy as np

    # L = +-2000 square, R = exact negation -> mono mean is 0 everywhere
    n = 10 * mm.AUDIO_BAR_COUNT
    left = np.tile([2000.0, -2000.0], n // 2)
    inter = np.empty(2 * n)
    inter[0::2] = left
    inter[1::2] = -left
    duration, peaks = mm.wav_rms_peaks(_wav_bytes(inter, channels=2))
    assert duration == 1070
    assert peaks == [0] * mm.AUDIO_BAR_COUNT


def test_audio_waveform_operator(spark):
    import numpy as np

    blobs = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(np.tile([500.0, -500.0], 5 * mm.AUDIO_BAR_COUNT)))),
            (2, bytearray(b"bogus")),
            (3, None),
        ],
        "id long, content binary",
    )
    out = {r["id"]: r for r in mm.audio_waveform(blobs).collect()}
    assert out[1]["duration_ms"] == 1070
    assert out[1]["peaks"] == [mm.AUDIO_DB_CEILING] * mm.AUDIO_BAR_COUNT
    # no pillow in this container -> render column stays null
    assert out[1]["waveform_png"] is None or isinstance(
        out[1]["waveform_png"], (bytes, bytearray)
    )
    assert out[2]["peaks"] is None  # undecodable: log-and-skip contract
    assert out[3]["peaks"] is None


def test_wav_8bit_pcm_is_unsigned(spark):
    """WAV stores 8-bit PCM unsigned with a 128 offset: 8-bit silence
    (all samples 128) must decode to zero peaks — the signed read made
    silence come out full-scale."""
    import io
    import wave

    import numpy as np

    from idb_backend_spark.functions.multimodal import wav_rms_peaks

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(np.full(8000, 128, dtype=np.uint8).tobytes())
    out = wav_rms_peaks(buf.getvalue())
    assert out is not None
    duration_ms, peaks = out
    assert duration_ms == 1000
    assert all(p == 0 for p in peaks)


def test_video_frame_sample_fake_kernel(spark):
    """T10 video tier: the fake sampler's stride arithmetic, frame
    indexing, null/empty skipping, and token derivation — the plumbing
    the driver oracle grades end-to-end."""
    rows = [
        (1, b"x" * 450),   # 450 'ms' -> frames at 0, 200, 400
        (2, b""),          # zero-length video -> no frames
        (3, None),         # null blob -> skipped entirely
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = mm.sample_video_frames(df, fake=True).orderBy("media_id", "ts_ms")
    got = [tuple(r) for r in out.collect()]
    w = 320 + 450 % 17
    exp = [
        (1, 0, 0, w, 240, hashlib.md5(b"1:0").hexdigest()),
        (1, 5, 200, w, 240, hashlib.md5(b"1:5").hexdigest()),
        (1, 10, 400, w, 240, hashlib.md5(b"1:10").hexdigest()),
    ]
    assert got == exp


def test_video_frame_sample_real_path_raises_without_av(spark):
    if mm.HAS_AV:  # pragma: no cover - container has no PyAV
        pytest.skip("PyAV available; real path usable")
    df = spark.createDataFrame([(1, b"\x00")], "media_id long, data binary")
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(df, fake=False)


def test_extract_features_deterministic_and_normalized(spark):
    """The embed step: stable unit-norm vectors, null blobs -> null
    embedding, schema matching embeddings.parquet's (id, array<float>)."""
    rows = [(1, b"media-one"), (2, b"media-two"), (3, None), (4, b"media-one")]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r["embedding"]
           for r in mm.extract_features(df, dim=8).collect()}
    assert out[3] is None
    assert out[1] == out[4]          # pure function of the bytes
    assert out[1] != out[2]
    assert len(out[1]) == 8
    norm = sum(v * v for v in out[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-5    # L2-normalized
    with pytest.raises(NotImplementedError):
        mm.extract_features(df, fake=False)


def test_video_to_frames_to_ann_pipeline_composes(spark):
    """The multimodal verbs compose end-to-end: video blobs -> sampled
    frames -> per-frame features -> exact cosine top-k. Exercises the
    schema contracts between sample_video_frames, extract_features, and
    operators/ann.py on real Spark plans (all Arrow-batched)."""
    from idb_backend_spark.operators.ann import brute_force_topk

    vids = spark.createDataFrame(
        [(i, bytes(f"video-{i}".encode()) * 60) for i in range(4)],
        "media_id long, data binary",
    )
    frames = mm.sample_video_frames(vids, stride_ms=100, fake=True)
    # frame surrogate blob = the token; surrogate id packs (video, frame)
    frame_blobs = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("id"),
        F.encode(F.col("frame_token"), "utf-8").alias("content"),
    )
    emb = mm.extract_features(frame_blobs, dim=16)
    qvec = emb.filter(F.col("id") == 0).select("embedding").first()[0]
    top = brute_force_topk(emb, qvec, id_col="id", k=3).collect()
    assert len(top) == 3
    assert top[0]["id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-6
    assert top[0]["cosine"] >= top[1]["cosine"] >= top[2]["cosine"]


def test_wav_truncated_payload_returns_none():
    """A truncated WAV (length not a multiple of sample width x
    channels) yields the documented None, never a numpy ValueError that
    would kill the Spark task."""
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 400)
    blob = bytearray(buf.getvalue())
    blob[40:44] = (401).to_bytes(4, "little")  # lie about data size... 
    truncated = bytes(blob)
    assert mm.wav_rms_peaks(truncated) is None or isinstance(
        mm.wav_rms_peaks(truncated), tuple
    )
    # direct construction of the pathological case: odd byte count
    import numpy as np  # noqa: F401
    blob2 = buf.getvalue()[:-1]
    assert mm.wav_rms_peaks(blob2) is None or isinstance(
        mm.wav_rms_peaks(blob2), tuple
    )


def test_media_udfs_preserve_string_ids(spark):
    """String/uuid media keys are the domain norm: the video sampler and
    feature extractor must preserve the caller's id type like every
    sibling media function, not hardcode bigint."""
    df = spark.createDataFrame(
        [("uuid-a", b"x" * 250), ("uuid-b", b"y" * 90)],
        "media_id string, data binary",
    )
    frames = mm.sample_video_frames(df, fake=True)
    assert dict(frames.dtypes)["media_id"] == "string"
    got = frames.groupBy("media_id").count().collect()
    assert {r["media_id"] for r in got} == {"uuid-a", "uuid-b"}

    feats = mm.extract_features(
        df.withColumnRenamed("data", "content"), id_col="media_id", dim=4
    )
    assert dict(feats.dtypes)["media_id"] == "string"
    assert feats.count() == 2


def test_phash_bit_math_hand_pixels():
    """The pure bit math, decoder-independent: hand grids where the
    expected bits are computable on paper."""
    from idb_backend_spark.functions import multimodal as mm

    # ahash: one bright pixel among 64 zeros -> only that bit set
    px = [0] * 64
    px[10] = 255
    assert mm.phash_bits_from_pixels(px, "ahash") == 1 << 10
    # all-equal grid: nothing exceeds the mean -> 0
    assert mm.phash_bits_from_pixels([7] * 64, "ahash") == 0
    # dhash: strictly decreasing rows -> every gradient bit set ->
    # all-64-bits = -1 in two's complement
    dec = [(8 - c) for r in range(8) for c in range(9)]
    assert mm.phash_bits_from_pixels(dec, "dhash") == -1
    # strictly increasing rows -> no bits
    inc = [c for r in range(8) for c in range(9)]
    assert mm.phash_bits_from_pixels(inc, "dhash") == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="64 pixels"):
        mm.phash_bits_from_pixels([0] * 63, "ahash")
    with _pytest.raises(ValueError, match="kind"):
        mm.phash_bits_from_pixels([0] * 64, "phash")


def test_image_phash_deterministic_and_null_safe(spark):
    from idb_backend_spark.functions import multimodal as mm

    rows = [
        ("a", b"\x89PNG fake content one"),
        ("b", b"\x89PNG fake content one"),  # identical bytes
        ("c", b"\x89PNG different content"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {
        r["id"]: (r["ahash"], r["dhash"])
        for r in mm.image_phash(df, "content", "id", fake=True).collect()
    }
    assert got["a"] == got["b"]  # identical bytes -> identical hashes
    assert got["a"] != got["c"]
    assert got["d"] == (None, None)
    # rerun-stable (exactly-once sink contract)
    again = {
        r["id"]: (r["ahash"], r["dhash"])
        for r in mm.image_phash(df, "content", "id", fake=True).collect()
    }
    assert got == again


def test_image_neardup_pairs_exact_dups_collide(spark):
    """With the gated fake decoder, exact duplicate blobs collide at
    Hamming 0 (near-dup SEMANTICS need real pixels — documented); the
    pigeonhole join, hash plumbing, and null handling are fully real."""
    from idb_backend_spark.functions import multimodal as mm

    rows = [
        ("a", b"image payload X"),
        ("b", b"image payload X"),
        ("c", b"image payload Y"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.image_neardup_pairs(
            df, "content", "id", max_hamming=3, fake=True
        ).collect()
    }
    assert got == {("a", "b"): 0}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_kind"):
        mm.image_neardup_pairs(df, "content", "id", hash_kind="x", fake=True)


def test_audio_fingerprint_real_wav_volume_invariant(spark):
    """Real PCM decode path: the same waveform at half volume produces
    the IDENTICAL fingerprint (peaks are max-normalized), while a
    differently-shaped envelope does not; undecodable and NULL blobs
    yield NULL."""
    import numpy as np

    from idb_backend_spark.functions import multimodal as mm

    n = 10 * mm.AUDIO_BAR_COUNT
    rng = np.random.RandomState(7)
    shape = (rng.rand(n) * 2000 - 1000).astype("<i2")
    loud = _wav_bytes(shape)
    quiet = _wav_bytes((shape // 2).astype("<i2"))
    other = _wav_bytes((rng.rand(n) * 2000 - 1000).astype("<i2"))
    rows = [
        ("loud", loud),
        ("quiet", quiet),
        ("other", other),
        ("junk", b"not a wav at all"),
        ("empty", None),
    ]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {
        r["id"]: r["afp"]
        for r in mm.audio_fingerprint(df, "content", "id").collect()
    }
    assert got["loud"] == got["quiet"] is not None
    assert got["loud"] != got["other"]
    assert got["junk"] is None and got["empty"] is None
    # pairs: the volume twins collide at Hamming 0, nothing else pairs
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.audio_neardup_pairs(
            df, "content", "id", max_hamming=2
        ).collect()
    }
    assert pairs == {("loud", "quiet"): 0}


def test_audio_fingerprint_fake_matches_waveform_convention(spark):
    """fake=True derives peaks exactly as audio_waveform(fake=True), so
    the two stages agree in codec-less environments; identical bytes ->
    identical fingerprints."""
    from idb_backend_spark.functions import multimodal as mm

    rows = [("a", b"RIFFxxxx one"), ("b", b"RIFFxxxx one"), ("c", b"two")]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {
        r["id"]: r["afp"]
        for r in mm.audio_fingerprint(df, "content", "id", fake=True).collect()
    }
    assert got["a"] == got["b"] is not None
    assert got["a"] != got["c"]


def test_image_phash_kinds_selects_columns_and_work(spark):
    """``kinds`` is honored: a single-kind call emits only that column
    (image_neardup_pairs' one-downsample path), values match the
    both-kinds call, order follows the tuple, and bad kinds raise."""
    import pytest as _pytest

    from idb_backend_spark.functions import multimodal as mm

    df = spark.createDataFrame(
        [("a", b"\x89PNG fake content one"), ("d", None)],
        "id string, content binary",
    )
    both = {
        r["id"]: (r["ahash"], r["dhash"])
        for r in mm.image_phash(df, "content", "id", fake=True).collect()
    }
    only_d = mm.image_phash(df, "content", "id", fake=True, kinds=("dhash",))
    assert only_d.columns == ["id", "dhash"]
    assert {
        r["id"]: r["dhash"] for r in only_d.collect()
    } == {k: v[1] for k, v in both.items()}
    flipped = mm.image_phash(
        df, "content", "id", fake=True, kinds=("dhash", "ahash")
    )
    assert flipped.columns == ["id", "dhash", "ahash"]
    assert {
        r["id"]: (r["ahash"], r["dhash"]) for r in flipped.collect()
    } == both
    with _pytest.raises(ValueError, match="kinds"):
        mm.image_phash(df, "content", "id", fake=True, kinds=())
    with _pytest.raises(ValueError, match="kinds"):
        mm.image_phash(df, "content", "id", fake=True, kinds=("phash",))
    with _pytest.raises(ValueError, match="duplicates"):
        mm.image_phash(
            df, "content", "id", fake=True, kinds=("ahash", "ahash")
        )


def test_sniff_zip_signatures_short_circuit():
    """media_validation.py:79-81 — the three ZIP signatures (local file
    header / empty archive / spanned archive) are checked BEFORE any
    other detection."""
    assert mm.sniff_mime(b"PK\x03\x04rest") == ("application/zip", "datasets")
    assert mm.sniff_mime(b"PK\x05\x06") == ("application/zip", "datasets")
    assert mm.sniff_mime(b"PK\x07\x08xx") == ("application/zip", "datasets")
    # a bare 'PK' without the signature bytes is NOT a zip
    assert mm.sniff_mime(b"PKxx") == (None, None)


def test_validate_mime_for_type_reference_contract():
    """media_validation.py:86-102 — alias, then: explicit bucket must be
    valid and allow the aliased mime; no bucket routes via
    default_buckets; unroutable raises; (None, None) passes."""
    assert mm.validate_mime_for_type(None, None) == (None, None)
    # alias resolution: mpeg3 -> mpeg, allowed in sounds
    assert mm.validate_mime_for_type("audio/mpeg3", "sounds") == (
        "audio/mpeg", "sounds",
    )
    # no bucket: route through default_buckets
    assert mm.validate_mime_for_type("image/jpeg", None) == (
        "image/jpeg", "images",
    )
    # text/plain is ALLOWED in datasets but routes nowhere by default
    assert mm.validate_mime_for_type("text/plain", "datasets") == (
        "text/plain", "datasets",
    )
    import pytest as _pytest

    with _pytest.raises(mm.MediaValidationError) as e:
        mm.validate_mime_for_type("image/jpeg", "nope")
    assert e.value.code == "InvalidBucketError"
    with _pytest.raises(mm.MediaValidationError) as e:
        mm.validate_mime_for_type("image/jpeg", "sounds")
    assert e.value.code == "MimeNotAllowedError"
    with _pytest.raises(mm.MediaValidationError) as e:
        mm.validate_mime_for_type("text/plain", None)
    assert e.value.code == "UnknownBucketError"


def test_validate_media_stl_url_override(spark):
    """media_validation.py:113-114 — a .stl url forces model/mesh
    without sniffing (STL has no magic bytes); other urls still sniff."""
    df = spark.createDataFrame(
        [("a", JPEG, "http://x/scan.stl"), ("b", JPEG, "http://x/a.jpg")],
        "id string, content binary, url string",
    )
    out = {
        r["id"]: r
        for r in mm.validate_media(df, "content", "id", url_col="url").collect()
    }
    assert out["a"]["detected_mime"] == "model/mesh"
    assert out["a"]["bucket"] == "models"
    assert out["b"]["detected_mime"] == "image/jpeg"


# ---------------------------------------------------------------------------
# validate_content / media_object_from_content — r10 sweep of
# media_validation.validate (:104-122) and MediaObject.fromobj
# (db.py:693-721)
# ---------------------------------------------------------------------------

_JPEG = b"\xff\xd8\xff\xe0" + b"x" * 32


def test_validate_content_alias_fold_passes():
    from idb_backend_spark.functions.multimodal import validate_content

    # stated audio/mpeg3 vs detected audio/mpeg: alias folds, no raise
    mp3 = b"ID3" + b"\x00" * 32
    mime, bucket = validate_content(mp3, mime="audio/mpeg3")
    assert (mime, bucket) == ("audio/mpeg", "sounds")


def test_validate_content_mismatch_and_order():
    import pytest as _pytest

    from idb_backend_spark.functions.multimodal import (
        MediaValidationError,
        validate_content,
    )

    # stated mime must route somewhere first: a stated image/png dies
    # as UnknownBucketError BEFORE any content is read (default_buckets
    # has no png entry), so the mismatch arm needs a bucketable mime
    with _pytest.raises(MediaValidationError) as e0:
        validate_content(_JPEG, mime="image/png")
    assert e0.value.code == "UnknownBucketError"
    with _pytest.raises(MediaValidationError) as e:
        validate_content(_JPEG, mime="audio/mpeg")
    assert e.value.code == "MimeMismatchError"
    # stated-pair validation runs BEFORE any content work: a bad bucket
    # wins over undetectable content
    with _pytest.raises(MediaValidationError) as e2:
        validate_content(b"", type="nonsense", mime="image/jpeg")
    assert e2.value.code == "InvalidBucketError"
    # undetectable content raises the generic error
    with _pytest.raises(MediaValidationError) as e3:
        validate_content(b"\x00\x01\x02")
    assert e3.value.code == "MediaValidationError"


def test_validate_content_stl_override():
    from idb_backend_spark.functions.multimodal import validate_content

    mime, bucket = validate_content(b"solid x", url="http://a/m.stl")
    assert (mime, bucket) == ("model/mesh", "models")


def test_fromobj_merge_crossfill_and_etag():
    import hashlib as _h

    import pytest as _pytest

    from idb_backend_spark.functions.multimodal import (
        MediaValidationError,
        media_object_from_content,
    )

    mo = media_object_from_content(_JPEG, type="images")
    assert mo["bucket"] == "images"          # validate filled it
    assert mo["type"] == "images"
    assert mo["mime"] == "image/jpeg"        # missing mime <- detected
    assert mo["detected_mime"] == "image/jpeg"
    assert mo["etag"] == _h.md5(_JPEG).hexdigest()
    # typeless bucket copies up (db.py:709-710)
    mo2 = media_object_from_content(
        _JPEG, bucket="images", detected_mime="image/jpeg"
    )
    assert mo2["type"] == "images"
    # stated etag mismatch raises with the flattened code
    with _pytest.raises(MediaValidationError) as e:
        media_object_from_content(_JPEG, type="images", etag="0" * 32)
    assert e.value.code == "EtagMismatchError"
