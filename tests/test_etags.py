"""Canonical-hash golden tests (F19). Goldens are literal digests computed
from the documented canonical encoding (SURVEY §1.2 / §7.7): sha1 of the
compact JSON of the sorted flattened [k, v, ...] array."""

import hashlib
import json

from pyspark.sql import functions as F

from idb_backend_spark.functions.etags import (
    TOMBSTONE_ETAG,
    calc_etag,
    etag_expr,
    etag_udf,
    object_hash,
)


def _expected(record):
    flat = []
    for k in sorted(record):
        flat.append(k)
        flat.append(record[k])
    return hashlib.sha1(
        json.dumps(flat, separators=(",", ":"), ensure_ascii=False).encode("utf8")
    ).hexdigest()


def test_tombstone_constant():
    # the documented sentinel: sha1 of the canonical encoding of
    # {"deleted": true} (reference db.py:33)
    assert calc_etag({"deleted": True}) == TOMBSTONE_ETAG


def test_etag_known_values():
    rec = {"dwc:genus": "Acer", "dwc:specificEpithet": "rubrum"}
    assert calc_etag(rec) == _expected(rec)
    # key order must not matter
    assert calc_etag(dict(reversed(list(rec.items())))) == calc_etag(rec)


def test_etag_unicode_not_ascii_escaped():
    rec = {"dwc:locality": "São Paulo — várzea"}
    assert calc_etag(rec) == _expected(rec)


def test_object_hash_shapes():
    # scalar string hashes its raw text
    assert object_hash("abc") == hashlib.sha1(b"abc").hexdigest()
    # numbers hash str(value)
    assert object_hash(7) == hashlib.sha1(b"7").hexdigest()
    # dict: concat of key + digest(value), sorted keys
    inner = hashlib.sha1(b"1").hexdigest()
    expect = hashlib.sha1(("a" + inner).encode()).hexdigest()
    assert object_hash({"a": 1}) == expect
    # list: concat of element digests, optionally sorted
    da, db = object_hash("a"), object_hash("b")
    assert object_hash(["b", "a"]) == hashlib.sha1((db + da).encode()).hexdigest()
    assert object_hash(["b", "a"], sort_arrays=True) == hashlib.sha1(
        ("".join(sorted([da, db]))).encode()
    ).hexdigest()


def test_etag_udf_matches_python(spark):
    rows = [
        ({"dwc:genus": "acer", "dwc:country": "united states"},),
        ({"k": "v", "unicode": "ü"},),
        (None,),
        ({"k": None, "other": "x"},),  # null value serializes, not drops
    ]
    df = spark.createDataFrame(rows, "data map<string,string>")
    got = [r[0] for r in df.select(etag_udf("data")).collect()]
    assert got[0] == calc_etag(rows[0][0])
    assert got[1] == calc_etag(rows[1][0])
    assert got[2] is None
    assert got[3] == calc_etag({"k": None, "other": "x"})
    assert got[3] != calc_etag({"other": "x"})


def test_etag_expr_matches_python(spark):
    df = spark.createDataFrame(
        [("acer", "rubrum"), ("quercus", None), ('with"quote', "tab\there")],
        ["genus", "epithet"],
    )
    got = [
        r[0]
        for r in df.select(
            etag_expr({"dwc:genus": "genus", "dwc:epithet": "epithet"})
        ).collect()
    ]
    assert got[0] == calc_etag({"dwc:genus": "acer", "dwc:epithet": "rubrum"})
    # null field is dropped from the record
    assert got[1] == calc_etag({"dwc:genus": "quercus"})
    assert got[2] == calc_etag(
        {"dwc:genus": 'with"quote', "dwc:epithet": "tab\there"}
    )


def test_etag_expr_control_chars(spark):
    # every char json.dumps escapes must hash identically on the native
    # path: the two-char escapes, \u00xx control chars, and backslash runs
    tricky = [
        ("bell\x07", "esc\x1b"),
        ("back\bspace", "form\ffeed"),
        ("nul\x00mid", "unit\x1fsep"),
        ("back\\slash", '\\"mix\x01'),
    ]
    df = spark.createDataFrame(tricky, ["a", "b"])
    got = [
        r[0]
        for r in df.select(etag_expr({"f:a": "a", "f:b": "b"})).collect()
    ]
    for g, (a, b) in zip(got, tricky):
        assert g == calc_etag({"f:a": a, "f:b": b})
