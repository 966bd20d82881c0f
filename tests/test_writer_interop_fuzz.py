"""Writer→reference-reader interop (r14): random records through the
engine's write_dwca, read back by the REFERENCE's DwcaRecordFile — the
real consumer of the bytes this engine publishes. Value pool covers the
RFC-4180 edges the writer must quote (embedded delimiter, doubled
quotes, bare and CRLF newlines, tabs, unicode, blanks-to-absent).

The harness found the r14 writer bug this module pins: the single-file
part concatenation read Spark's part files in text mode WITHOUT
``newline=''``, so universal-newline translation rewrote a quoted
value's embedded \\r\\n to \\n mid-copy — silently changing record
bytes (and therefore etags) between what was ingested and what a
re-harvest of the export would compute. The reference reader opens with
``newline=''`` (delimited.py:146) and PRESERVES embedded CRLF, as the
csv module does on both sides."""

from __future__ import annotations

import os
import random
import xml.etree.ElementTree as ET
import zipfile

from tests.test_dwca_vs_reference import _wrap_root, ref_dwca  # noqa: F401

import idb_backend_spark.functions.grabbers as G

VALS = ["plain", "with,comma", 'with"quote', 'both",and', "line\nbreak",
        "crlf\r\nend", "tab\there", "Ünïcode✓", "😀 𐐷 🦕", "", " ", "trail  ",
        "  lead", "a" * 200, "'single'", '""', 'end"', " sep",
        # code points newly assigned in Unicode 14 (r15 skew sweep):
        # Vithkuqi, Tangsa digit, Arabic Ext-B, Toto, Cypro-Minoan —
        # bytes the JVM's Unicode-13 tables treat as unassigned must
        # still round-trip verbatim through the writer/reader boundary
        "\U00010570\U00016AC0\U00000870 new14", "\U0001E290\U00012F90"]


def _read_all(rf):
    rows = []
    while True:
        try:
            rows.append(rf.readline())
        except StopIteration:
            return rows


def test_crlf_in_quoted_value_roundtrips(ref_dwca, spark, tmp_path):
    """The minimal pin for the newline-translation bug."""
    RD, xml2d = ref_dwca

    from idb_backend_spark.export.writers import write_dwca

    df = spark.createDataFrame(
        [(1, "crlf\r\nend")], "id int, `dwc:recordedBy` string"
    )
    zp = str(tmp_path / "crlf.zip")
    write_dwca(zp, (df, "id", ["dwc:recordedBy"], "records"))
    with zipfile.ZipFile(zp) as z:
        member = z.read("occurrence.csv")
        z.extractall(tmp_path / "x")
    assert b"crlf\r\nend" in member  # bytes preserved through the copy
    meta_root = ET.parse(os.path.join(tmp_path, "x", "meta.xml")).getroot()
    arch = xml2d(_wrap_root(meta_root))["archive"]
    rf = RD.DwcaRecordFile(
        arch["core"], str(tmp_path / "x" / "occurrence.csv"), logname="t"
    )
    assert _read_all(rf) == [{"id": "1", "dwc:recordedBy": "crlf\r\nend"}]


def test_writer_reference_reader_fuzz(ref_dwca, spark, tmp_path):
    RD, xml2d = ref_dwca

    from idb_backend_spark.export.writers import write_dwca

    from conftest import soak_seeds

    for s_i, seed in enumerate(soak_seeds(0x3017)):
        _fuzz_writer(ref_dwca, spark, tmp_path, random.Random(seed),
                     s_i * 15)


def _fuzz_writer(ref_dwca, spark, tmp_path, rng, base):
    RD, xml2d = ref_dwca

    from idb_backend_spark.export.writers import write_dwca

    strip_class = G._PY_STRIP_CHARS
    for it in range(base, base + 15):
        n = rng.randint(1, 8)
        recs = [(i, rng.choice(VALS), rng.choice(VALS)) for i in range(n)]
        df = spark.createDataFrame(
            recs, "id int, `dwc:recordedBy` string, `dwc:locality` string"
        )
        zp = str(tmp_path / f"w{it}.zip")
        write_dwca(
            zp, (df, "id", ["dwc:recordedBy", "dwc:locality"], "records")
        )
        exdir = str(tmp_path / f"x{it}")
        with zipfile.ZipFile(zp) as z:
            z.extractall(exdir)
        arch = xml2d(_wrap_root(
            ET.parse(os.path.join(exdir, "meta.xml")).getroot()
        ))["archive"]
        loc = arch["core"]["files"]["location"]
        rf = RD.DwcaRecordFile(
            arch["core"], os.path.join(exdir, loc), logname="t"
        )
        got = {r.get("id"): dict(r) for r in _read_all(rf)}
        expect = {}
        for i, rb, lv in recs:
            r = {"id": str(i)}
            if rb and rb.strip(strip_class):
                r["dwc:recordedBy"] = rb.strip(strip_class)
            if lv and lv.strip(strip_class):
                r["dwc:locality"] = lv.strip(strip_class)
            expect[str(i)] = r
        assert got == expect, (it, got, expect)
