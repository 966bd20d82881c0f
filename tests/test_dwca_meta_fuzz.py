"""Seeded random-meta fuzz of the DwC-A reader against the reference's
DwcaRecordFile (r14 — the harness that found the declared-index-crash
and duplicate-id-default bugs, kept as a combination-shape regression
net). Shapes drawn: duplicate term declarations in and out of numeric
order, duplicate indexes (first declaration wins), an 'id'-term field,
defaults with and without an index, blank/padded/unicode values.

Comparison is multiset row-dict equality after stripping the two
DOCUMENTED divergence families: the engine applies declared defaults
(the reference never does), and malformed-width rows are kept (bare-CR
values are excluded from the pool — that class is pinned separately in
test_dwca_vs_reference / test_sources_export)."""

from __future__ import annotations

import os
import random
import re
import xml.etree.ElementTree as ET
import zipfile

from tests.test_dwca_vs_reference import _wrap_root, ref_dwca  # noqa: F401

TERMS = [
    "http://rs.tdwg.org/dwc/terms/genus",
    "http://rs.tdwg.org/dwc/terms/country",
    "http://rs.tdwg.org/dwc/terms/catalogNumber",
    "http://rs.tdwg.org/dwc/terms/locality",
    "id",
]
VALS = ["", " ", "x", " padded ", "Ünïcode", "12.5", "\tv", "0", "-"]


def _random_archive(rng, tmpdir, it):
    width = rng.randint(2, 6)
    nfields = rng.randint(1, 5)
    idxs = list(range(1, width))
    rng.shuffle(idxs)
    fields = []
    for j in range(nfields):
        term = rng.choice(TERMS)
        idx = rng.choice(idxs)
        f = f'<field index="{idx}" term="{term}"'
        if rng.random() < 0.2:
            f += f' default="def{j}"'
        fields.append(f + "/>")
    if rng.random() < 0.15:
        fields.append(
            f'<field term="{rng.choice(TERMS)}" default="only{it}"/>'
        )
    # sometimes interleave <id> BETWEEN field declarations: xml2d's
    # sibling-merge then SCRAMBLES the field order (a singleton first
    # run lands after a later multi-element run, xmlDictTools.py:37-39
    # — mirrored by sources.dwca._xml2d_field_order), which flips the
    # duplicate-index winner on exactly these metas
    id_pos = rng.randrange(0, len(fields) + 1) if rng.random() < 0.4 else 0
    decls = fields[:id_pos] + ['<id index="0"/>'] + fields[id_pos:]
    meta = (
        '<archive xmlns="http://rs.tdwg.org/dwc/text/">'
        '<core rowType="http://rs.tdwg.org/dwc/terms/Occurrence"'
        ' fieldsTerminatedBy="," linesTerminatedBy="\\n"'
        ' fieldsEnclosedBy="" encoding="UTF-8" ignoreHeaderLines="0">'
        "<files><location>occurrence.csv</location></files>"
        + "".join(decls) + "</core></archive>"
    )
    lines = []
    for i in range(rng.randint(1, 4)):
        row = [f"r{i}"] + [
            rng.choice(VALS).replace(",", "") for _ in range(width - 1)
        ]
        lines.append(",".join(row))
    zp = os.path.join(tmpdir, f"a{it}.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("meta.xml", meta)
        z.writestr("occurrence.csv", "\n".join(lines) + "\n")
    return zp, meta


def _strip_defaults(rows, meta):
    decl = dict(re.findall(
        r'term="(?:[^"]*/)?([^"/]+)" default="([^"]*)"', meta))
    decl = {("dwc:" + k if not k.startswith("id") else k): v
            for k, v in decl.items()}
    out = []
    for d in rows:
        d = dict(d)
        for k, v in list(d.items()):
            if decl.get(k) == v:
                d.pop(k)
        out.append(d)
    return out


def _canon(rows):
    return sorted(sorted(d.items()) for d in rows)


def test_random_meta_fuzz_vs_reference(ref_dwca, spark, tmp_path):
    RD, xml2d = ref_dwca

    from idb_backend_spark.sources.dwca import DwcaArchive

    from conftest import soak_seeds

    for s_i, seed in enumerate(soak_seeds(0xD3CA)):
        rng = random.Random(seed)
        _fuzz_archives(RD, xml2d, spark, tmp_path, rng, s_i * 25)


def _fuzz_archives(RD, xml2d, spark, tmp_path, rng, base):
    from idb_backend_spark.sources.dwca import DwcaArchive

    for it in range(base, base + 25):
        zp, meta = _random_archive(rng, str(tmp_path), it)
        exdir = str(tmp_path / f"x{it}")
        with zipfile.ZipFile(zp) as z:
            z.extractall(exdir)
        meta_root = ET.parse(os.path.join(exdir, "meta.xml")).getroot()
        arch = xml2d(_wrap_root(meta_root))["archive"]
        rf = RD.DwcaRecordFile(
            arch["core"], os.path.join(exdir, "occurrence.csv"),
            logname="t",
        )
        ref_rows = []
        while True:
            try:
                ref_rows.append(rf.readline())
            except StopIteration:
                break

        a = DwcaArchive(zp)
        eng_rows = [
            {k: v for k, v in r.asDict().items() if v is not None}
            for r in a.read_core(spark).collect()
        ]
        a.close()
        assert _canon(_strip_defaults(ref_rows, meta)) == _canon(
            _strip_defaults(eng_rows, meta)
        ), (it, meta, ref_rows, eng_rows)
