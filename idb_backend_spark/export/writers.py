"""S9/S10/S11 — export writers: CSV/TSV members, DwC-A archives with
generated meta.xml, and citation files
(reference idigbio_workers/lib/download.py:43-79, 201-225, 457-474;
meta_xml.py:34-74).

Scale design: each member is written by a distributed ``df.write.csv``
(one task per partition, no driver materialization); the driver then
streams the part files into the final single-file artifact/zip — the
only driver-side work is sequential IO, never row processing. Citation
counts ride on a tiny aggregated DataFrame (A1).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import xml.etree.ElementTree as ET
import zipfile
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idb_backend_spark.sources.fieldnames import curie_to_uri

ROW_TYPES = {
    "records": "http://rs.tdwg.org/dwc/terms/Occurrence",
    "mediarecords": "http://rs.tdwg.org/ac/terms/multimedia",
    "uniquelocality": "http://rs.tdwg.org/dwc/terms/Location",
    "uniquenames": "http://rs.tdwg.org/dwc/terms/Taxon",
}


def _stringify(df: DataFrame, id_col: str, fields: list[str]) -> DataFrame:
    """S9 row shaping (download.py:201-225): id column first, non-string
    values JSON-encoded, one output column per requested field."""
    cols = [F.col(id_col).cast("string").alias(id_col)]
    for f_name in fields:
        dt = df.schema[f_name].dataType.simpleString()
        c = F.col(f"`{f_name}`")
        if dt.startswith(("array", "map", "struct")):
            cols.append(F.to_json(c).alias(f_name))
        elif dt == "string":
            cols.append(c.alias(f_name))
        else:
            cols.append(c.cast("string").alias(f_name))
    return df.select(*cols)


def write_csv_member(
    df: DataFrame,
    out_path: str,
    id_col: str,
    fields: list[str],
    tsv: bool = False,
    header_names: dict[str, str] | None = None,
    record_type: str | None = None,
) -> str:
    """Write one CSV/TSV member as a single file at ``out_path``.

    The data is written distributed to a part directory, then the driver
    concatenates parts under a single header row (long names when
    ``header_names`` maps them — download.py:302-310). Passing
    ``record_type`` instead reads the long names from the §1.4 typed-schema
    table (data.typed_schema.longnames — the reference's
    index_field_to_longname, conversions.py:205-215).
    """
    if header_names is None and record_type is not None:
        from idb_backend_spark.data.typed_schema import longnames

        header_names = longnames(record_type)
    shaped = _stringify(df, id_col, fields)
    tmp = out_path + ".parts"
    sep = "\t" if tsv else ","
    (
        shaped.write.mode("overwrite")
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("header", "false")
        .option("emptyValue", "")
        .csv(tmp)
    )
    names = [header_names.get(c, c) if header_names else c for c in shaped.columns]
    with open(out_path, "w", encoding="utf-8", newline="") as out:
        import csv as _csv

        # lineterminator must match the Spark-written data rows (\n):
        # the csv module's \r\n default gave the member a mixed-ending
        # header, and multiLine readers auto-detect the separator from
        # the FIRST line — \r\n there made them unable to split the
        # \n-separated data rows
        w = _csv.writer(
            out, delimiter=sep, quoting=_csv.QUOTE_MINIMAL,
            lineterminator="\n",
        )
        w.writerow(names)
        for part in sorted(glob.glob(os.path.join(tmp, "part-*"))):
            with open(part, "r", encoding="utf-8") as pf:
                shutil.copyfileobj(pf, out)
    shutil.rmtree(tmp, ignore_errors=True)
    return out_path


def make_meta_xml(members: list[dict]) -> bytes:
    """Generate meta.xml for a DwC-A (meta_xml.py:34-74): one block per
    member with ``{filename, fields, core, tsv, type}``; field terms are
    CURIEs resolved back to namespace URIs."""
    archive = ET.Element("archive", xmlns="http://rs.tdwg.org/dwc/text/")
    for m in members:
        tag = "core" if m.get("core", False) else "extension"
        el = ET.SubElement(
            archive,
            tag,
            attrib={
                "encoding": "utf-8",
                "fieldsTerminatedBy": "\\t" if m.get("tsv") else ",",
                "linesTerminatedBy": "\\n",
                "fieldsEnclosedBy": '"',
                "ignoreHeaderLines": "1",
                "rowType": ROW_TYPES.get(m.get("type", "records"),
                                         ROW_TYPES["records"]),
            },
        )
        files = ET.SubElement(el, "files")
        ET.SubElement(files, "location").text = m["filename"]
        id_tag = "id" if m.get("core", False) else "coreid"
        ET.SubElement(el, id_tag, attrib={"index": "0"})
        for i, term in enumerate(m["fields"]):
            ET.SubElement(
                el,
                "field",
                attrib={"index": str(i + 1), "term": curie_to_uri(term)},
            )
    return ET.tostring(archive, xml_declaration=True, encoding="utf-8")


def citation_text(
    counts: list[tuple[str, int]], query_echo: str, total: int,
    access_date: date | None = None,
) -> str:
    """S11 — citation file body (download.py:43-79): per-recordset record
    counts sorted desc, with the query echo and access date (UTC — a
    host-local date.today() would make byte-identical inputs produce
    different citations.txt across timezones)."""
    if access_date is None:
        from datetime import datetime, timezone

        access_date = datetime.now(timezone.utc).date()
    lines = [
        f"Query: {query_echo}",
        f"Total records: {total}",
        f"Accessed: {access_date.isoformat()}",
        "",
        "Recordset counts:",
    ]
    for rs, n in counts:
        lines.append(f"  {rs}: {n}")
    return "\n".join(lines) + "\n"


def recordset_counts(df: DataFrame, recordset_col: str) -> list[tuple[str, int]]:
    """A1 collect — per-recordset counts desc (terms agg, download.py:101-124).
    The agg output is tiny (bounded by recordset cardinality) — safe to
    collect."""
    rows = (
        df.groupBy(recordset_col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.col(recordset_col))
        .collect()
    )
    return [(str(r[recordset_col]), r["count"]) for r in rows]


def write_dwca(
    out_zip: str,
    core: tuple[DataFrame, str, list[str], str],
    extensions: list[tuple[DataFrame, str, list[str], str]] | None = None,
    citations: str | None = None,
    tsv: bool = False,
    workdir: str | None = None,
) -> str:
    """S10 — assemble a DwC-A zip (download.py:457-474).

    ``core``/``extensions``: (df, id_col, fields, record_type). Members are
    written distributed, then zipped with the generated meta.xml and the
    optional citation file.
    """
    workdir = workdir or out_zip + ".work"
    os.makedirs(workdir, exist_ok=True)
    ext = "tsv" if tsv else "csv"
    member_meta = []
    paths = []
    names = {"records": "occurrence", "mediarecords": "multimedia",
             "uniquelocality": "locality", "uniquenames": "names"}

    all_members = [(True, core)] + [(False, e) for e in (extensions or [])]
    used: set[str] = set()
    for is_core, (df, id_col, fields, rtype) in all_members:
        base = names.get(rtype, rtype)
        fname = f"{base}.{ext}"
        # two members of the same record type must not share a filename:
        # the second write would silently overwrite the first and
        # meta.xml would point both blocks at one file
        k = 2
        while fname in used:
            fname = f"{base}_{k}.{ext}"
            k += 1
        used.add(fname)
        path = os.path.join(workdir, fname)
        write_csv_member(df, path, id_col, fields, tsv=tsv)
        member_meta.append(
            {"filename": fname, "fields": fields, "core": is_core,
             "tsv": tsv, "type": rtype}
        )
        paths.append(path)

    meta = make_meta_xml(member_meta)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.xml", meta)
        for p in paths:
            z.write(p, os.path.basename(p))
        if citations is not None:
            z.writestr("citations.txt", citations)
    shutil.rmtree(workdir, ignore_errors=True)
    return out_zip


def uniquevals_frame(
    df: DataFrame, value_col: str, namespace: str = "idigbio"
) -> DataFrame:
    """A3+A4 — uniquevals export rows: (surrogate id, value, count) desc
    (download.py:166-198 + identification.py:6-21).

    ``namespace`` selects the uuid5 namespace, exactly as the reference
    derives one per uniquevals type ('uniquenames' hashes under the
    globalnames.org DNS namespace, 'uniquelocality' under the idigbio
    identifiers URL namespace) — two logically distinct exports must not
    collide on id for equal values."""
    import uuid as _uuid

    from idb_backend_spark.functions.enrichment import (
        IDIGBIO_NAMESPACE,
        uuid5_expr,
    )

    root = "http://identifiers.idigbio.org/"
    known = {
        # identification.py:6-11 — asserted constants in the reference
        "uniquelocality": _uuid.uuid5(_uuid.NAMESPACE_URL, root + "locality"),
        "uniquenames": _uuid.uuid5(_uuid.NAMESPACE_DNS, "globalnames.org"),
        "idigbio": IDIGBIO_NAMESPACE,
    }
    ns = known.get(
        namespace, _uuid.uuid5(_uuid.NAMESPACE_URL, root + namespace)
    )
    vals = (
        df.select(
            F.coalesce(F.col(value_col).cast("string"), F.lit("")).alias("value")
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return vals.select(
        uuid5_expr(F.col("value"), ns).alias("id"), "value", "count"
    ).orderBy(F.desc("count"), "value")
