"""The reference's canonical end-to-end acceptance path (SURVEY §3.1,
tests/idigbio_workers/lib/test_download.py:12-50):

DwC-A ingest -> versioned store -> enrichment -> shim query
(genus=acer AND stateprovince=florida) -> DwC-A export with citation
counts — plus the params-hash job dedup around it.
"""

from __future__ import annotations

import datetime
import zipfile

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.export import writers
from idb_backend_spark.export.jobs import DownloadJobManager
from idb_backend_spark.functions.grabbers import getfield
from idb_backend_spark.operators import store as st
from idb_backend_spark.query.shim import compile_shim
from idb_backend_spark.sources.dwca import DwcaArchive

META = b"""<?xml version="1.0"?>
<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core fieldsTerminatedBy="," ignoreHeaderLines="1"
        rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
    <files><location>occurrence.csv</location></files>
    <id index="0"/>
    <field index="1" term="http://rs.tdwg.org/dwc/terms/genus"/>
    <field index="2" term="http://rs.tdwg.org/dwc/terms/stateProvince"/>
    <field index="3" term="http://portal.idigbio.org/terms/recordset"/>
  </core>
</archive>
"""

ROWS = """id,genus,state,rs
r1,Acer,Florida,rs1
r2,Acer,Florida,rs1
r3,Acer,Georgia,rs1
r4,Quercus,Florida,rs2
r5,ACER,florida,rs2
r6,Betula,Vermont,rs2
"""


@pytest.fixture()
def archive(tmp_path):
    p = tmp_path / "harvest.zip"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("meta.xml", META)
        z.writestr("occurrence.csv", ROWS)
    return str(p)


def test_flagship_end_to_end(spark, tmp_path, archive):
    # 1. ingest the DwC-A into the versioned store
    arch = DwcaArchive(archive, workdir=str(tmp_path / "x"))
    core = arch.read_core(spark)
    batch = core.select(
        F.col("id").alias("uuid"),
        F.lit("records").alias("type"),
        F.col("idigbio:recordset").alias("parent"),
        F.sha1(
            F.concat_ws("\x1f", "id", "dwc:genus", "dwc:stateProvince")
        ).alias("etag"),
        F.to_json(F.struct("dwc:genus", "dwc:stateProvince")).alias("data"),
        # typed columns ride along for the analytical table
        getfield("dwc:genus").alias("genus"),
        getfield("dwc:stateProvince").alias("stateprovince"),
        F.col("idigbio:recordset").alias("recordset"),
    )
    empty_hist = spark.createDataFrame(
        [], "uuid string, type string, parent string, etag string, "
            "version int, modified timestamp, data string",
    )
    res = st.apply_harvest_batch(
        empty_hist, batch.select("uuid", "type", "parent", "etag", "data"),
        modified=F.lit(datetime.datetime(2024, 1, 1)),
    )
    assert res.appended.count() == 6
    assert {r["status"]: r["n"] for r in res.summary.collect()} == {"create": 6}

    # 2. typed analytical table (write-time case folding, X12)
    typed = batch.select("uuid", "genus", "stateprovince", "recordset")

    # 3. the canonical query through the shim compiler
    rq = {"genus": "acer", "stateprovince": "florida"}
    hits = typed.filter(compile_shim(rq, assume_lowercased=True))
    got = {r["uuid"] for r in hits.collect()}
    assert got == {"r1", "r2", "r5"}  # case-insensitive both sides

    # 4. citation counts + DwC-A export
    counts = writers.recordset_counts(hits, "recordset")
    assert counts == [("rs1", 2), ("rs2", 1)]
    out_zip = str(tmp_path / "export.zip")
    writers.write_dwca(
        out_zip,
        core=(hits, "uuid", ["genus", "stateprovince"], "records"),
        citations=writers.citation_text(counts, str(rq), 3),
        workdir=str(tmp_path / "w"),
    )
    with zipfile.ZipFile(out_zip) as z:
        assert {"meta.xml", "occurrence.csv", "citations.txt"} <= set(z.namelist())
        occ = z.read("occurrence.csv").decode()
        cit = z.read("citations.txt").decode()
    assert occ.count("\n") == 4  # header + 3 hits
    # reference citation format (download.py:37-79)
    assert "https://www.idigbio.org/portal/recordsets/rs1 (2 records)" in cit
    assert "3 records, accessed on " in cit
    assert "contributed by 2 Recordsets" in cit
    arch.close()


def test_empty_result_export(spark, tmp_path, archive):
    # the reference's empty-result path: archive still assembles
    arch = DwcaArchive(archive, workdir=str(tmp_path / "x2"))
    typed = arch.read_core(spark).select(
        F.col("id").alias("uuid"),
        getfield("dwc:genus").alias("genus"),
        F.col("idigbio:recordset").alias("recordset"),
    )
    hits = typed.filter(compile_shim({"genus": "nonexistent"}))
    out_zip = str(tmp_path / "empty.zip")
    writers.write_dwca(
        out_zip,
        core=(hits, "uuid", ["genus"], "records"),
        citations=writers.citation_text([], "genus=nonexistent", 0),
        workdir=str(tmp_path / "w2"),
    )
    with zipfile.ZipFile(out_zip) as z:
        occ = z.read("occurrence.csv").decode()
        # zero records -> citation_text is None -> NO citation member
        # (the reference writes no citation file then, download.py:58)
        assert "citations.txt" not in set(z.namelist())
    assert occ.strip().splitlines() == ["uuid,genus"]
    arch.close()


def test_job_dedup():
    clock = [1000.0]
    calls = []
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])

    def run(params):
        calls.append(params)
        return f"artifact-{len(calls)}"

    params = {"rq": {"genus": "acer", "stateprovince": "florida"},
              "form": "dwca-csv"}
    j1 = mgr.submit(params, run)
    # key order must not matter (objectHasher sorted keys)
    j2 = mgr.submit(
        {"form": "dwca-csv",
         "rq": {"stateprovince": "florida", "genus": "acer"}}, run
    )
    assert j1.job_id == j2.job_id and len(calls) == 1
    assert j2.result == "artifact-1"
    clock[0] += 200  # outside the dedup window -> rerun
    j3 = mgr.submit(params, run)
    assert j3.result == "artifact-2" and len(calls) == 2
    different = mgr.submit({"rq": {"genus": "quercus"}}, run)
    assert different.job_id != j1.job_id


def test_job_vacuum_ttl_and_retry():
    """30-day task TTL (v2_download.py:20-23): expired jobs drop with
    their artifacts; a failing cleanup callback keeps the job for the
    next vacuum pass."""
    clock = [0.0]
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])
    j1 = mgr.submit({"q": 1}, lambda p: "artifact-1")
    clock[0] = 50.0
    j2 = mgr.submit({"q": 2}, lambda p: "artifact-2")
    assert len(mgr.jobs) == 2

    # nothing old enough yet
    clock[0] = 100.0
    assert mgr.vacuum(ttl_seconds=200) == []

    cleaned = []
    clock[0] = 220.0  # j1 age 220 >= 200; j2 age 170 < 200
    removed = mgr.vacuum(ttl_seconds=200, on_expire=lambda j: cleaned.append(j.result))
    assert removed == [j1.job_id] and cleaned == ["artifact-1"]
    assert mgr.status(j1.job_id) is None and mgr.status(j2.job_id) is j2

    # failing cleanup keeps the job registered for retry
    clock[0] = 400.0
    def boom(job):
        raise IOError("object store unavailable")
    assert mgr.vacuum(ttl_seconds=200, on_expire=boom) == []
    assert mgr.status(j2.job_id) is j2
    assert mgr.vacuum(ttl_seconds=200) == [j2.job_id]


def test_job_replaced_past_dedup_window_still_vacuumed():
    """Re-submitting the same params after the dedup window replaces the
    job — the OLD job's artifact must still reach on_expire via vacuum,
    not leak because it fell out of the registry."""
    clock = [0.0]
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])
    mgr.submit({"q": 1}, lambda p: "artifact_v1")
    clock[0] = 200.0  # past the window: same params -> NEW job
    j2 = mgr.submit({"q": 1}, lambda p: "artifact_v2")
    assert j2.result == "artifact_v2"
    cleaned = []
    mgr.vacuum(ttl_seconds=10**9, on_expire=lambda j: cleaned.append(j.result))
    assert "artifact_v1" in cleaned  # the displaced job was not orphaned


def test_uniquevals_namespaces_are_distinct(spark):
    """Two logically distinct uniquevals exports must not collide on the
    surrogate id for equal values (reference identification.py derives a
    namespace per type)."""
    from idb_backend_spark.export.writers import uniquevals_frame

    df = spark.createDataFrame([("acer",)], "v string")
    id_names = uniquevals_frame(df, "v", namespace="uniquenames").first()["id"]
    id_loc = uniquevals_frame(df, "v", namespace="uniquelocality").first()["id"]
    assert id_names != id_loc
    # and the names namespace matches the reference's asserted constant
    import uuid

    gn = uuid.uuid5(uuid.NAMESPACE_DNS, "globalnames.org")
    assert str(gn) == "90181196-fecf-5082-a4c1-411d4f314cda"
    assert id_names == str(uuid.uuid5(gn, "acer"))


def test_job_vacuum_reports_each_gone_id_once():
    """An expired live job and its parked displaced predecessor share
    the params-hash id — the vacuum return must list it ONCE, and only
    when no live job with that id remains (callers treat the list as
    'these ids are gone')."""
    clock = [0.0]
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])
    j1 = mgr.submit({"q": 1}, lambda p: "v1")
    clock[0] = 200.0  # past dedup window: same params -> replacement
    j2 = mgr.submit({"q": 1}, lambda p: "v2")
    assert j1.job_id == j2.job_id

    # replacement still live: displaced cleanup runs, id NOT reported
    cleaned = []
    removed = mgr.vacuum(ttl_seconds=10**9,
                         on_expire=lambda j: cleaned.append(j.result))
    assert cleaned == ["v1"] and removed == []

    # resubmit/displace again, then expire the live job in the same pass:
    # both cleanups run, the id appears exactly once
    clock[0] = 400.0
    mgr.submit({"q": 1}, lambda p: "v3")
    clock[0] = 10**9
    cleaned = []
    removed = mgr.vacuum(ttl_seconds=100,
                         on_expire=lambda j: cleaned.append(j.result))
    assert sorted(cleaned) == ["v2", "v3"]
    assert removed == [j1.job_id]


def test_failed_displaced_job_is_not_parked_for_cleanup():
    """A failed job produced no artifact; displacing it must not queue
    it for on_expire (which would crash or loop artifact cleanup)."""
    clock = [0.0]
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])

    def boom(params):
        raise IOError("export blew up")

    j1 = mgr.submit({"q": 1}, boom)
    assert j1.status == "failed"
    # failed -> no reuse even inside the window; the retry replaces it
    j2 = mgr.submit({"q": 1}, lambda p: "v2")
    assert j2.status == "done"
    cleaned = []
    mgr.vacuum(ttl_seconds=10**9,
               on_expire=lambda j: cleaned.append(j.result))
    assert cleaned == []  # the failed job never reached on_expire


def test_job_vacuum_report_once_across_passes():
    """Report-once holds ACROSS vacuums: when the pass that expires the
    live job cannot yet clean its parked predecessor (callback failure),
    the retry pass must not re-report the id — but a fresh re-submit of
    the same params revives the id for future reporting."""
    clock = [0.0]
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])
    j1 = mgr.submit({"q": 1}, lambda p: "v1")
    clock[0] = 200.0
    mgr.submit({"q": 1}, lambda p: "v2")  # displaces j1 (parked)

    calls = {"n": 0}

    def flaky(job):
        # fail only the parked predecessor's first cleanup
        if job.result == "v1" and calls["n"] == 0:
            calls["n"] += 1
            raise IOError("transient")

    clock[0] = 10**9  # expire the live job
    removed1 = mgr.vacuum(ttl_seconds=100, on_expire=flaky)
    assert removed1 == [j1.job_id]  # live expiry reported
    # retry pass: parked cleanup succeeds; id must NOT be re-reported
    assert mgr.vacuum(ttl_seconds=100, on_expire=flaky) == []

    # a NEW submit of the same params revives the id...
    clock[0] = 10**9 + 1
    j3 = mgr.submit({"q": 1}, lambda p: "v3")
    assert j3.job_id == j1.job_id
    clock[0] = 2 * 10**9  # ...and its expiry is reported again
    assert mgr.vacuum(ttl_seconds=100) == [j1.job_id]


def test_finish_link_and_reference_py3_crash():
    """The reference's link-finishing line is the py2 string-module
    call `string.replace(link, "http:", "https:")`
    (tasks/download.py:97,129) — on python3 the module function is
    gone, so the downloader task crashes AFTER uploading. Pin the fact
    and the engine's intent implementation."""
    import string

    import pytest as _pytest

    from idb_backend_spark.export.jobs import finish_link

    with _pytest.raises(AttributeError):
        string.replace("http://x/y.zip", "http:", "https:")  # noqa

    assert finish_link("http://s.idigbio.org/d/x.zip") == (
        "https://s.idigbio.org/d/x.zip"
    )
    assert finish_link("https://already.fine/x.zip") == (
        "https://already.fine/x.zip"
    )
    # leading-scheme only: an embedded 'http:' token is data, not scheme
    assert finish_link("https://h/x?src=http://other") == (
        "https://h/x?src=http://other"
    )


def test_normalize_request_reference_quirks():
    """v2_download.py:29-66: query aliases rq only when rq absent;
    list params take the first element; strings json-parse when they
    can and stay raw strings when they cannot."""
    from idb_backend_spark.export.jobs import normalize_request

    p = normalize_request({"query": '{"genus": "acer"}'})
    assert p["rq"] == {"genus": "acer"}
    # rq present: query ignored
    p = normalize_request({"rq": '{"genus": "quercus"}', "query": "{}"})
    assert p["rq"] == {"genus": "quercus"}
    # repeated query-string key -> first element; unparseable -> raw
    p = normalize_request({"rq": ["acer", "betula"], "form": "csv"})
    assert p["rq"] == "acer" and p["form"] == "csv"
    # unknown keys ignored; defaults intact
    p = normalize_request({"bogus": "1"})
    assert p["core_type"] == "records" and p["rq"] is None


def test_submit_force_bypasses_dedup():
    """v2_download.py:75,81 — force dispatches a fresh run even inside
    the dedup window."""
    from idb_backend_spark.export.jobs import DownloadJobManager

    clock = [0.0]
    runs = []
    mgr = DownloadJobManager(dedup_seconds=100, clock=lambda: clock[0])

    def run(params):
        runs.append(dict(params))
        return f"artifact_{len(runs)}"

    j1 = mgr.submit({"rq": {"genus": "acer"}}, run)
    j2 = mgr.submit({"rq": {"genus": "acer"}}, run)
    assert j2 is j1 and len(runs) == 1  # dedup reuse
    j3 = mgr.submit({"rq": {"genus": "acer"}}, run, force=True)
    assert j3 is not j1 and len(runs) == 2
    assert j3.result == "artifact_2"


def test_download_status_payload_shape():
    """v2_download.py:109-148 — terminal states are complete, expires
    only with a TTL, url on success / error on failure."""
    from idb_backend_spark.export.jobs import Job, status_payload

    done = Job(job_id="a", params={"genus": "acer"}, status="done",
               result="https://x/y.zip")
    p = status_payload(done, ttl_seconds=3600, now=0)
    assert p["complete"] is True and p["download_url"] == "https://x/y.zip"
    assert p["expires"].startswith("1970-01-01T01:00:00")
    assert "error" not in p

    failed = Job(job_id="b", params={}, status="failed", error="boom")
    p2 = status_payload(failed)
    assert p2["complete"] is True and p2["error"] == "boom"
    assert "expires" not in p2 and "download_url" not in p2

    running = Job(job_id="c", params={}, status="running")
    p3 = status_payload(running)
    assert p3["complete"] is False
