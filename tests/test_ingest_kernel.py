"""Engine-internal pins for operators/ingest (the cogrouped ingest
row-loop kernel) beyond the reference differential:

1. the kernel and the RELATIONAL scale path (operators/store.
   apply_harvest_batch — the documented giant-recordset fallback) agree
   on clean data: same create/update counters and the same tombstone
   set. The fallback claim in operators/ingest.py's docstring is a
   contract, not prose.
2. created-entity uuids are deterministic across re-runs (the uuid5
   divergence note): re-ingesting the same archive yields the same
   uuids — the idempotency property the divergence buys.
3. multi-recordset isolation: groups do not leak state (a duplicate
   etag in rs A must not trip rs B's seen set).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.functions.etags import calc_etag
from idb_backend_spark.operators.ingest import (
    LOOKUP_SCHEMA,
    ROW_SCHEMA,
    ingest_subfiles,
    subfile_summary,
)


def _mk_rows(spark, rsid, recs, fname="occurrence.txt",
             rowtype="dwc:Occurrence"):
    data = [
        (rsid, 0, fname, rowtype, i, list(r.items()))
        for i, r in enumerate(recs)
    ]
    return spark.createDataFrame(data, ROW_SCHEMA)


def _mk_lookup(spark, rsid, children):
    """children: list of (ident, uuid, etag)."""
    rows = [
        (rsid, "rs", "records", ident, u, etag, rsid, False)
        for ident, u, etag in children
    ]
    return spark.createDataFrame(rows, LOOKUP_SCHEMA)


@pytest.fixture(scope="module")
def clean_batch(spark):
    """60 rows / 40 seeded children: 15 match (byte-identical content),
    15 update, 30 create, 10 absentees -> deletes. No dups, no
    extensions, no ASR — the regime where the relational path is
    exact."""
    rsid = "rs-clean"
    recs, children = [], []
    for i in range(40):
        d = {"dwc:occurrenceID": f"occ-{i}", "dwc:recordedBy": f"p-{i}"}
        children.append((f"{rsid}\\occ-{i}", f"ex-{i:03d}", calc_etag(d)))
    for i in range(15):  # matches
        recs.append(
            {"dwc:occurrenceID": f"occ-{i}", "dwc:recordedBy": f"p-{i}"}
        )
    for i in range(15, 30):  # updates
        recs.append(
            {"dwc:occurrenceID": f"occ-{i}", "dwc:recordedBy": f"rev-{i}"}
        )
    for i in range(30):  # creates
        recs.append(
            {"dwc:occurrenceID": f"new-{i}", "dwc:recordedBy": f"n-{i}"}
        )
    return rsid, recs, children


def test_kernel_agrees_with_relational_path(spark, clean_batch):
    from idb_backend_spark.operators import store as st

    rsid, recs, children = clean_batch
    out = ingest_subfiles(
        _mk_rows(spark, rsid, recs), _mk_lookup(spark, rsid, children)
    )
    ksum = subfile_summary(out).collect()[0].asDict()

    # the relational twin: seeded history + the batch's (uuid, etag)
    # resolved the same way the kernel resolves them (existing ident ->
    # its uuid; else the row's own deterministic identity)
    krows = {r["seq"]: r for r in out.collect() if r["outcome"] != "delete"}
    history = spark.createDataFrame(
        [
            (u, "records", rsid, etag, 0, None)
            for _, u, etag in children
        ],
        "uuid string, type string, parent string, etag string, "
        "version int, modified timestamp",
    )
    batch = spark.createDataFrame(
        [
            (krows[i]["uuid"], "records", rsid, krows[i]["etag"], "d")
            for i in range(len(recs))
        ],
        "uuid string, type string, parent string, etag string, data string",
    )
    res = st.apply_harvest_batch(
        history, batch, modified=F.to_timestamp(F.lit("2024-02-01"))
    )
    rsum = {r["status"]: r["n"] for r in res.summary.collect()}

    # apply_harvest_batch's 'update' = CHANGED rows only (matched rows
    # don't re-version) — identical to the loop's found-minus-match
    assert rsum.get("create", 0) == ksum["create"] == 30
    assert rsum.get("update", 0) == ksum["update"] == 15
    assert rsum.get("delete", 0) == ksum["delete"] == 10
    tomb = sorted(r["uuid"] for r in res.tombstones.collect())
    kdel = sorted(
        r["uuid"] for r in out.collect() if r["outcome"] == "delete"
    )
    assert tomb == kdel


def test_created_uuids_deterministic(spark, clean_batch):
    rsid, recs, children = clean_batch
    runs = []
    for _ in range(2):
        out = ingest_subfiles(
            _mk_rows(spark, rsid, recs), _mk_lookup(spark, rsid, children)
        ).collect()
        runs.append(
            sorted(
                (r["seq"], r["uuid"])
                for r in out
                if r["outcome"] == "create"
            )
        )
    assert runs[0] == runs[1]
    assert len(runs[0]) == 30


def test_recordset_isolation(spark):
    """A duplicate etag inside rs-a must not mark the identical content
    in rs-b as a duplicate — group state is per recordset."""
    d = {"dwc:occurrenceID": "x", "dwc:recordedBy": "same"}
    rows = []
    for rsid in ("rs-a", "rs-b"):
        rows.append((rsid, 0, "f.txt", "dwc:Occurrence", 0,
                     list(d.items())))
    # rs-a gets the dup; rs-b does not
    rows.append(("rs-a", 0, "f.txt", "dwc:Occurrence", 1, list(d.items())))
    rows_df = spark.createDataFrame(rows, ROW_SCHEMA)
    lookup = spark.createDataFrame([], LOOKUP_SCHEMA)
    out = ingest_subfiles(rows_df, lookup).collect()
    by = {(r["rsid"], r["seq"]): r["outcome"] for r in out}
    assert by[("rs-a", 0)] == "create"
    assert by[("rs-a", 1)] == "dup_etag"
    assert by[("rs-b", 0)] == "create"


def _outcome_key(r):
    return (
        r["rsid"], r["fname"],
        -1 if r["seq"] is None else r["seq"],  # delete rows sort first
        r["outcome"], r["uuid"] or "", r["etag"] or "",
        tuple(r["ids"] or []), r["found"], r["matched"],
        r["to_undelete"], r["ingested"],
    )


def test_relational_path_agrees_with_kernel(spark, clean_batch):
    """On the clean subset the giant-recordset relational path must
    reproduce the kernel's outcome rows EXACTLY — including created
    uuids (both mint uuid5 over rsid + first claimed identifier), the
    failure classes (dup_etag / no_recordid / dup_id), and the absence
    deletes."""
    from idb_backend_spark.operators.ingest import (
        ingest_outcomes_relational,
    )

    rsid, recs, children = clean_batch
    recs = list(recs) + [
        dict(recs[0]),                                # dup_etag
        {"dwc:recordedBy": "anon"},                   # no_recordid
        {"dwc:occurrenceID": "occ-3",
         "dwc:recordedBy": "x"},                      # dup_id (occ-3 claimed)
        {"id": "bare-1", "dwc:recordedBy": "b"},      # promotion
    ]
    rows = _mk_rows(spark, rsid, recs)
    lk = _mk_lookup(spark, rsid, children)
    kernel = sorted(
        map(_outcome_key, ingest_subfiles(rows, lk).collect())
    )
    relational = sorted(
        map(_outcome_key, ingest_outcomes_relational(rows, lk).collect())
    )
    assert kernel == relational


def test_routed_equals_kernel_on_mixed_sizes(spark):
    """The router splits by recordset size; with the threshold between
    the two recordsets' sizes, one goes to each path — the union must
    equal the kernel's output over everything (clean data)."""
    from idb_backend_spark.operators.ingest import ingest_subfiles_routed

    data = []
    for rsid, n in (("rs-small", 5), ("rs-giant", 40)):
        for i in range(n):
            data.append(
                (rsid, 0, "f.txt", "dwc:Occurrence", i,
                 [("dwc:occurrenceID", f"{rsid}-o{i}"),
                  ("dwc:recordedBy", f"p{i}")])
            )
    rows = spark.createDataFrame(data, ROW_SCHEMA)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    routed = sorted(
        map(
            _outcome_key,
            ingest_subfiles_routed(rows, lk, kernel_max_rows=10).collect(),
        )
    )
    kernel = sorted(map(_outcome_key, ingest_subfiles(rows, lk).collect()))
    assert routed == kernel
    assert len(routed) == 45


def test_relational_path_chain_divergence(spark):
    """MACHINE-PINNED divergence: the sequential loop RELEASES a failed
    row's other identifier claims (ids_to_add reset), so row 3 reuses
    'urn:beta'; the one-pass relational path keeps row 2's claim and
    flags row 3 dup_id. Exact only on the clean subset — the router's
    threshold keeps chain-bearing (normal-size) recordsets on the
    kernel."""
    from idb_backend_spark.operators.ingest import (
        ingest_outcomes_relational,
    )

    recs = [
        {"dwc:occurrenceID": "alpha", "dwc:recordedBy": "one"},
        {"idigbio:recordId": "urn:beta", "dwc:occurrenceID": "alpha",
         "dwc:recordedBy": "two"},
        {"idigbio:recordId": "urn:beta", "dwc:recordedBy": "three"},
    ]
    rows = _mk_rows(spark, "rs-chain", recs)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    kern = {
        r["seq"]: r["outcome"] for r in ingest_subfiles(rows, lk).collect()
    }
    rel = {
        r["seq"]: r["outcome"]
        for r in ingest_outcomes_relational(rows, lk).collect()
    }
    assert kern == {0: "create", 1: "dup_id", 2: "create"}
    assert rel == {0: "create", 1: "dup_id", 2: "dup_id"}  # the pin


def test_ingest_archive_composition(spark, tmp_path):
    """The one-call composition: engine-written zip -> outcomes +
    member summaries, equal to running the pieces by hand."""
    from idb_backend_spark.export.writers import write_dwca
    from idb_backend_spark.operators.ingest import ingest_archive

    core = spark.createDataFrame(
        [(i, f"n-{i}") for i in range(8)],
        "id int, `dwc:recordedBy` string",
    )
    zp = str(tmp_path / "a.zip")
    write_dwca(zp, (core, "id", ["dwc:recordedBy"], "records"))
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    outcomes, summaries, archive = ingest_archive(spark, zp, "rs-c", lk)
    try:
        rows = outcomes.collect()
        s = summaries.collect()[0].asDict()
    finally:
        archive.close()
    assert len(rows) == 8
    assert all(r["outcome"] == "create" for r in rows)
    assert s["create"] == 8 and s["processed_line_count"] == 8


def test_router_structural_guard_keeps_dirty_giants_on_kernel(spark):
    """r13 (advice): size alone must not send a recordset to the
    relational path — a giant recordset carrying sequential-state
    markers (coreid buffers here; same gate covers ASR and nested
    terms) stays on the kernel, whose cross-member extension merge the
    relational path cannot express. With the structural gate the routed
    output equals the pure-kernel output; the pre-fix router would have
    dropped the extension merge (different etags) silently."""
    from idb_backend_spark.operators.ingest import ingest_subfiles_routed

    data = []
    # extension member first (file_order 0), core second — a giant
    # recordset with cross-member state, above the routing threshold
    for i in range(12):
        data.append(
            ("rs-dirty", 0, "media.txt", "dwc:Multimedia", i,
             [("coreid", f"c{i}"),
              ("ac:providerManagedID", f"pm-{i}")])
        )
        data.append(
            ("rs-dirty", 1, "occ.txt", "dwc:Occurrence", i,
             [("id", f"c{i}"), ("dwc:recordedBy", f"p{i}")])
        )
    rows = spark.createDataFrame(data, ROW_SCHEMA)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    kernel = sorted(map(_outcome_key, ingest_subfiles(rows, lk).collect()))
    routed = sorted(
        map(
            _outcome_key,
            ingest_subfiles_routed(rows, lk, kernel_max_rows=10).collect(),
        )
    )
    assert routed == kernel
    # the kernel path linked the core rows to their media siblings —
    # proof the sequential semantics survived the routing decision
    routed_rows = ingest_subfiles_routed(
        rows, lk, kernel_max_rows=10
    ).collect()
    core_sibs = [
        r for r in routed_rows
        if r["rowtype"] == "dwc:Occurrence" and r["siblings"]
    ]
    assert len(core_sibs) == 12


def test_router_clean_giant_still_goes_relational(spark):
    """The structural gate must not over-trigger: a clean single-member
    giant takes the relational leg (pinned via the chain-divergence
    fingerprint, which only the relational path produces)."""
    from idb_backend_spark.operators.ingest import ingest_subfiles_routed

    recs = [
        {"dwc:occurrenceID": "alpha", "dwc:recordedBy": "one"},
        {"idigbio:recordId": "urn:beta", "dwc:occurrenceID": "alpha",
         "dwc:recordedBy": "two"},
        {"idigbio:recordId": "urn:beta", "dwc:recordedBy": "three"},
    ] + [
        {"dwc:occurrenceID": f"pad-{i}", "dwc:recordedBy": f"p{i}"}
        for i in range(12)
    ]
    rows = _mk_rows(spark, "rs-cleangiant", recs)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    out = {
        r["seq"]: r["outcome"]
        for r in ingest_subfiles_routed(
            rows, lk, kernel_max_rows=10
        ).collect()
    }
    assert out[2] == "dup_id"  # relational one-pass claim fingerprint


def test_id_from_rr_nondict_entry_is_exception(spark):
    """r13 (advice): a non-container ResourceRelationship entry (int)
    raises TypeError inside idFromRR in the reference, landing the row
    in the bare-except bucket — the kernel must do the same, not
    quietly fall through to the row's other identifier fields."""
    rows = spark.createDataFrame(
        [
            ("rs-rr", 0, "f.txt", "dwc:Occurrence", 0,
             [("dwc:occurrenceID", "occ-1"),
              ("dwc:ResourceRelationship", "[1, 2]")]),
            # control: proper dict entry with an unknown relationship —
            # idFromRR yields None, occurrenceID still identifies
            ("rs-rr", 0, "f.txt", "dwc:Occurrence", 1,
             [("dwc:occurrenceID", "occ-2"),
              ("dwc:ResourceRelationship",
               '[{"dwc:relatedResourceID": "x", '
               '"dwc:relationshipOfResource": "isRelatedTo"}]')]),
        ],
        ROW_SCHEMA,
    )
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    out = {
        r["seq"]: r["outcome"]
        for r in ingest_subfiles(rows, lk).collect()
    }
    assert out == {0: "exception", 1: "create"}


def test_mixed_case_rsid_identifiers_agree_across_paths(spark):
    """r13 (advice): identifyRecord lowercases the WHOLE composed
    candidate (cid.lower()), rsid prefix included. Kernel and
    relational path must mint the same identifiers — and therefore the
    same deterministic uuids — for a mixed-case rsid."""
    from idb_backend_spark.operators.ingest import (
        ingest_outcomes_relational,
    )

    rsid = "RS-MixedCase"
    recs = [
        {"dwc:occurrenceID": f"Occ-{i}", "dwc:recordedBy": f"p{i}"}
        for i in range(4)
    ]
    rows = _mk_rows(spark, rsid, recs)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    kern = sorted(map(_outcome_key, ingest_subfiles(rows, lk).collect()))
    rel = sorted(
        map(_outcome_key, ingest_outcomes_relational(rows, lk).collect())
    )
    assert kern == rel
    ids = sorted(
        i for r in ingest_subfiles(rows, lk).collect() for i in r["ids"]
    )
    assert ids == [f"rs-mixedcase\\occ-{i}" for i in range(4)]


def test_null_pair_key_is_exception_both_paths(spark):
    """r13 (advice): a pair with a null key crashes calcEtag in the
    reference (sorting None against str) -> exception bucket; the
    relational path's etag_pairs_expr now nulls the etag and maps it to
    the same outcome instead of silently hashing the pair away."""
    from idb_backend_spark.operators.ingest import (
        ingest_outcomes_relational,
    )

    data = [
        ("rs-nk", 0, "f.txt", "dwc:Occurrence", 0,
         [("dwc:occurrenceID", "occ-ok"), ("dwc:recordedBy", "fine")]),
        ("rs-nk", 0, "f.txt", "dwc:Occurrence", 1,
         [("dwc:occurrenceID", "occ-bad"), (None, "boom")]),
    ]
    rows = spark.createDataFrame(data, ROW_SCHEMA)
    lk = spark.createDataFrame([], LOOKUP_SCHEMA)
    kern = {
        r["seq"]: r["outcome"]
        for r in ingest_subfiles(rows, lk).collect()
    }
    rel = {
        r["seq"]: r["outcome"]
        for r in ingest_outcomes_relational(rows, lk).collect()
    }
    assert kern == {0: "create", 1: "exception"}
    assert rel == {0: "create", 1: "exception"}
