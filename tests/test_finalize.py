"""F9/F16/F20/F23/P14 tests — the enrichment tail."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from idb_backend_spark.functions import finalize as fin
from idb_backend_spark.query.shim import point_in_polygon


def test_related_uuids(spark):
    df = spark.createDataFrame(
        [
            Row(
                i=0,
                links=[
                    "http://api.example.org/v2/media/0000012b-9bb8-42f4-ad3b-c958cb22ae45?v=1",
                    "not-a-uuid",
                ],
            ),
            Row(i=1, links=[]),
        ]
    )
    out = df.select("i", fin.related_uuids(F.col("links")).alias("u")).orderBy("i").collect()
    assert out[0]["u"] == ["0000012b-9bb8-42f4-ad3b-c958cb22ae45"]
    assert out[1]["u"] == []


def test_media_presence_flags(spark):
    """P14 — presence is NOT-NONE, never size>0 (conversions.py:674-678
    tests ``r["mediarecords"] is not None``): an EMPTY list — what
    relationsGrabber emits when every link lacks a uuid — still reports
    presence true. r9 parity correction."""
    df = spark.createDataFrame(
        [
            Row(i=0, mr=["m1"], rec=[]),
            Row(i=1, mr=[], rec=["r1"]),
            Row(i=2, mr=None, rec=None),
        ]
    )
    flags = fin.media_presence_flags(F.col("mr"), F.col("rec"))
    out = (
        df.select(
            "i",
            flags["hasMedia"].alias("hm"),
            flags["hasImage"].alias("hi"),
            flags["hasSpecimen"].alias("hs"),
        )
        .orderBy("i")
        .collect()
    )
    assert [(r.hm, r.hi, r.hs) for r in out] == [
        (True, True, True),    # empty rec list is not None -> present
        (True, True, True),    # empty mr list is not None -> present
        (False, False, False),
    ]


def test_wkt_point_and_polygon(spark):
    df = spark.createDataFrame(
        [
            Row(i=0, wkt="POINT (-82.32 29.65)"),
            Row(i=1, wkt="polygon ((0 0, 10 0, 10 10, 0 10, 0 0))"),
            Row(i=2, wkt="0,0,10,0,5,10"),  # bare flat-float-list fallback
            Row(i=3, wkt="LINESTRING (0 0, 1 1)"),
        ]
    )
    out = (
        df.select(
            "i",
            fin.wkt_point(F.col("wkt")).alias("pt"),
            fin.wkt_polygon_ring(F.col("wkt")).alias("ring"),
        )
        .orderBy("i")
        .collect()
    )
    assert out[0]["pt"]["lon"] == -82.32 and out[0]["pt"]["lat"] == 29.65
    assert out[1]["pt"] is None
    assert len(out[1]["ring"]) == 5
    assert [p["lon"] for p in out[2]["ring"]] == [0.0, 10.0, 5.0]
    assert out[3]["pt"] is None and out[3]["ring"] is None

    # parsed ring feeds the native point-in-polygon predicate (P10 path)
    ring = [[p["lon"], p["lat"]] for p in out[1]["ring"]]
    probe = spark.createDataFrame([Row(lat=5.0, lon=5.0), Row(lat=20.0, lon=5.0)])
    hits = probe.filter(point_in_polygon(F.col("lat"), F.col("lon"), ring)).collect()
    assert [(r.lat, r.lon) for r in hits] == [(5.0, 5.0)]


def test_point_radius(spark):
    df = spark.createDataFrame([Row(lat=29.65, lon=-82.32, unc="100")])
    gp = F.struct(F.col("lon"), F.col("lat"))
    out = df.select(fin.point_radius(gp, F.col("unc")).alias("c")).first()["c"]
    assert out["type"] == "circle" and out["radius_m"] == 100.0


def test_record_identifiers(spark):
    df = spark.createDataFrame(
        [
            Row(i=0, occ="URN:CAT:1 ", rid="http://x/ABC", bid="row9"),
            Row(i=1, occ=None, rid=None, bid=None),
        ]
    )
    out = (
        df.select(
            "i",
            fin.record_identifiers(
                F.lit("rs1"), F.col("occ"), F.col("rid"), F.col("bid")
            ).alias("ids"),
        )
        .orderBy("i")
        .collect()
    )
    # TABLE order (db_check.py:64-72, r10): recordId comes FIRST —
    # identifyRecord collects in identifier_fields order, and recordId
    # is the table's first row; occurrenceID and bare id follow
    assert out[0]["ids"] == ["http://x/abc", "rs1\\urn:cat:1", "rs1\\row9"]
    assert out[1]["ids"] == []


def test_finalize_index_document(spark):
    df = spark.createDataFrame(
        [
            Row(uuid="a", lat=29.65, lon=-82.32, note="",
                pad="  ", dc=datetime.date(2020, 5, 17)),
            Row(uuid="b", lat=None, lon=-82.32, note="keep",
                pad="x", dc=None),
        ]
    )
    out = {
        r["uuid"]: r
        for r in fin.finalize_index_document(df, date_cols=("dc",)).collect()
    }
    assert out["a"]["geopoint"]["lon"] == -82.32
    # prepForEs's WRITTEN rule (indexer.py:79-83): len == 0 dropped,
    # whitespace-only KEPT (len 2 > 0 — there is no trim there)
    assert out["a"]["note"] is None
    assert out["a"]["pad"] == "  "
    assert out["a"]["dc_iso"] == "2020-05-17"
    assert out["b"]["geopoint"] is None
    assert out["b"]["note"] == "keep"

    # drop_empty_strings=False = the reference's PY3 RUNTIME, literally:
    # the isinstance(v, basestring) probe raises NameError into the bare
    # except and every string survives, '' included (dead skip arm)
    raw = {
        r["uuid"]: r
        for r in fin.finalize_index_document(
            df, date_cols=("dc",), drop_empty_strings=False
        ).collect()
    }
    assert raw["a"]["note"] == ""


def test_prepforEs_py3_skip_is_dead_code():
    """The fact behind the drop_empty_strings choice, pinned: without a
    basestring builtin (py3), the reference's skip-empty branch raises
    NameError and the bare except keeps the value (indexer.py:79-87)."""
    value = {}
    v = ""
    try:
        if isinstance(v, basestring):  # noqa: F821 — the point exactly
            if len(v) > 0:
                value["f"] = v
        else:
            if len(str(v)) > 0:
                value["f"] = v
    except Exception:
        value["f"] = v
    assert value == {"f": ""}  # empty string KEPT on py3


def test_wkt_bare_fallback_reference_dialect(spark):
    """conversions.py:783-790 — the bare fallback splits the WHOLE
    string on commas, float()s every token, zips evens with odds:
    the pair dialect ('0 0, 10 0') is NOT accepted (float('0 0')
    raises there), an odd count is invalid, and a 2-pair list aborts
    (LinearRing needs 3 coordinates)."""
    df = spark.createDataFrame(
        [
            Row(i=0, wkt="0,0,10,0,5,10"),
            Row(i=1, wkt="0 0, 10 0, 5 10"),   # pair dialect -> rejected
            Row(i=2, wkt="1,2,3"),             # odd count -> rejected
            Row(i=3, wkt="1,1,2,2"),           # 2 pairs -> rejected
            Row(i=4, wkt="1,x,2,2,3,3"),       # non-float token -> rejected
        ]
    )
    out = (
        df.select("i", fin.wkt_polygon_ring(F.col("wkt")).alias("ring"))
        .orderBy("i")
        .collect()
    )
    assert [(p["lon"], p["lat"]) for p in out[0]["ring"]] == [
        (0.0, 0.0), (10.0, 0.0), (5.0, 10.0)
    ]
    assert all(out[i]["ring"] is None for i in (1, 2, 3, 4))


def test_relations_grabber_reference_quirks(spark):
    """conversions.py:632-672 — the full assembly: links' elif blocks
    sibling fallback entirely; text under links is grabFirstUUID(first)
    — case PRESERVED, grabFirstUUID returns the match verbatim
    (conversions.py:319-331) — but VERBATIM-whole under siblings; list
    under links drops non-uuid entries but copies siblings verbatim;
    idigbio:parent overwrites the singular parent column last, in every
    branch. An all-non-uuid links list yields the EMPTY list (not NULL)
    and therefore hasImage=true (P14, conversions.py:656-657,:676)."""
    from pyspark.sql import functions as F

    from idb_backend_spark.functions.finalize import relations_grabber

    u = "AABBCCDD-0000-0000-0000-000000000001"
    link = f"https://api.example.org/v2/view/recordsets/{u}"
    mlink = "https://api.example.org/v2/view/mediarecords/aabbccdd-0000-0000-0000-000000000002"
    rows = [
        # 1: links with both keys (+ a no-uuid media link, dropped)
        (1, {"recordset": [link], "mediarecord": [mlink, "no-uuid"]},
         None, None),
        # 2: links present but MISSING recordset; siblings HAS it —
        #    the elif must block the fallback (recordset stays NULL)
        (2, {"mediarecord": [mlink]},
         {"recordset": ["RS-2 Verbatim"]}, None),
        # 3: siblings only — verbatim text + verbatim list
        (3, None,
         {"recordset": [" RS-3 Verbatim "], "mediarecord": ["s1", "s2"]},
         None),
        # 4: neither
        (4, None, None, None),
        # 5: links first element has NO uuid -> text column NULL
        (5, {"recordset": ["no-uuid-in-here"]}, None, None),
        # 6: parent overrides the links value
        (6, {"recordset": [link]}, None, "parent-rs-6"),
        # 7: parent fills even when neither branch is present
        (7, None, None, "parent-rs-7"),
        # 8: mediarecord links present but ALL uuid-less -> EMPTY list
        (8, {"mediarecord": ["no-uuid-a", "no-uuid-b"]}, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "i int, links map<string,array<string>>, "
        "sibs map<string,array<string>>, parent string",
    )
    r = relations_grabber(
        "records", F.col("links"), F.col("sibs"), F.col("parent")
    )
    hi = fin.media_presence_flags(
        r["mediarecords"], F.lit(None).cast("array<string>")
    )["hasImage"]
    got = {
        row["i"]: (row["rs"], row["mr"], row["hi"])
        for row in df.select(
            "i",
            r["recordset"].alias("rs"),
            F.array_join(r["mediarecords"], "|").alias("mr"),
            hi.alias("hi"),
        ).collect()
    }
    mr_uuid = mlink.rsplit("/", 1)[1]
    assert got[1] == (u, mr_uuid, True)  # uuid case PRESERVED (verbatim)
    assert got[2] == (None, mr_uuid, True)           # elif blocked
    assert got[3] == (" RS-3 Verbatim ", "s1|s2", True)  # verbatim, unfolded
    assert got[4] == (None, None, False)
    assert got[5] == (None, None, False)
    assert got[6] == ("parent-rs-6", None, False)  # no mediarecord key in links
    assert got[7] == ("parent-rs-7", None, False)
    # P14 edge: empty extracted list is not None -> hasImage TRUE
    assert got[8] == (None, "", True)


def test_relations_grabber_per_type_tables(spark):
    """recordsets get the publisher text column with the parent
    override; publishers get the recordsets LIST with no parent."""
    from pyspark.sql import functions as F

    from idb_backend_spark.functions.finalize import relations_grabber

    u1 = "https://x/v/11111111-2222-3333-4444-555555555555"
    u2 = "https://x/v/66666666-7777-8888-9999-aaaaaaaaaaaa"
    df = spark.createDataFrame(
        [(1, {"publisher": [u1], "recordset": [u1, u2]}, "pp")],
        "i int, links map<string,array<string>>, parent string",
    )
    rsets = relations_grabber(
        "recordsets", F.col("links"), F.lit(None).cast(
            "map<string,array<string>>"
        ), F.col("parent"),
    )
    pubs = relations_grabber(
        "publishers", F.col("links"), F.lit(None).cast(
            "map<string,array<string>>"
        ), F.col("parent"),
    )
    row = df.select(
        rsets["publisher"].alias("p"),
        F.array_join(pubs["recordsets"], "|").alias("rs"),
    ).first()
    assert row["p"] == "pp"  # parent overrides the uuid from links
    assert row["rs"] == (
        "11111111-2222-3333-4444-555555555555"
        "|66666666-7777-8888-9999-aaaaaaaaaaaa"
    )


def test_id_from_rr_first_element_only(spark):
    """idFromRR (db_check.py:98-108): the loop returns on every branch
    of its FIRST iteration — a later matching relatedResource is never
    examined; representedIn is verbatim, sameAs namespaced, any other
    relationship nothing."""
    df = spark.createDataFrame(
        [
            (1, [("RR-1", "representedIn")]),
            (2, [("RR-2", "sameAs")]),
            (3, [(None, None), ("LATER", "representedIn")]),
            (4, [("RR-4", "isRelatedTo")]),
            (5, []),
            (6, None),
        ],
        "i int, rr array<struct<relatedResourceID string, "
        "relationshipOfResource string>>",
    )
    out = {
        r["i"]: r["id"]
        for r in df.select(
            "i", fin.id_from_rr(F.col("rr"), F.lit("rs1")).alias("id")
        ).collect()
    }
    assert out[1] == "rr-1"
    assert out[2] == "rs1\\rr-2"
    assert out[3] is None  # first element lacks keys -> later one ignored
    assert out[4] is None
    assert out[5] is None and out[6] is None


def test_media_identifiers_uconn_exception(spark):
    """db_check.py:156-159: when dcterms:identifier equals
    ac:providerManagedID case-insensitively, the provider arm is
    SKIPPED; the dcterms arm still contributes its \\media\\ form."""
    df = spark.createDataFrame(
        [
            ("r1", "PM-9", "pm-9"),   # UConn: provider arm skipped
            ("r2", "PM-8", "DC-8"),   # both arms
            ("r3", "PM-7", None),     # provider only
        ],
        "rec string, pm string, dct string",
    )
    out = {
        r["rec"]: r["ids"]
        for r in df.select(
            "rec",
            F.array_join(
                fin.media_identifiers(
                    F.lit("rs"), F.col("rec"), F.col("pm"), F.col("dct")
                ),
                "|",
            ).alias("ids"),
        ).collect()
    }
    assert out["r1"] == "r1|rs\\media\\pm-9"
    assert out["r2"] == "r2|pm-8|rs\\media\\dc-8"
    assert out["r3"] == "r3|pm-7"
