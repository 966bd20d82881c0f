"""§1.4 typed-schema data module tests: table-derived longnames/weights/
maxscore, schema-driven verbatim projection (F2), and writer headers.

Golden expectations mirror the reference's derivations
(conversions.py:205-215 longname rule, :218-224 maxscores, :274-294
getfield/verbatimGrabber semantics).
"""

import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from idb_backend_spark.data.typed_schema import (
    FIELDS,
    RECORD_TYPES,
    longnames,
    maxscore,
    raw_fields,
    scored_weights,
    typed_struct,
    verbatim_projection,
)


def test_table_shape():
    assert set(RECORD_TYPES) == {
        "records", "mediarecords", "publishers", "recordsets",
    }
    assert len(FIELDS["records"]) == 81
    assert len(FIELDS["mediarecords"]) == 21
    assert len(FIELDS["publishers"]) == 9
    assert len(FIELDS["recordsets"]) == 14


def test_maxscores_match_reference():
    # Σ include_in_score per type, floored at 1.0 (conversions.py:218-224)
    assert maxscore("records") == 69.0
    assert maxscore("mediarecords") == 11.0
    assert maxscore("publishers") == 1.0  # sum is 0 -> floor
    assert maxscore("recordsets") == 1.0


def test_longname_default_rule():
    ln = longnames("records")
    assert ln["uuid"] == "idigbio:uuid"  # from rawfield
    assert ln["datemodified"] == "idigbio:dateModified"  # explicit
    assert ln["genus"] == "dwc:genus"  # from rawfield
    assert ln["commonnames"] == "idigbio:commonnames"  # fallback
    assert ln["minelevation"] == "dwc:minimumElevationInMeters"  # explicit
    assert longnames("recordsets")["name"] == "dwc:datasetName"


def test_scored_weights_exclude_zero():
    w = scored_weights("records")
    assert "uuid" not in w and "flags" not in w and "dqs" not in w
    assert w["genus"] == 1 and w["geopoint"] == 1
    assert sum(w.values()) == 69


def test_typed_struct_types():
    s = typed_struct("records")
    by_name = {f.name: f.dataType.simpleString() for f in s.fields}
    assert by_name["genus"] == "string"
    assert by_name["recordids"] == "array<string>"
    assert by_name["version"] == "bigint"
    assert by_name["dqs"] == "double"
    assert by_name["hasImage"] == "boolean"
    assert by_name["datecollected"] == "timestamp"
    assert by_name["geopoint"] == "struct<lat:double,lon:double>"


def test_raw_fields_only_raw_backed():
    names = {n for n, _, _ in raw_fields("records")}
    assert "genus" in names and "uuid" in names
    # derived-only columns are not projected
    assert "geopoint" not in names and "dqs" not in names


def test_verbatim_projection_semantics(spark):
    # F1/F2: lowercase+trim, case-insensitive key preference (lowercased
    # key wins when both present), JSON list parsing with element folds
    rows = [
        Row(
            id=1,
            data={
                "dwc:genus": "  ACER ",
                # lowercased key variant must win over the verbatim key
                "dwc:country": "IGNORED",
                "dwc:country".lower(): "United States",
                "idigbio:recordIds": '["CAT-1"," URN:X:9 "]',
            },
        ),
        Row(id=2, data={"dwc:scientificName": "Quercus alba"}),
    ]
    df = spark.createDataFrame(rows)
    out = verbatim_projection(df, "records", keep=["id"]).orderBy("id")
    r1, r2 = out.collect()
    assert r1["genus"] == "acer"
    assert r1["country"] == "united states"
    assert r1["recordids"] == ["cat-1", "urn:x:9"]
    assert r1["scientificname"] is None
    assert r2["scientificname"] == "quercus alba"
    assert r2["genus"] is None
    # one column per raw-backed schema row plus the keep column
    assert len(out.columns) == 1 + len(raw_fields("records"))


def test_writer_longname_headers(spark):
    from idb_backend_spark.export.writers import write_csv_member

    df = spark.createDataFrame(
        [Row(uuid="u1", genus="acer", catalognumber="c1")]
    )
    d = tempfile.mkdtemp(prefix="ln_hdr_")
    path = os.path.join(d, "occurrence.csv")
    write_csv_member(
        df, path, "uuid", ["genus", "catalognumber"], record_type="records"
    )
    with open(path, encoding="utf-8") as fh:
        header = fh.readline().strip()
    assert header == "idigbio:uuid,dwc:genus,dwc:catalogNumber"


def test_dqs_score_for_matches_reference_fold(spark):
    from idb_backend_spark.functions.flags import dqs_score_for

    df = spark.createDataFrame(
        [
            Row(genus="acer", country="us", flags=["similar_coord"]),
            Row(genus=None, country="us", flags=[]),
        ]
    )
    out = df.select(
        dqs_score_for(
            "records", F.col("flags"), columns=["genus", "country"]
        ).alias("dqs")
    ).collect()
    # (2 present - 1 flag)/69 ; (1 present - 0 flags)/69
    assert out[0]["dqs"] == pytest.approx(1 / 69.0)
    assert out[1]["dqs"] == pytest.approx(1 / 69.0)


def test_verbatim_projection_other_record_types(spark):
    # the same table drives every record type's projection (F2 is not
    # records-specific): mediarecords + recordsets raw-backed columns
    rows = [
        Row(
            id=1,
            data={
                "dc:type": "StillImage",
                "ac:tag": "Herbarium Sheet",
                "idigbio:uuid": "U-1",
            },
        )
    ]
    df = spark.createDataFrame(rows)
    media = {
        r["id"]: r
        for r in verbatim_projection(df, "mediarecords", keep=["id"]).collect()
    }
    assert media[1]["type"] == "stillimage"
    assert media[1]["tag"] == "herbarium sheet"
    assert media[1]["uuid"] == "u-1"
    rs = verbatim_projection(
        spark.createDataFrame(
            [Row(id=1, data={"collection_name": "Fish Tissues"})]
        ),
        "recordsets",
        keep=["id"],
    ).collect()[0]
    assert rs["name"] == "fish tissues"


def test_getfield_null_valued_lowercase_key_wins(spark):
    """Reference getfield parity (conversions.py:274-287): the lowercased
    key is selected by PRESENCE — a present-but-null lowercased entry
    yields null, it must not fall through to the verbatim key's value."""
    from pyspark.sql import functions as F

    from idb_backend_spark.data.typed_schema import verbatim_projection

    df = spark.createDataFrame([(1,)], "id long").withColumn(
        "data",
        F.map_from_arrays(
            F.array(
                F.lit("dwc:scientificname"), F.lit("dwc:scientificName")
            ),
            F.array(F.lit(None).cast("string"), F.lit("Quercus")),
        ),
    )
    out = verbatim_projection(df, "records", keep=["id"]).first()
    assert out["scientificname"] is None


def test_raw_map_dual_addressing_predicate_and_projection(spark):
    """P13's dual addressing as a unit contract (the retired
    raw_field_access catalog entry): filtering AND projecting through
    the raw `data` map must equal the typed-column formulation —
    including the NULL semantics of a missing key. The projection half
    stays driver-graded via records_typed_projection."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "en", "web", 250),
            (2, "de", "web", 250),
            (3, "en", None, 150),
            (4, None, "book", 300),
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    raw = df.select(
        "doc_id",
        "n_chars",
        F.map_filter(
            F.create_map(
                F.lit("dc:language"), F.col("lang"),
                F.lit("dc:source"), F.col("source"),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("data"),
    )
    via_map = (
        raw.filter(
            (F.col("data")["dc:language"] == "en") & (F.col("n_chars") >= 200)
        )
        .select("doc_id", F.col("data")["dc:source"].alias("src"))
        .collect()
    )
    via_cols = (
        df.filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id", F.col("source").alias("src"))
        .collect()
    )
    assert sorted(via_map) == sorted(via_cols) == [(1, "web")]
    # a key absent from the map reads NULL, never errors (open schema)
    assert raw.filter(F.col("data")["dwc:absent"].isNull()).count() == 4


def test_raw_data_flags_reference_fold(spark):
    """grabAll's raw-data flag fold (conversions.py:960-962): every
    flag_*-prefixed KEY of the raw map appends its suffix — value never
    consulted, prefix stripped exactly like the reference's
    "_".join(k.split("_")[1:]) (flag__x -> _x, bare flag_ -> ''), keys
    without the prefix ignored, and 'flags_'-prefixed keys do NOT match
    (startswith is exact)."""
    from pyspark.sql import Row

    from idb_backend_spark.functions.flags import raw_data_flags

    rows = [
        Row(i=0, d={"flag_geopoint_datum_missing": "x",
                    "dwc:genus": "Acer",
                    "flag_rev_geocode_corrected": ""}),
        Row(i=1, d={"flags_not_a_match": "x", "noflag_y": "1"}),
        Row(i=2, d={"flag__x": "v", "flag_": "v"}),
        Row(i=3, d=None),
        Row(i=4, d={}),
    ]
    df = spark.createDataFrame(rows, "i int, d map<string,string>")
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", raw_data_flags(F.col("d")).alias("f")
        ).collect()
    }
    assert sorted(got[0]) == ["geopoint_datum_missing", "rev_geocode_corrected"]
    assert got[1] == []
    assert sorted(got[2]) == ["", "_x"]
    # NULL map -> [] (r10, r9 ADVICE): callers F.concat this with the
    # computed flags and concat null-propagates — a NULL here would
    # silently null the ENTIRE flags array for the row
    assert got[3] == []
    assert got[4] == []
