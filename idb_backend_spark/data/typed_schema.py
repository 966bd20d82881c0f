"""§1.4 — the typed analytical schema as ONE data module.

The reference declares the per-record-type typed column set as a single
table of ``[indexname, rawfield, type, include_in_score, longname]`` rows
(idb/helpers/conversions.py:35-188) and derives three things from it:

* the verbatim projection (F2, ``verbatimGrabber`` conversions.py:290-294):
  every row with a non-empty ``rawfield`` is projected from the raw record
  into the index column ``indexname`` through ``getfield`` (F1 —
  case-insensitive key lookup, strings lowercased+stripped, lists
  element-wise; conversions.py:274-287);
* the data-quality score weights and per-type maxscore (A8/F18,
  conversions.py:218-224, :264-271);
* the CSV-export long names (``index_field_to_longname``,
  conversions.py:205-215): explicit longname, else the rawfield, else
  ``idigbio:`` + indexname.

This module is the engine's single source of truth for all three — the
same table drives `verbatim_projection`, `functions.flags.dqs_score_for`,
and `export.writers` longname headers.

Type vocabulary → Spark types follows SURVEY §1.4: text/longtext→string,
list→array<string> (JSON-encoded in the raw map), integer→long,
float→double, boolean→boolean, date→timestamp, point→struct<lat,lon>,
custom→string (JSON; the recordsets.contacts nested shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (indexname, rawfield, reftype, include_in_score, longname) — longname
# None ⇒ derived by the conversions.py:205-215 default rule.
FIELDS: dict[str, tuple[tuple[str, str, str, int, str | None], ...]] = {
    "records": (
        ("uuid", "idigbio:uuid", "text", 0, None),
        ("datemodified", "", "date", 0, "idigbio:dateModified"),
        ("etag", "idigbio:etag", "text", 0, None),
        ("recordids", "idigbio:recordIds", "list", 0, None),
        ("version", "", "integer", 0, "idigbio:version"),
        ("kingdom", "dwc:kingdom", "text", 1, None),
        ("phylum", "dwc:phylum", "text", 1, None),
        ("class", "dwc:class", "text", 1, None),
        ("order", "dwc:order", "text", 1, None),
        ("family", "dwc:family", "text", 1, None),
        ("genus", "dwc:genus", "text", 1, None),
        ("basisofrecord", "dwc:basisOfRecord", "text", 1, None),
        ("specificepithet", "dwc:specificEpithet", "text", 1, None),
        ("infraspecificepithet", "dwc:infraspecificEpithet", "text", 1, None),
        ("highertaxon", "dwc:higherClassification", "longtext", 1, None),
        ("scientificname", "dwc:scientificName", "text", 1, None),
        ("commonname", "dwc:vernacularName", "text", 1, None),
        ("commonnames", "", "list", 1, None),
        ("associatedsequences", "", "list", 1, None),
        ("continent", "dwc:continent", "text", 1, None),
        ("country", "dwc:country", "text", 1, None),
        ("stateprovince", "dwc:stateProvince", "text", 1, None),
        ("county", "dwc:county", "text", 1, None),
        ("countrycode", "idigbio:isoCountryCode", "text", 1, None),
        ("municipality", "dwc:municipality", "text", 1, None),
        ("waterbody", "dwc:waterBody", "text", 1, None),
        ("locality", "dwc:locality", "longtext", 1, None),
        ("verbatimlocality", "dwc:verbatimLocality", "longtext", 1, None),
        ("geopoint", "", "point", 1, "idigbio:geoPoint"),
        # geoshape intentionally absent (disabled upstream,
        # conversions.py:66-68, :952-953)
        ("minelevation", "", "float", 1, "dwc:minimumElevationInMeters"),
        ("maxelevation", "", "float", 1, "dwc:maximumElevationInMeters"),
        ("mindepth", "", "float", 1, "dwc:minimumDepthInMeters"),
        ("maxdepth", "", "float", 1, "dwc:maximumDepthInMeters"),
        ("coordinateuncertainty", "", "float", 1,
         "dwc:coordinateUncertaintyInMeters"),
        ("datecollected", "", "date", 1, "idigbio:eventDate"),
        ("startdayofyear", "", "integer", 1, "dwc:startDayOfYear"),
        ("institutionname", "idigbio:institutionName", "text", 1, None),
        ("institutioncode", "dwc:institutionCode", "text", 1, None),
        ("institutionid", "dwc:institutionID", "text", 1, None),
        ("collectionname", "idigbio:collectionName", "text", 1, None),
        ("collectioncode", "dwc:collectionCode", "text", 1, None),
        ("collectionid", "dwc:collectionID", "text", 1, None),
        ("occurrenceid", "dwc:occurrenceID", "text", 1, None),
        ("barcodevalue", "idigbio:barcodeValue", "text", 1, None),
        ("catalognumber", "dwc:catalogNumber", "text", 1, None),
        ("fieldnumber", "dwc:fieldNumber", "text", 1, None),
        ("recordnumber", "dwc:recordNumber", "text", 1, None),
        ("typestatus", "dwc:typeStatus", "text", 1, None),
        ("eventdate", "dwc:eventDate", "text", 1, None),
        ("verbatimeventdate", "dwc:verbatimEventDate", "text", 1, None),
        ("collector", "dwc:recordedBy", "longtext", 1, None),
        ("recordset", "", "text", 0, "idigbio:recordset"),
        ("mediarecords", "", "list", 0, "idigbio:mediarecords"),
        ("hasImage", "", "boolean", 0, "idigbio:hasImage"),
        ("hasMedia", "", "boolean", 0, "idigbio:hasMedia"),
        ("bed", "dwc:bed", "text", 1, None),
        ("group", "dwc:group", "text", 1, None),
        ("member", "dwc:member", "text", 1, None),
        ("formation", "dwc:formation", "text", 1, None),
        ("geologicalcontextid", "dwc:geologicalContextID", "text", 1, None),
        ("lowestbiostratigraphiczone", "dwc:lowestBiostratigraphicZone",
         "text", 1, None),
        ("highestbiostratigraphiczone", "dwc:highestBiostratigraphicZone",
         "text", 1, None),
        ("lithostratigraphicterms", "dwc:lithostratigraphicTerms",
         "text", 1, None),
        ("earliestperiodorlowestsystem", "dwc:earliestPeriodOrLowestSystem",
         "text", 1, None),
        ("earliesteraorlowesterathem", "dwc:earliestEraOrLowestErathem",
         "text", 1, None),
        ("earliestepochorlowestseries", "dwc:earliestEpochOrLowestSeries",
         "text", 1, None),
        ("earliestageorloweststage", "dwc:earliestAgeOrLowestStage",
         "text", 1, None),
        ("earliesteonorlowesteonothem", "dwc:earliestEonOrLowestEonothem",
         "text", 1, None),
        ("latesteraorhighesterathem", "dwc:latestEraOrHighestErathem",
         "text", 1, None),
        ("latestepochorhighestseries", "dwc:latestEpochOrHighestSeries",
         "text", 1, None),
        ("latestageorhigheststage", "dwc:latestAgeOrHighestStage",
         "text", 1, None),
        ("latestperiodorhighestsystem", "dwc:latestPeriodOrHighestSystem",
         "text", 1, None),
        ("latesteonorhighesteonothem", "dwc:latestEonOrHighestEonothem",
         "text", 1, None),
        ("individualcount", "", "float", 0, "dwc:individualCount"),
        ("flags", "", "list", 0, "idigbio:flags"),
        ("dqs", "", "float", 0, "idigbio:dataQualityScore"),
        ("canonicalname", "gbif:canonicalName", "text", 1, None),
        ("taxonomicstatus", "dwc:taxonomicStatus", "text", 1, None),
        ("taxonid", "dwc:taxonID", "text", 1, None),
        ("taxonrank", "dwc:taxonRank", "text", 1, None),
        ("datasetid", "dwc:datasetID", "text", 1, None),
    ),
    "mediarecords": (
        ("uuid", "idigbio:uuid", "text", 0, None),
        ("datemodified", "", "date", 0, "idigbio:dateModified"),
        ("modified", "", "date", 1, "dcterms:modified"),
        ("etag", "idigbio:etag", "text", 0, None),
        ("version", "", "integer", 0, "idigbio:version"),
        ("recordids", "idigbio:recordIds", "list", 0, None),
        ("recordset", "", "text", 0, "idigbio:recordsets"),
        ("records", "", "list", 0, "idigbio:records"),
        ("format", "", "text", 1, "dcterms:format"),
        ("mediatype", "", "text", 1, "idigbio:mediaType"),
        ("type", "dc:type", "text", 1, None),
        ("tag", "ac:tag", "longtext", 1, None),
        ("accessuri", "", "text", 1, "ac:accessURI"),
        ("xpixels", "", "integer", 1, "exif:PixelXDimension"),
        ("ypixels", "", "integer", 1, "exif:PixelYDimension"),
        ("rights", "", "text", 1, "dcterms:rights"),
        ("licenselogourl", "", "text", 1, "ac:licenseLogoURL"),
        ("webstatement", "", "text", 1, "xmpRights:WebStatement"),
        ("hasSpecimen", "", "boolean", 0, "idigbio:hasSpecimen"),
        ("flags", "", "list", 0, "idigbio:flags"),
        ("dqs", "", "float", 0, "idigbio:dataQualityScore"),
    ),
    "publishers": (
        ("uuid", "idigbio:uuid", "text", 0, None),
        ("datemodified", "", "date", 0, "idigbio:dateModified"),
        ("etag", "idigbio:etag", "text", 0, None),
        ("version", "", "integer", 0, "idigbio:version"),
        ("recordids", "idigbio:recordIds", "list", 0, None),
        ("flags", "", "list", 0, "idigbio:flags"),
        ("dqs", "", "float", 0, "idigbio:dataQualityScore"),
        ("recordsets", "", "list", 0, "idigbio:recordsets"),
        ("name", "name", "text", 0, "idigbio:publisherName"),
    ),
    "recordsets": (
        ("uuid", "idigbio:uuid", "text", 0, None),
        ("datemodified", "", "date", 0, "idigbio:dateModified"),
        ("etag", "idigbio:etag", "text", 0, None),
        ("version", "", "integer", 0, "idigbio:version"),
        ("recordids", "idigbio:recordIds", "list", 0, None),
        ("publisher", "", "text", 0, "idigbio:publisher"),
        ("flags", "", "list", 0, "idigbio:flags"),
        ("dqs", "", "float", 0, "idigbio:dataQualityScore"),
        ("rights", "data_rights", "text", 0, "dcterms:rights"),
        ("contacts", "contacts", "custom", 0, None),
        ("archivelink", "link", "text", 0, "idigbio:archiveLink"),
        ("emllink", "eml_link", "text", 0, "idigbio:emlLink"),
        ("logourl", "logo_url", "text", 0, "idigbio:logoUrl"),
        ("name", "collection_name", "text", 0, "dwc:datasetName"),
    ),
}

RECORD_TYPES = tuple(FIELDS)

_SPARK_TYPES: dict[str, T.DataType] = {
    "text": T.StringType(),
    "longtext": T.StringType(),
    "list": T.ArrayType(T.StringType()),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "point": T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    ),
    # recordsets.contacts nested rows ride as JSON strings in the raw map
    "custom": T.StringType(),
}


def spark_type(reftype: str) -> T.DataType:
    return _SPARK_TYPES[reftype]


def typed_struct(record_type: str) -> T.StructType:
    """The full typed analytical schema for one record type as a Spark
    StructType (SURVEY §1.4's "one DataFrame per record type")."""
    return T.StructType(
        [
            T.StructField(name, spark_type(reftype), True)
            for name, _, reftype, _, _ in FIELDS[record_type]
        ]
    )


def longnames(record_type: str) -> dict[str, str]:
    """indexname → CSV-export long name (conversions.py:205-215): explicit
    longname, else the raw field, else ``idigbio:`` + indexname."""
    out = {}
    for name, rawfield, _, _, longname in FIELDS[record_type]:
        out[name] = longname or rawfield or f"idigbio:{name}"
    return out


def scored_weights(record_type: str) -> dict[str, int]:
    """indexname → include_in_score weight (the dqs numerator terms)."""
    return {
        name: w for name, _, _, w, _ in FIELDS[record_type] if w
    }


def maxscore(record_type: str) -> float:
    """Σ include_in_score, floored at 1.0 (conversions.py:218-224)."""
    return float(sum(w for _, _, _, w, _ in FIELDS[record_type])) or 1.0


def raw_fields(record_type: str) -> list[tuple[str, str, str]]:
    """(indexname, rawfield, reftype) rows the verbatim projection reads —
    exactly the rows with a non-empty rawfield (conversions.py:290-294)."""
    return [
        (name, rawfield, reftype)
        for name, rawfield, reftype, _, _ in FIELDS[record_type]
        if rawfield
    ]


def _getfield_expr(raw: Column, rawfield: str, reftype: str) -> Column:
    """F1 ``getfield`` over the raw map (conversions.py:274-287): prefer
    the lowercased key, fall back to the verbatim key; strings are
    lowercased+stripped, list values (JSON-encoded in the map) parse to
    array<string> with element-wise folding.

    Key selection is by PRESENCE, not by value: the reference's
    ``if fl in d: f = fl`` picks the lowercased key even when its value
    is None — a coalesce would silently fall through to the verbatim
    key's value there and diverge."""
    lower_key = rawfield.lower()
    v = F.when(
        F.map_contains_key(raw, F.lit(lower_key)), raw[lower_key]
    ).otherwise(raw[rawfield])
    if reftype == "list":
        arr = F.from_json(v, T.ArrayType(T.StringType()))
        from idb_backend_spark.functions.grabbers import py_strip

        return F.transform(arr, lambda x: F.lower(py_strip(x)))
    if reftype in ("text", "longtext"):
        from idb_backend_spark.functions.grabbers import py_strip

        return F.lower(py_strip(v))
    # non-string types pass through verbatim at projection time; the typed
    # grabbers (functions.grabbers F3-F5, F8) do the coercion downstream
    return v


def verbatim_projection(
    df: DataFrame, record_type: str, data_col: str = "data",
    keep: list[str] | None = None,
) -> DataFrame:
    """F2 ``verbatimGrabber`` (conversions.py:290-294) driven by the schema
    table: project every raw-backed index column out of the ``data`` map.

    ``keep`` prepends pass-through columns (ids, etc.). One row of the
    schema table ⇒ one output column; stays entirely in codegen (map
    lookups + lower/trim — no shuffle, no Python).
    """
    raw = F.col(data_col)
    cols = [F.col(c) for c in (keep or [])]
    cols += [
        _getfield_expr(raw, rawfield, reftype).alias(name)
        for name, rawfield, reftype in raw_fields(record_type)
    ]
    return df.select(*cols)
