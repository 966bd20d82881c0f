"""S3 — field-name registry and term canonicalization
(reference idb/helpers/fieldnames.py).

The registry is public standards data: CURIE namespace prefixes for the
Darwin Core / Dublin Core / Audubon Core term URI families
(fieldnames.py:20-49), and a verbatim-header → canonical-term translate
table (the reference's ~525-line ``types`` dict, fieldnames.py:64-589).
This module carries the namespaces in full and a representative subset of
the translate table — production deployments extend ``TRANSLATE`` the
same way the reference's table grew.
"""

from __future__ import annotations

import string

#: URI prefix -> CURIE namespace (fieldnames.py:20-49).
NAMESPACES: dict[str, str] = {
    "http://rs.tdwg.org/dwc/terms/": "dwc",
    "http://purl.org/dc/terms/": "dcterms",
    "http://purl.org/dc/elements/1.1/": "dc",
    "http://rs.tdwg.org/ac/terms/": "ac",
    "http://ns.adobe.com/xap/1.0/rights/": "xmpRights",
    "http://ns.adobe.com/xap/1.0/": "xmp",
    "http://iptc.org/std/Iptc4xmpExt/1.0/xmlns/": "Iptc4xmpExt",
    "http://iptc.org/std/Iptc4xmpExt/2008-02-29/": "Iptc4xmpExt",
    "http://portal.idigbio.org/terms/": "idigbio",
    "http://symbiota.org/terms/": "symbiota",
    "https://symbiota.org/terms/": "symbiota",
    "http://www.w3.org/2003/01/geo/wgs84_pos#": "wgs84_pos",
    "http://rs.gbif.org/terms/1.0/": "gbif",
    "http://ns.adobe.com/photoshop/1.0/": "photoshop",
    "http://ns.adobe.com/exif/1.0/": "exif",
    "http://purl.org/NET/aec/": "aec",
    "http://rs.tdwg.org/abcd/terms/": "abcd",
    "http://data.ggbn.org/schemas/ggbn/terms/": "ggbn",
    "http://rs.iobis.org/obis/terms/": "obis",
    "http://rs.tdwg.org/chrono/terms/": "chrono",
}

#: CURIE -> URI (first URI wins for aliased prefixes, with the explicit
#: overrides the reference pins, fieldnames.py:51-58).
NAMESPACES_REV: dict[str, str] = {}
for _uri, _pre in NAMESPACES.items():
    NAMESPACES_REV.setdefault(_pre, _uri)
NAMESPACES_REV["Iptc4xmpExt"] = "http://iptc.org/std/Iptc4xmpExt/2008-02-29/"

#: DwC class for unknown fields (fieldnames.py get_canonical_name).
UNKNOWN_CLASS = "Unknown"

#: Row-type URI -> the engine's record type.
ROWTYPE_TO_TYPE = {
    "http://rs.tdwg.org/dwc/terms/Occurrence": "records",
    "http://rs.tdwg.org/ac/terms/multimedia": "mediarecords",
    "http://rs.gbif.org/terms/1.0/Multimedia": "mediarecords",
    "http://rs.tdwg.org/dwc/terms/Location": "uniquelocality",
    "http://rs.tdwg.org/dwc/terms/Taxon": "uniquenames",
}

_DWC_OCCURRENCE_TERMS = [
    "occurrenceID", "catalogNumber", "recordNumber", "recordedBy",
    "individualCount", "sex", "lifeStage", "establishmentMeans",
    "preparations", "basisOfRecord", "scientificName", "kingdom", "phylum",
    "class", "order", "family", "genus", "specificEpithet",
    "infraspecificEpithet", "taxonRank", "vernacularName", "continent",
    "country", "countryCode", "stateProvince", "county", "municipality",
    "locality", "verbatimLocality", "decimalLatitude", "decimalLongitude",
    "geodeticDatum", "coordinateUncertaintyInMeters", "verbatimLatitude",
    "verbatimLongitude", "eventDate", "year", "month", "day",
    "startDayOfYear", "verbatimEventDate", "habitat", "fieldNumber",
    "eventRemarks", "minimumElevationInMeters", "maximumElevationInMeters",
    "verbatimElevation", "minimumDepthInMeters", "maximumDepthInMeters",
    "verbatimDepth", "institutionCode", "collectionCode", "datasetName",
    "occurrenceRemarks", "associatedMedia", "associatedSequences",
    "associatedTaxa", "typeStatus", "waterBody", "island", "islandGroup",
    "bed", "formation", "group", "member", "earliestAgeOrLowestStage",
    "latestAgeOrHighestStage", "earliestEonOrLowestEonothem",
    "latestEonOrHighestEonothem", "earliestEpochOrLowestSeries",
    "latestEpochOrHighestSeries", "earliestEraOrLowestErathem",
    "latestEraOrHighestErathem", "earliestPeriodOrLowestSystem",
    "latestPeriodOrHighestSystem",
]

_AC_TERMS = [
    "accessURI", "bestQualityAccessURI", "bestQualityFormat", "caption",
    "comments", "derivedFrom", "licenseLogoURL", "metadataCreator",
    "providerManagedID", "subjectOrientation", "subjectPart", "tag",
    "variant", "associatedSpecimenReference",
]

_DCTERMS = [
    "identifier", "title", "description", "creator", "format", "modified",
    "rights", "license", "type", "source", "language", "references",
    "bibliographicCitation", "accessRights",
]

#: verbatim header (case variants included at lookup time) ->
#: (canonical CURIE term, DwC class term). Identity rows for standard
#: terms plus the common non-standard provider spellings
#: (fieldnames.py types/translate_dict pattern).
TRANSLATE: dict[str, tuple[str, str]] = {}
for _t in _DWC_OCCURRENCE_TERMS:
    TRANSLATE[f"dwc:{_t}"] = (f"dwc:{_t}", "dwc:Occurrence")
    TRANSLATE[_t] = (f"dwc:{_t}", "dwc:Occurrence")
    TRANSLATE[_t.lower()] = (f"dwc:{_t}", "dwc:Occurrence")
for _t in _AC_TERMS:
    TRANSLATE[f"ac:{_t}"] = (f"ac:{_t}", "ac:Multimedia")
for _t in _DCTERMS:
    TRANSLATE[f"dcterms:{_t}"] = (f"dcterms:{_t}", "dcterms:RightsStatement")
    TRANSLATE[f"dc:{_t}"] = (f"dc:{_t}", "dcterms:RightsStatement")
TRANSLATE.update(
    {
        "id": ("id", "dwc:Occurrence"),
        "coreid": ("coreid", "Unknown"),
        # common provider spellings (translate_dict style)
        "MonthCollected": ("dwc:month", "dwc:Occurrence"),
        "DayCollected": ("dwc:day", "dwc:Occurrence"),
        "YearCollected": ("dwc:year", "dwc:Occurrence"),
        "Collector": ("dwc:recordedBy", "dwc:Occurrence"),
        "CollectorNumber": ("dwc:recordNumber", "dwc:Occurrence"),
        "Latitude": ("dwc:decimalLatitude", "dwc:Occurrence"),
        "Longitude": ("dwc:decimalLongitude", "dwc:Occurrence"),
        "ScientificName": ("dwc:scientificName", "dwc:Occurrence"),
        "Species": ("dwc:specificEpithet", "dwc:Occurrence"),
        "Genus": ("dwc:genus", "dwc:Occurrence"),
        "Country": ("dwc:country", "dwc:Occurrence"),
        "State": ("dwc:stateProvince", "dwc:Occurrence"),
        "County": ("dwc:county", "dwc:Occurrence"),
        "Locality": ("dwc:locality", "dwc:Occurrence"),
    }
)


def uri_to_curie(term_uri: str) -> str:
    """Term URI -> CURIE (``http://rs.tdwg.org/dwc/terms/genus`` ->
    ``dwc:genus``); unknown namespaces fall back to the munged
    ``hostname-fragment:local-name`` form (index_helper.py:73-95)."""
    for uri, prefix in NAMESPACES.items():
        if term_uri.startswith(uri):
            return f"{prefix}:{term_uri[len(uri):]}"
    if "/" in term_uri or "#" in term_uri:
        sep = "#" if "#" in term_uri else "/"
        base, local = term_uri.rsplit(sep, 1)
        host = base.split("//")[-1].split("/")[0]
        parts = host.split(".")
        prefix = parts[-2] if len(parts) >= 2 else host
        return f"{prefix}:{local}"
    return term_uri


def curie_to_uri(term: str) -> str:
    """CURIE -> namespace URI + local name (meta_xml.py:41-44)."""
    if ":" in term:
        prefix, local = term.split(":", 1)
        if prefix in NAMESPACES_REV:
            return NAMESPACES_REV[prefix] + local
    return term


def get_canonical_name(field: str) -> tuple[str, str]:
    """Verbatim header or URI -> (canonical CURIE, DwC class); strips
    non-printable chars first (fieldnames.py:594-631)."""
    f = "".join(ch for ch in field if ch in string.printable).strip()
    if f.startswith("http://") or f.startswith("https://"):
        f = uri_to_curie(f)
    if f in TRANSLATE:
        return TRANSLATE[f]
    base = f.split(":", 1)[-1]
    if base in TRANSLATE:
        return TRANSLATE[base]
    if base.lower() in TRANSLATE:
        return TRANSLATE[base.lower()]
    return (f, UNKNOWN_CLASS)


def infer_row_type(terms: list[str]) -> str:
    """Majority-class vote over canonicalized columns when the row type is
    unspecified (delimited.py:171-208)."""
    from collections import Counter

    votes = Counter(
        get_canonical_name(t)[1] for t in terms if get_canonical_name(t)[1] != UNKNOWN_CLASS
    )
    if not votes:
        return "dwc:Occurrence"
    return votes.most_common(1)[0][0]
