"""S3 — field-name registry and term canonicalization
(reference idb/helpers/fieldnames.py).

The registry is public standards data: CURIE namespace prefixes for the
Darwin Core / Dublin Core / Audubon Core term URI families
(fieldnames.py:20-49), the extension row-type registry (:64-86), and the
FULL verbatim-header → canonical-term translate table (:92-589; 496
rows) — all carried in ``idb_backend_spark.data.term_translate``.
"""

from __future__ import annotations

import string

from idb_backend_spark.data.term_translate import (
    NAMESPACES,
    NAMESPACES_REV,
    ROWTYPES,
    TRANSLATE,
)

#: DwC class for unknown fields (fieldnames.py get_canonical_name).
UNKNOWN_CLASS = "Unknown"

#: Row-type URI -> the engine's record type (ingestion routing; the
#: CURIE-level registry for every extension is ``ROWTYPES``).
ROWTYPE_TO_TYPE = {
    "http://rs.tdwg.org/dwc/terms/Occurrence": "records",
    "http://rs.tdwg.org/dwc/terms/occurrence": "records",
    "http://rs.tdwg.org/ac/terms/multimedia": "mediarecords",
    "http://rs.tdwg.org/ac/terms/Multimedia": "mediarecords",
    "http://rs.gbif.org/terms/1.0/Multimedia": "mediarecords",
    "http://rs.gbif.org/terms/1.0/Image": "mediarecords",
    "http://rs.tdwg.org/dwc/terms/Location": "uniquelocality",
    "http://rs.tdwg.org/dwc/terms/Taxon": "uniquenames",
}


def rowtype_shortname(rowtype_uri: str) -> str | None:
    """Extension/core row-type URI -> CURIE shortname (the reference
    `types` registry, fieldnames.py:64-86)."""
    return ROWTYPES.get(rowtype_uri)


#: Engine-local aliases for provider headers the upstream registry does
#: not carry (yet) — layered over the registry, never replacing it, the
#: same way the reference grows its table when a provider sends a new
#: spelling.
EXTRA_TRANSLATE: dict[str, tuple[str | None, str]] = {
    "Latitude": ("dwc:decimalLatitude", "dwc:Occurrence"),
    "Longitude": ("dwc:decimalLongitude", "dwc:Occurrence"),
}

_LOOKUP: dict[str, tuple[str | None, str]] = {**TRANSLATE, **EXTRA_TRANSLATE}
#: case-insensitive fallback map — the lowercased retry in
#: get_canonical_name must probe LOWERCASED registry keys, not the
#: mixed-case originals (comparing lower('CatalogNumber') against the
#: key 'catalogNumber' could never match)
_LOOKUP_LOWER: dict[str, tuple[str | None, str]] = {
    k.lower(): v for k, v in _LOOKUP.items()
}

#: LONGEST namespace first: several registry namespaces nest (the idigbio
#: terms prefix is a proper prefix of its inhs/fcc sub-namespaces), and
#: dict-order matching let the shorter one shadow the longer — 'fcc'
#: term URIs came back as 'idigbio:fcc/...' and missed their TRANSLATE
#: rows entirely
_NAMESPACES_BY_LEN = sorted(
    NAMESPACES.items(), key=lambda kv: len(kv[0]), reverse=True
)


def uri_to_curie(term_uri: str) -> str:
    """Term URI -> CURIE (``http://rs.tdwg.org/dwc/terms/genus`` ->
    ``dwc:genus``); unknown namespaces fall back to the munged
    ``hostname-fragment:local-name`` form (index_helper.py:73-95).

    DOCUMENTED DIVERGENCE (pinned in tests/test_sources_export.py
    ``test_reference_unknown_namespace_term_is_fatal``): the reference's
    DwC-A READER keeps an unknown-namespace term RAW and then raises on
    any dot in it (dwca.py:223-238 — ES field names cannot contain
    dots). Since meta.xml terms are full URIs, the hostname's dots make
    EVERY unknown-namespace term fatal there: one unregistered term
    kills the whole archive ingest. This engine folds such terms to the
    dot-free hostname-fragment CURIE instead (the index_helper munge the
    reference itself uses on the ES side), so the archive ingests and
    the odd term lands in the raw map under a stable name."""
    for uri, prefix in _NAMESPACES_BY_LEN:
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
    """CURIE -> namespace URI + local name (meta_xml.py:41-44).

    Mirrors the reference's ``term.split(":")`` + ``term_a[1]`` exactly:
    a known-prefix term holding MORE than one colon keeps only the
    segment between the first two colons ('dwc:a:b' -> URI + 'a', the
    ':b' tail silently dropped). Unknown prefixes pass through verbatim
    (the raw CURIE becomes the meta.xml term)."""
    parts = term.split(":")
    if len(parts) > 1 and parts[0] in NAMESPACES_REV:
        return NAMESPACES_REV[parts[0]] + parts[1]
    return term


def get_canonical_name(field: str) -> tuple[str | None, str]:
    """Verbatim header or URI -> (canonical CURIE, DwC class); strips
    non-printable chars first (fieldnames.py:594-631). A ``None``
    canonical means the registry marks the field as to-be-dropped
    (provider-internal bookkeeping columns like ``Annotations``).

    Extensions over the reference's exact-match lookup: URI headers fold
    to CURIEs first, and unmatched headers retry namespace-stripped and
    lowercased before degrading to ``(field, Unknown)``."""
    f = "".join(ch for ch in field if ch in string.printable).strip()
    if f.startswith("http://") or f.startswith("https://"):
        f = uri_to_curie(f)
    if f in _LOOKUP:
        return _LOOKUP[f]
    base = f.split(":", 1)[-1]
    if base in _LOOKUP:
        return _LOOKUP[base]
    if base.lower() in _LOOKUP_LOWER:
        return _LOOKUP_LOWER[base.lower()]
    return (f, UNKNOWN_CLASS)


def infer_row_type(terms: list[str]) -> str:
    """Majority-class vote over canonicalized columns when the row type
    is unspecified — the reference's fallback EXACTLY
    (delimited.py:179-204, differential-executed in
    tests/test_delimited_vs_reference.py): every header with a canonical
    name votes its class — INCLUDING ``Unknown`` (get_canonical_name
    never returns a None class; a feed of mostly unregistered columns
    really does get rowtype 'Unknown' there), and ties break by class
    name DESCENDING (``sorted(items, key=(count, name), reverse=True)``,
    :202). Only drop-marked registry columns (canonical None) abstain.
    One divergence kept: zero votes IndexErrors in the reference
    (``items[0]`` on an empty sort); the engine returns the Occurrence
    default — pinned in the differential."""
    from collections import Counter

    votes = Counter(
        cls
        for t in terms
        for canon, cls in (get_canonical_name(t),)
        if canon is not None
    )
    if not votes:
        return "dwc:Occurrence"
    return sorted(
        votes.items(), key=lambda kv: (kv[1], kv[0]), reverse=True
    )[0][0]
