"""S4 — EML (Ecological Metadata Language) recordset-metadata parser
(reference idigbio_ingestion/lib/eml.py:13-172).

EML documents are small per-recordset XML files — driver-side parsing is
the right scale decision (the reference agrees: plain pyquery, no
streaming). Extracted shape mirrors the reference's dict: collection
name/description, contacts with roles, and the rights/license text.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(root, name: str):
    return [el for el in root.iter() if _local(el.tag) == name]


def _first_text(root, name: str) -> str | None:
    for el in _find_all(root, name):
        text = "".join(el.itertext()).strip()
        if text:
            return text
    return None


def _contact_from(el, role: str) -> dict:
    def sub(name):
        for c in el.iter():
            if _local(c.tag) == name and c.text and c.text.strip():
                return c.text.strip()
        return None

    return {
        "first_name": sub("givenName"),
        "last_name": sub("surName"),
        "email": sub("electronicMailAddress"),
        "role": role,
    }


def parse_eml(xml_bytes: bytes | str) -> dict:
    """EML -> recordset metadata dict (eml.py:13-172 shape):
    ``collection_name``, ``collection_description``, ``data_rights``,
    ``contacts`` (creator/metadataProvider/contact/associatedParty with
    their stated roles)."""
    if isinstance(xml_bytes, str):
        xml_bytes = xml_bytes.encode("utf-8")
    root = ET.fromstring(xml_bytes)

    out: dict = {
        "collection_name": _first_text(root, "title"),
        "collection_description": None,
        "data_rights": None,
        "contacts": [],
    }

    for ds in _find_all(root, "dataset"):
        for abstract in _find_all(ds, "abstract"):
            text = " ".join(
                " ".join(p.itertext()).strip() for p in abstract
            ).strip() or "".join(abstract.itertext()).strip()
            if text:
                out["collection_description"] = text
                break
        break

    for ipr in _find_all(root, "intellectualRights"):
        # license URL preferred over prose (eml.py rights canonicalization)
        url = _first_text(ipr, "url")
        out["data_rights"] = url or "".join(ipr.itertext()).strip() or None
        break
    # r9 — the reference NEVER emits the raw rights text: it folds
    # through acceptable_licenses_trans and lands on one of the two
    # sentinel strings otherwise (eml.py:102-111). Same table
    # (data.licenses.LICENSE_TRANS), same sentinels.
    from idb_backend_spark.data.licenses import LICENSE_TRANS

    rights = out["data_rights"]
    if rights is None:
        out["data_rights"] = "No license, assume Public Domain"
    else:
        out["data_rights"] = LICENSE_TRANS.get(
            rights, "Unknown License, assume Public Domain"
        )

    seen = set()
    for role_tag in ("creator", "metadataProvider", "contact", "associatedParty"):
        for el in _find_all(root, role_tag):
            role = _first_text(el, "role") or role_tag
            c = _contact_from(el, role)
            key = (c["first_name"], c["last_name"], c["email"], c["role"])
            if any(v for v in key[:3]) and key not in seen:
                seen.add(key)
                out["contacts"].append(c)

    return out
