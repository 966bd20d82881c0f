"""S5 — publisher RSS/Atom feed harvesting (driver-side orchestration)
(reference idigbio_ingestion/update_publisher_recordset.py:98-198).

The reference polls publisher feeds, diffs pubDate/etag per entry, and
registers recordsets for archive download. Feed parsing is driver-side
metadata work (feeds are KB-sized); the engine's contribution is the
diff against the recordset registry, which is a DataFrame anti-join when
the registry is large.

Network fetch is the caller's concern (no network in this container);
``parse_feed`` takes bytes.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


@dataclass
class FeedEntry:
    title: str | None
    link: str | None
    pub_date: str | None
    guid: str | None
    eml_link: str | None = None
    dwca_link: str | None = None  # <ipt:dwca> archive link
    emllink: str | None = None  # legacy <emllink> element
    collid: str | None = None  # Symbiota collection id


def parse_feed(xml_bytes: bytes | str) -> list[FeedEntry]:
    """RSS 2.0 / Atom entries -> FeedEntry list (get_feed,
    update_publisher_recordset.py:98-141): title, archive link, pubDate,
    guid/id, and the ipt:eml sibling link when present."""
    if isinstance(xml_bytes, str):
        xml_bytes = xml_bytes.encode("utf-8")
    root = ET.fromstring(xml_bytes)
    entries = []
    for item in root.iter():
        if _local(item.tag) not in ("item", "entry"):
            continue
        title = link = pub_date = guid = eml = None
        dwca = emllink = collid = None
        for c in item:
            tag = _local(c.tag)
            text = (c.text or "").strip() or None
            if tag == "title":
                title = text
            elif tag == "link":
                # Atom: <link href=.../>; RSS: <link>text</link>. Among
                # multiple Atom links, the archive is the rel-less or
                # rel='alternate' one — a trailing rel='self'/'enclosure'
                # must not overwrite it (last-wins pointed the harvester
                # at the feed entry itself)
                rel = c.get("rel")
                if link is None or rel in (None, "alternate"):
                    link = c.get("href") or text or link
            elif tag == "updated":
                # Atom: <updated> moves on revision while <published> is
                # immutable — keeping the first-seen date silently missed
                # every revision of an entry carrying both
                pub_date = text or pub_date
            elif tag in ("pubDate", "published"):
                pub_date = pub_date or text
            elif tag in ("guid", "id"):
                guid = text
            elif tag == "eml":
                eml = text or c.get("href")
            elif tag == "dwca":
                dwca = text or c.get("href")
            elif tag == "emllink":
                emllink = text
            elif tag == "collid":
                collid = text
        entries.append(
            FeedEntry(
                title, link, pub_date, guid,
                eml_link=eml, dwca_link=dwca, emllink=emllink, collid=collid,
            )
        )
    return entries


def diff_feed_against_registry(
    entries: list[FeedEntry], registry: dict[str, str | None]
) -> tuple[list[FeedEntry], list[FeedEntry]]:
    """(new, updated): entries absent from the registry, and entries whose
    pubDate moved past the registered one (update_db_from_rss,
    update_publisher_recordset.py:155-198). ``registry`` maps
    guid-or-link -> last seen pubDate."""
    new, updated = [], []
    for e in entries:
        key = e.guid or e.link
        if key is None:
            continue
        if key not in registry:
            new.append(e)
        elif e.pub_date and registry[key] != e.pub_date:
            updated.append(e)
    return new, updated


_IPT_VERSION_SUFFIX = re.compile(r"^(.*)/v[0-9]*(\.)?[0-9]*$")


def recordid_for_entry(portal_url: str, entry: FeedEntry) -> str | None:
    """The reference's id_func verbatim
    (update_publisher_recordset.py:61-95): the entry's guid/id wins;
    a Symbiota entry with no id but a <collid> builds
    ``<portal_url>collections/misc/collprofiles.php?collid=<id>``
    (portal_url concatenated AS GIVEN — no slash inserted). The IPT
    version suffix is stripped with ``^(.*)/v[0-9]*(\\.)?[0-9]*$``,
    whose quirks are kept: a bare trailing ``/v`` matches (both digit
    runs may be empty), but a two-dot version like ``/v1.2.3`` does
    NOT. The result is lowercased."""
    rid = entry.guid
    if rid is None and entry.collid is not None:
        rid = (
            f"{portal_url}collections/misc/collprofiles.php"
            f"?collid={entry.collid}"
        )
    if rid is not None:
        m = _IPT_VERSION_SUFFIX.search(rid)
        if m is not None:
            rid = m.group(1)
        rid = rid.lower()
    return rid


def file_link_for(entry: FeedEntry, existing: str | None = None) -> str | None:
    """Archive-link precedence (update_publisher_recordset.py:284-290):
    ``ipt:dwca`` first, then the plain ``link``, else the registered
    recordset's existing file_link."""
    if entry.dwca_link is not None:
        return entry.dwca_link
    if entry.link is not None:
        return entry.link
    return existing


def eml_link_for(entry: FeedEntry, existing: str | None = None) -> str | None:
    """EML-link precedence (update_publisher_recordset.py:277-282):
    ``ipt:eml`` first, then the legacy ``<emllink>``, else the
    registered recordset's existing eml_link."""
    if entry.eml_link is not None:
        return entry.eml_link
    if entry.emllink is not None:
        return entry.emllink
    return existing


def clamp_pub_date(date, now):
    """The anti-race clamp (update_publisher_recordset.py:272-275): a
    missing pub date OR one in the FUTURE becomes now-minus-15-minutes —
    a publisher with a skewed clock must not produce an entry that
    forever sorts as newest."""
    import datetime as _dt

    if date is None or date > now:
        return now - _dt.timedelta(minutes=15)
    return date


def eml_harvest_eligible(now=None):
    """Recordset-eligibility predicate for the EML harvest sweep
    (update_publisher_recordset.py:449-455): eml_link present, ingest
    on, pub_date strictly in the past, and never-harvested OR harvested
    before the current pub_date. Column expression over a recordsets
    frame (columns eml_link, ingest, pub_date, eml_harvest_date)."""
    from pyspark.sql import functions as F

    now_col = F.lit(now) if now is not None else F.current_timestamp()
    return (
        F.col("eml_link").isNotNull()
        & F.col("ingest")
        & (F.col("pub_date") < now_col)
        & (
            F.col("eml_harvest_date").isNull()
            | (F.col("eml_harvest_date") < F.col("pub_date"))
        )
    )


def file_harvest_eligible(now=None):
    """File-harvest eligibility (update_publisher_recordset.py:501-507)
    — same shape as the EML sweep plus ``uuid IS NOT NULL``: the
    asymmetry is the reference's (the EML pass derives a uuid via
    get_uuid when missing, the FILE pass refuses such rows)."""
    from pyspark.sql import functions as F

    now_col = F.lit(now) if now is not None else F.current_timestamp()
    return (
        F.col("file_link").isNotNull()
        & F.col("uuid").isNotNull()
        & F.col("ingest")
        & (F.col("pub_date") < now_col)
        & (
            F.col("file_harvest_date").isNull()
            | (F.col("file_harvest_date") < F.col("pub_date"))
        )
    )
