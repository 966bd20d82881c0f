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
        entries.append(FeedEntry(title, link, pub_date, guid, eml_link=eml))
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
