"""S5 feed harvesting, skew-salted aggregation, and partition-pruning
verification for the type-partitioned store layout (X2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from idb_backend_spark.operators import skew
from idb_backend_spark.sources.rss import diff_feed_against_registry, parse_feed

RSS = b"""<?xml version="1.0"?>
<rss version="2.0" xmlns:ipt="http://ipt.gbif.org/">
  <channel>
    <title>Publisher feed</title>
    <item>
      <title>Recordset One</title>
      <link>http://pub.example.org/archive/one.zip</link>
      <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
      <guid>urn:rs:one</guid>
      <ipt:eml>http://pub.example.org/eml/one.xml</ipt:eml>
    </item>
    <item>
      <title>Recordset Two</title>
      <link>http://pub.example.org/archive/two.zip</link>
      <pubDate>Tue, 02 Jan 2024 00:00:00 GMT</pubDate>
      <guid>urn:rs:two</guid>
    </item>
  </channel>
</rss>
"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <entry>
    <title>Atom Set</title>
    <link href="http://pub.example.org/a.zip"/>
    <updated>2024-03-01T00:00:00Z</updated>
    <id>urn:rs:atom</id>
  </entry>
</feed>
"""


def test_parse_rss_and_atom():
    entries = parse_feed(RSS)
    assert len(entries) == 2
    assert entries[0].title == "Recordset One"
    assert entries[0].link == "http://pub.example.org/archive/one.zip"
    assert entries[0].guid == "urn:rs:one"
    assert entries[0].eml_link == "http://pub.example.org/eml/one.xml"
    atom = parse_feed(ATOM)
    assert atom[0].link == "http://pub.example.org/a.zip"
    assert atom[0].guid == "urn:rs:atom"
    assert atom[0].pub_date == "2024-03-01T00:00:00Z"


def test_feed_diff():
    entries = parse_feed(RSS)
    registry = {"urn:rs:one": "Mon, 01 Jan 2024 00:00:00 GMT"}
    new, updated = diff_feed_against_registry(entries, registry)
    assert [e.guid for e in new] == ["urn:rs:two"]
    assert updated == []
    registry["urn:rs:one"] = "Sun, 31 Dec 2023 00:00:00 GMT"
    _, updated = diff_feed_against_registry(entries, registry)
    assert [e.guid for e in updated] == ["urn:rs:one"]


def test_salted_count_matches_plain(spark):
    # skewed: one key owns 90% of rows
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("key")
    )
    plain = {r["key"]: r["count"] for r in
             df.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in
              skew.salted_count(df, ["key"], n_salts=8).collect()}
    assert salted == plain


def test_salted_agg_sum_min(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    out = {
        r["k"]: (r["total"], r["lo"])
        for r in skew.salted_agg(
            df, ["k"],
            partial_aggs=[F.sum("v").alias("__s"), F.min("v").alias("__m")],
            final_aggs=[F.sum("__s").alias("total"), F.min("__m").alias("lo")],
            n_salts=4,
        ).collect()
    }
    expect = {
        r["k"]: (r["total"], r["lo"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.min("v").alias("lo"))
        .collect()
    }
    assert out == expect


def test_replicate_broadcast_join(spark):
    skewed = spark.range(0, 5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([("hot", "dim")], "k string, label string")
    out = skew.replicate_broadcast_join(skewed, small, "k", n_salts=4)
    assert out.count() == 5000
    assert out.select("label").distinct().first()["label"] == "dim"


def test_store_partition_pruning(spark, tmp_path):
    """X2 — the history table partitioned by type must prune at scan time."""
    import datetime

    hist = spark.createDataFrame(
        [
            ("a", "records", "e1", 0, datetime.datetime(2024, 1, 1), "d"),
            ("m", "mediarecords", "e2", 0, datetime.datetime(2024, 1, 1), "d"),
        ],
        "uuid string, type string, etag string, version int, "
        "modified timestamp, data string",
    )
    path = str(tmp_path / "store")
    hist.write.partitionBy("type").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("type") == "records")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(type" in plan
    assert scan.count() == 1


def test_with_salt_spreads_only_with_row_distinct_columns(spark):
    """The salt is a pure function of the row's columns. With a
    row-distinct column present, a hot key's rows fan out across lanes;
    projected down to the key alone, every row of a key hashes to ONE
    salt and the spread silently degenerates — the trap with_salt's
    docstring warns about (and salted_skew_agg avoids by keeping the
    order key in the frame)."""
    base = spark.range(0, 2000).select(
        F.lit("hot").alias("key"), F.col("id")
    )
    fanout = (
        skew.with_salt(base, n_salts=16)
        .groupBy("key")
        .agg(F.countDistinct("__salt").alias("lanes"))
        .first()["lanes"]
    )
    assert fanout == 16

    degenerate = (
        skew.with_salt(base.select("key"), n_salts=16)
        .groupBy("key")
        .agg(F.countDistinct("__salt").alias("lanes"))
        .first()["lanes"]
    )
    assert degenerate == 1


def test_recordid_for_entry_reference_id_func():
    """id_func quirks (update_publisher_recordset.py:61-95): guid wins;
    Symbiota collid URL is portal_url-concatenated verbatim; the IPT
    /vN.N suffix strips — including the empty-digit '/v' — but a
    two-dot version does not; result lowercased."""
    from idb_backend_spark.sources.rss import FeedEntry, recordid_for_entry

    def e(**kw):
        base = dict(title=None, link=None, pub_date=None, guid=None)
        base.update(kw)
        return FeedEntry(**base)
    assert recordid_for_entry(
        "http://p/", e(guid="http://IPT.x/resource?r=Fish/v2.1")
    ) == "http://ipt.x/resource?r=fish"
    # both digit runs may be empty: bare '/v' strips too
    assert recordid_for_entry("http://p/", e(guid="X/v")) == "x"
    # two dots do NOT match the suffix regex: id only lowercases
    assert recordid_for_entry(
        "http://p/", e(guid="x/v1.2.3")
    ) == "x/v1.2.3"
    # symbiota collid path, portal_url used verbatim (no slash added)
    assert recordid_for_entry(
        "http://portal.org/", e(collid="5")
    ) == "http://portal.org/collections/misc/collprofiles.php?collid=5"
    assert recordid_for_entry("http://p/", e()) is None


def test_link_precedences_and_date_clamp():
    """ipt:dwca beats link beats existing (upr.py:284-290); ipt:eml
    beats emllink beats existing (:277-282); missing or FUTURE pub
    dates clamp to now-15min (:272-275)."""
    import datetime

    from idb_backend_spark.sources.rss import (
        FeedEntry,
        clamp_pub_date,
        eml_link_for,
        file_link_for,
    )

    e = FeedEntry(title=None, link="http://portal/page", pub_date=None,
                  guid=None, eml_link=None, dwca_link="http://ipt/dwca",
                  emllink="http://legacy/eml")
    assert file_link_for(e, existing="old") == "http://ipt/dwca"
    assert file_link_for(
        FeedEntry(None, "http://portal/page", None, None), existing="old"
    ) == "http://portal/page"
    assert file_link_for(
        FeedEntry(None, None, None, None), existing="old"
    ) == "old"
    assert eml_link_for(e) == "http://legacy/eml"  # no ipt:eml here
    e2 = FeedEntry(None, None, None, None, eml_link="http://ipt/eml",
                   emllink="http://legacy/eml")
    assert eml_link_for(e2) == "http://ipt/eml"

    now = datetime.datetime(2026, 8, 15, 12, 0, 0)
    clamped = now - datetime.timedelta(minutes=15)
    assert clamp_pub_date(None, now) == clamped
    future = now + datetime.timedelta(hours=1)
    assert clamp_pub_date(future, now) == clamped
    past = now - datetime.timedelta(days=2)
    assert clamp_pub_date(past, now) == past


def test_parse_feed_captures_ipt_and_symbiota_fields():
    from idb_backend_spark.sources.rss import parse_feed

    xml = b"""<?xml version="1.0"?>
    <rss version="2.0" xmlns:ipt="http://ipt.gbif.org/">
      <channel><title>t</title>
        <item>
          <title>Fish</title>
          <link>http://portal/page</link>
          <guid>http://ipt/resource?r=fish/v2</guid>
          <ipt:dwca>http://ipt/archive.do?r=fish</ipt:dwca>
          <ipt:eml>http://ipt/eml.do?r=fish</ipt:eml>
          <emllink>http://legacy/eml</emllink>
          <collid>7</collid>
        </item>
      </channel>
    </rss>"""
    (entry,) = parse_feed(xml)
    assert entry.dwca_link == "http://ipt/archive.do?r=fish"
    assert entry.eml_link == "http://ipt/eml.do?r=fish"
    assert entry.emllink == "http://legacy/eml"
    assert entry.collid == "7"


def test_harvest_eligibility_predicates(spark):
    """upr.py:449-455 vs :501-507 — the EML pass derives a missing uuid
    (no uuid requirement); the FILE pass requires uuid NOT NULL. Both
    require ingest, a past pub_date, and never-or-stale harvest date."""
    import datetime

    from pyspark.sql import functions as F

    from idb_backend_spark.sources.rss import (
        eml_harvest_eligible,
        file_harvest_eligible,
    )

    now = datetime.datetime(2026, 8, 15, 12, 0, 0)
    t0 = datetime.datetime(2026, 8, 1)
    t1 = datetime.datetime(2026, 8, 10)
    future = datetime.datetime(2027, 1, 1)
    rows = [
        # id, eml_link, file_link, uuid, ingest, pub_date, eml_hd, file_hd
        (1, "e", "f", None, True, t1, None, None),      # eml yes, file NO (uuid)
        (2, "e", "f", "u", True, t1, t0, t0),           # stale harvest -> both
        (3, "e", "f", "u", True, t1, now, now),         # fresh harvest -> none
        (4, None, "f", "u", True, t1, None, None),      # no eml_link
        (5, "e", "f", "u", False, t1, None, None),      # ingest off
        (6, "e", "f", "u", True, future, None, None),   # future pub_date
    ]
    df = spark.createDataFrame(
        rows,
        "id int, eml_link string, file_link string, uuid string, "
        "ingest boolean, pub_date timestamp, eml_harvest_date timestamp, "
        "file_harvest_date timestamp",
    )
    eml_ids = {
        r["id"] for r in df.filter(eml_harvest_eligible(now)).collect()
    }
    file_ids = {
        r["id"] for r in df.filter(file_harvest_eligible(now)).collect()
    }
    assert eml_ids == {1, 2}
    # row 4 lacks only the eml_link — the FILE pass doesn't care
    assert file_ids == {2, 4}
