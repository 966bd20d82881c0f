"""Reporting dataflows (operators/reporting.py) — golden pins against
idb/reporting/{dq_flags,dq_stats,modelable_taxonids,stats_by_rs}.py.
"""

from __future__ import annotations

import pytest

from idb_backend_spark.operators import reporting as R


def test_dq_flags_report(spark):
    recs = spark.createDataFrame(
        [
            ("rs1", ["geopoint_0_coord"], 0.5),
            ("rs1", ["geopoint_0_coord", "datecollected_bounds"], -0.25),
            ("rs2", [], 0.9),
        ],
        "recordset string, flags array<string>, dqs double",
    )
    per_rs, global_row = R.dq_flags_report(recs)
    rows = {r["recordset"]: r for r in per_rs.collect()}
    assert rows["rs1"]["rs_count"] == 2
    assert rows["rs1"]["min_dqs"] == -0.25  # dqs is UNCLAMPED (F18)
    assert rows["rs1"]["flag_counts"] == {
        "geopoint_0_coord": 2,
        "datecollected_bounds": 1,
    }
    assert rows["rs2"]["flag_counts"] is None  # no flags at all
    g = global_row.collect()[0]
    assert g["recordset"] is None and g["rs_count"] == 3
    assert g["flag_counts"] == {
        "geopoint_0_coord": 2,
        "datecollected_bounds": 1,
    }
    # column order: count desc then key asc (the ES terms order the
    # reference's flag_names header inherits)
    assert R.flag_order(
        {"b": 2, "a": 2, "c": 5}
    ) == ["c", "a", "b"]


def test_dq_coverage(spark):
    recs = spark.createDataFrame(
        [
            ("Plantae", "Tracheophyta", "US", ["dwc_kingdom_added"]),
            ("Animalia", None, None, []),
            (None, None, "DE", ["dwc_phylum_added"]),
            (None, None, None, []),
        ],
        "kingdom string, phylum string, countrycode string, flags array<string>",
    )
    g = R.dq_coverage(recs).collect()[0]
    assert g["total"] == 4
    assert g["kingdom_coverage"] == 0.5
    assert g["kingdom_added_rate"] == 0.25
    assert g["phylum_coverage"] == 0.25
    assert g["phylum_added_rate"] == 0.25
    assert g["countrycode_coverage"] == 0.5


def test_modelable_taxa(spark):
    rows = []
    # taxon 1: 20 docs (exactly min_doc_count -> kept), names 11 'b' vs 9 'a'
    rows += [(1, "b", (1.0, 2.0))] * 11 + [(1, "a", (1.0, 2.0))] * 9
    # taxon 2: 19 docs -> dropped (>= 20 gate)
    rows += [(2, "x", (1.0, 2.0))] * 19
    # taxon 3: 25 docs, name tie 12/12 + 1 null-geopoint row that must
    # NOT count (exists gate); tie -> term asc
    rows += [(3, "zz", (1.0, 2.0))] * 12 + [(3, "aa", (1.0, 2.0))] * 12
    rows += [(3, "zz", None)]
    # missing taxonid / canonicalname rows are invisible
    rows += [(None, "q", (1.0, 2.0)), (4, None, (1.0, 2.0))]
    df = spark.createDataFrame(
        rows,
        "taxonid int, canonicalname string, geopoint struct<lat:double,lon:double>",
    )
    got = [(r["taxonid"], r["doc_count"], r["canonicalname"])
           for r in R.modelable_taxa(df).collect()]
    assert got == [(3, 24, "aa"), (1, 20, "b")]


def test_search_queries_report(spark):
    stats = spark.createDataFrame(
        [
            ("search", {"rs1": 3}, 1),
            ("search", {"rs1": 1}, 1),
            ("search", {"rs1": 1}, 2),
            ("search", {"rs2": 1}, 1),   # other recordset: out
            ("view", {"rs1": 1}, 1),     # not a search: out
        ],
        "type string, payload map<string,int>, query_id int",
    )
    queries = spark.createDataFrame(
        [(1, '{"q":1}'), (2, '{"q":2}')], "id int, query string"
    )
    got = [(r["id"], r["count"]) for r in
           R.search_queries_report(stats, queries, "rs1").collect()]
    # count ASCENDING (the reference's bare `order by count(*)`)
    assert got == [(2, 1), (1, 2)]


def test_query_filter_is_substring_probe():
    # 'kingdom' matches 'subkingdom' — text probing, not DSL parsing
    assert R.query_matches_filter('{"subkingdom": "x"}')
    assert R.query_matches_filter('{"genus": "acer"}')
    assert not R.query_matches_filter('{"country": "US"}')


@pytest.mark.parametrize(
    "q,expect",
    [
        # fulltext + term + exists/missing
        (
            '{"filtered": {"query": {"match": {"_all": {"query": "acer",'
            ' "operator": "and"}}}, "filter": {"and": ['
            '{"term": {"genus": "acer"}},'
            '{"exists": {"field": "geopoint"}},'
            '{"missing": {"field": "scientificname"}}]}}}',
            "Full Text: acer, genus=acer, geopoint is present, "
            "scientificname is absent",
        ),
        # terms deletes its execution key, then takes the remaining key
        (
            '{"filtered": {"filter": {"and": [{"terms": '
            '{"execution": "or", "country": ["US", "DE"]}}]}}}',
            "country=['US', 'DE']",
        ),
        # unknown block renders as raw JSON
        (
            '{"filtered": {"filter": {"and": [{"range": {"dqs": {"gte": 0}}}]}}}',
            '{"range": {"dqs": {"gte": 0}}}',
        ),
        # nothing renders -> the RAW query string comes back
        ('{"other": 1}', '{"other": 1}'),
    ],
)
def test_render_query_text(q, expect):
    assert R.render_query_text(q) == expect
