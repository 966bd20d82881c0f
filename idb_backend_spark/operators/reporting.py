"""Reporting dataflows — the reference's ad-hoc analytics scripts
(idb/reporting/) re-expressed as DataFrame operators.

Four reports exist upstream, each a hand-rolled ES/SQL aggregation:

* ``dq_flags.py`` — per-recordset data-quality report: flag-frequency
  vector + dqs stats per recordset, with a global header row.
* ``dq_stats.py`` — global field-coverage and flag-rate ratios.
* ``modelable_taxonids.py`` — taxa with enough well-formed records to
  model: per-taxonid count + majority canonical name.
* ``stats_by_rs.py`` — per-recordset search-query report over the
  usage-stats store, with a query-DSL humanizer.

All are single-pass aggregations here; the reference's terms-agg size
truncations (500 recordsets / 200 flags / 200k taxa) are documented
divergences — the engine computes exact, truncation UNDERCOUNTS.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_flags_report(
    records: DataFrame,
    rs_col: str = "recordset",
    flags_col: str = "flags",
    dqs_col: str = "dqs",
) -> tuple[DataFrame, DataFrame]:
    """idb/reporting/dq_flags.py — per-recordset flag frequencies and
    dqs stats, plus the global ("all idigbio") row.

    Returns ``(per_rs, global_row)``: per_rs carries recordset,
    rs_count, max/min/avg dqs and a flag->count map; global_row the
    same shape with a NULL recordset. The reference renders flag COLUMNS
    ordered by GLOBAL frequency (count desc, then key asc — the ES
    terms order its ``flag_names`` list inherits, :83-88) with
    per-recordset gaps as 0 (:98-101); use ``flag_order`` on the global
    map for that column order. Its per-recordset lookup
    ``rsp[rs["key"]]`` is UNGUARDED — a recordset absent from the
    names snapshot crashes the report upstream (:102); joins here drop
    instead, documented.

    One explode + two grouped aggs; the flags array is short (bounded
    by the flag vocabulary), so the explode multiplies rows by ~the
    mean flag count, not unboundedly."""
    per_rs_stats = records.groupBy(F.col(rs_col).alias("recordset")).agg(
        F.count(F.lit(1)).alias("rs_count"),
        F.max(dqs_col).alias("max_dqs"),
        F.min(dqs_col).alias("min_dqs"),
        F.avg(dqs_col).alias("average_dqs"),
    )
    fl = records.select(
        F.col(rs_col).alias("recordset"),
        F.explode(flags_col).alias("flag"),
    )
    per_rs_flags = (
        fl.groupBy("recordset", "flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("recordset")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("flag", "n")))
            ).alias("flag_counts")
        )
    )
    per_rs = per_rs_stats.join(per_rs_flags, "recordset", "left")

    global_row = records.agg(
        F.lit(None).cast("string").alias("recordset"),
        F.count(F.lit(1)).alias("rs_count"),
        F.max(dqs_col).alias("max_dqs"),
        F.min(dqs_col).alias("min_dqs"),
        F.avg(dqs_col).alias("average_dqs"),
    ).join(
        fl.groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("flag", "n")))
            ).alias("flag_counts")
        )
    )
    return per_rs, global_row


def flag_order(flag_counts: dict) -> list[str]:
    """The report's column order for a flag->count map: count desc,
    key asc — the ES terms-agg order dq_flags.py's header inherits."""
    return [k for k, _ in sorted(flag_counts.items(), key=lambda kv: (-kv[1], kv[0]))]


def dq_coverage(records: DataFrame) -> DataFrame:
    """idb/reporting/dq_stats.py — one global row of coverage ratios:
    total records, and the fractions with a countrycode / kingdom /
    phylum present plus the dwc_kingdom_added / dwc_phylum_added flag
    rates (the crossfill-effectiveness metrics). Conditional aggregates
    in one pass — the reference runs six separate ES filter aggs over
    the same index."""
    t = F.count(F.lit(1)).cast("double")

    def frac(cond: Column) -> Column:
        return F.count(F.when(cond, 1)) / t

    return records.agg(
        F.count(F.lit(1)).alias("total"),
        frac(F.col("kingdom").isNotNull()).alias("kingdom_coverage"),
        frac(F.array_contains("flags", "dwc_kingdom_added")).alias(
            "kingdom_added_rate"
        ),
        frac(F.col("phylum").isNotNull()).alias("phylum_coverage"),
        frac(F.array_contains("flags", "dwc_phylum_added")).alias(
            "phylum_added_rate"
        ),
        frac(F.col("countrycode").isNotNull()).alias("countrycode_coverage"),
    )


def modelable_taxa(
    records: DataFrame, min_docs: int = 20
) -> DataFrame:
    """idb/reporting/modelable_taxonids.py — taxa with enough
    well-formed records to model: records carrying geopoint AND taxonid
    AND canonicalname, grouped by taxonid, kept at >= min_docs (the ES
    ``min_doc_count: 20``), each with its MAJORITY canonical name (the
    ``cn.buckets[0]`` pick — count desc, term asc on ties, the A11
    majority-vote kernel). Ordered by count desc like the terms agg the
    report iterates; the reference truncates at size=200000 — exact
    here."""
    g = records.filter(
        F.col("geopoint").isNotNull()
        & F.col("taxonid").isNotNull()
        & F.col("canonicalname").isNotNull()
    )
    fine = g.groupBy("taxonid", "canonicalname").agg(
        F.count(F.lit(1)).alias("__n")
    )
    per_taxon = fine.groupBy("taxonid").agg(
        F.sum("__n").alias("doc_count"),
        F.min_by(
            F.col("canonicalname"),
            F.struct((-F.col("__n")).alias("nc"), F.col("canonicalname").alias("k")),
        ).alias("canonicalname"),
    )
    return (
        per_taxon.filter(F.col("doc_count") >= min_docs)
        .orderBy(F.desc("doc_count"), "taxonid")
    )


def search_queries_report(
    stats: DataFrame,
    queries: DataFrame,
    recordset: str,
) -> DataFrame:
    """idb/reporting/stats_by_rs.py:61-69 — per-recordset search-query
    counts: the stats ⨝ queries join (J8) filtered to
    ``type='search'`` events whose payload carries the recordset key
    (the SQL ``payload ? %s`` jsonb operator — here a map key probe),
    grouped by query, ordered by count ASCENDING (the reference's bare
    ``order by count(*)`` — rarest first, a quirk the TSV inherits)."""
    hits = stats.filter(
        (F.col("type") == "search")
        & F.col("payload").getItem(recordset).isNotNull()
    )
    return (
        hits.join(queries, hits["query_id"] == queries["id"])
        .groupBy("id", "query")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("count", "id")
    )


#: stats_by_rs.py:10-20 — the taxon report filter vocabulary.
TAXON_FILTER_TERMS = (
    "kingdom", "phylum", "class", "order", "family",
    "genus", "specificepithet", "scientificname",
)


def query_matches_filter(query_text: str, terms=TAXON_FILTER_TERMS) -> bool:
    """stats_by_rs.py:76-80 — the report keeps a query when any filter
    term appears as a SUBSTRING of the raw query JSON (``t in
    r["query"]``): 'kingdom' also matches a query on 'subkingdom', and
    a VALUE containing 'genus' matches too — text probing, not DSL
    parsing, preserved as-is."""
    return any(t in query_text for t in terms)


def render_query_text(query_json: str) -> str:
    """stats_by_rs.py:22-58 format_row's query humanizer, exactly:
    fulltext renders first; each and-block member renders k=v for
    term/terms (terms DELETES its ``execution`` key first, then takes
    the single remaining key), 'k is present/absent' for
    exists/missing, raw JSON for anything else; an empty render falls
    back to the RAW query string; a trailing ', ' is trimmed."""

    def get_path(path, d):
        r = d
        try:
            for k in path:
                r = r[k]
        except (KeyError, IndexError, TypeError):
            return None
        return r

    q_o = json.loads(query_json)
    qt = ""
    ft = get_path(["filtered", "query", "match", "_all", "query"], q_o)
    if ft is not None:
        qt += "Full Text: {0}, ".format(ft)
    and_block = get_path(["filtered", "filter", "and"], q_o)
    if and_block is not None:
        for b in and_block:
            if "term" in b:
                k = list(b["term"].keys())[0]
                qt += "{0}={1}, ".format(k, b["term"][k])
            elif "terms" in b:
                del b["terms"]["execution"]
                k = list(b["terms"].keys())[0]
                qt += "{0}={1}, ".format(k, b["terms"][k])
            elif "exists" in b:
                qt += "{0} is present, ".format(b["exists"]["field"])
            elif "missing" in b:
                qt += "{0} is absent, ".format(b["missing"]["field"])
            else:
                qt += json.dumps(b) + ", "
    if qt == "":
        qt = query_json
    elif qt.endswith(", "):
        qt = qt[:-2]
    return qt
