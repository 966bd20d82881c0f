"""Round-4 parity entries: schema-driven typed projection, sketch
verification, streaming execution, and audio derivatives.

These close the carried §2 partials: F2 (schema-table-driven verbatim
projection), the simhash exact-verification sibling, a driver-executed
streaming rollup, and the F25 audio derivative path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from idb_backend_spark.plans.registry import _t, query


# --------------------------------------------------------------------------
# F2 — schema-table-driven verbatim projection + table-driven dqs
# --------------------------------------------------------------------------

#: synthesized raw-record fields keyed by the schema table's rawfield —
#: shared SQL expressions over `customer` evaluated identically by Spark
#: (F.expr) and DuckDB (oracle), so the §1.4 table itself is the only
#: other input to either side. Mixed case / padding exercise the F1
#: lower+trim fold; NULL branches exercise scoring of absent fields.
_RAW_SYNTH: dict[str, str] = {
    "idigbio:uuid": "'urn:uuid:' || c_custkey",
    "idigbio:etag": "'ETAG-' || (c_custkey * 7919 % 104729)",
    "idigbio:recordIds": (
        "'[\"CAT-' || c_custkey || '\",\"urn:x:' || (c_custkey % 100) || '\"]'"
    ),
    "dwc:kingdom": "'Plantae'",
    "dwc:genus": (
        "CASE c_custkey % 3 WHEN 0 THEN 'Acer' WHEN 1 THEN 'QUERCUS' "
        "ELSE 'Pinus  ' END"
    ),
    "dwc:country": "'  United States'",
    "dwc:stateProvince": (
        "CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE 'Florida' END"
    ),
    "dwc:catalogNumber": "'CAT-' || c_custkey",
    "dwc:institutionCode": (
        "CASE WHEN c_custkey % 5 = 0 THEN NULL "
        "ELSE 'INST-' || (c_custkey % 5) END"
    ),
    "dwc:scientificName": (
        "CASE c_custkey % 3 WHEN 0 THEN 'Acer rubrum' "
        "WHEN 1 THEN 'Quercus alba' ELSE 'Pinus taeda' END"
    ),
    "dwc:basisOfRecord": "'PreservedSpecimen'",
    "dwc:recordedBy": "c_name",
    "dwc:typeStatus": "CASE WHEN c_custkey % 7 = 0 THEN 'Holotype' ELSE NULL END",
}

#: the recordids JSON list above, as the expected post-projection joined
#: string (from_json -> element-wise lower/trim -> array_join '|')
_RECORDIDS_JOINED_SQL = "lower('CAT-' || c_custkey || '|urn:x:' || (c_custkey % 100))"


def _typed_projection_oracle() -> str:
    """Generate the DuckDB oracle FROM THE SAME §1.4 table — one output
    column per raw-backed schema row, plus the table-driven dqs."""
    from idb_backend_spark.data.typed_schema import (
        maxscore,
        raw_fields,
        scored_weights,
    )

    weights = scored_weights("records")
    cols = ["c_custkey"]
    score_terms = []
    for name, rawfield, reftype in raw_fields("records"):
        synth = _RAW_SYNTH.get(rawfield)
        if synth is None:
            cols.append(f'CAST(NULL AS VARCHAR) AS "{name}"')
            continue
        if reftype == "list":
            cols.append(f'{_RECORDIDS_JOINED_SQL} AS "{name}"')
        else:
            cols.append(f'lower(trim({synth})) AS "{name}"')
        if name in weights:
            score_terms.append(f"CAST(({synth}) IS NOT NULL AS INT)")
    cols.append("'' AS flags")
    cols.append(
        f"round(({' + '.join(score_terms)}) / {maxscore('records')}, 6) AS dqs"
    )
    return (
        "SELECT " + ", ".join(cols) + " FROM customer ORDER BY c_custkey"
    )


@query("records_typed_projection", _typed_projection_oracle())
def records_typed_projection(spark, sf_dir):
    """F2 + A8 schema-driven — the §1.4 typed-column table
    (data.typed_schema, mirroring conversions.py:35-188) drives BOTH the
    verbatim projection out of the raw `data` map (verbatimGrabber,
    conversions.py:290-294, incl. F1 lower/trim fold and list parsing)
    and the dqs weights/maxscore (conversions.py:218-224, :264-271).
    The oracle SQL is generated from the same table — a change to the
    table changes both sides in lockstep.

    Plan shape: map construction + per-column map lookups + lower/trim —
    one codegen stage over the scan, no shuffle, no Python.
    """
    from idb_backend_spark.data.typed_schema import verbatim_projection
    from idb_backend_spark.functions.flags import dqs_score_for

    cust = _t(spark, sf_dir, "customer")
    entries = []
    for k, expr in _RAW_SYNTH.items():
        entries += [F.lit(k), F.expr(expr).cast("string")]
    raw = cust.withColumn(
        "data",
        F.map_filter(F.create_map(*entries), lambda k, v: v.isNotNull()),
    )
    proj = verbatim_projection(raw, "records", keep=["c_custkey"])
    proj = proj.withColumn("flags", F.array().cast("array<string>"))
    proj = proj.withColumn(
        "dqs",
        F.round(
            dqs_score_for("records", F.col("flags"), columns=proj.columns), 6
        ),
    )
    # boundary shaping for the driver hasher: stringify the one list-typed
    # projected column and the flags array
    return proj.withColumns(
        {
            "recordids": F.array_join("recordids", "|"),
            "flags": F.array_join("flags", "|"),
        }
    ).orderBy("c_custkey")
