"""idb_backend_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of iDigBio/idb-backend.

Reference behavior is documented in SURVEY.md; each module cites the
reference file:line whose *semantics* it reproduces. The implementation is
Spark-first (DataFrame/Catalyst), not a port of the reference's
Flask/Postgres/Elasticsearch machinery.

Layout:
  query/      — iDigBio query-format ("shim") compiler → Column + ANSI SQL
  functions/  — scalar enrichment/text/similarity function library
  operators/  — relational operator patterns (versioning, joins, aggs, dedup, ANN)
  sources/    — file-format readers (delimited, DwC-A) and store helpers
  export/     — CSV/DwC-A/citation writers
  streaming/  — incremental/watermark processing
"""

__version__ = "0.1.0"
