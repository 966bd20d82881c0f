"""Round-5 §3.1 composition entry — the dataset-download path users
actually run, end-to-end: shim compile → record↔media cross-filter (J5)
→ DwC-A export with citation counts (S10/S11) → read the archive back
through the engine's own reader (S1) and grade the member contents.

Reference: idigbio_workers/lib/download.py:433-474 (the download task
chains query → cross-filtered record/media sets → CSV members → zip with
citations); tests/idigbio_workers/lib/test_download.py:12-50. Every
piece is oracle-green individually (shim rows, crossfilter_semi_join,
dwca_roundtrip, citation_counts) — this entry proves the COMPOSITION:
the same shim dict drives both the Spark predicates and (via
shim_to_sql) the oracle's WHERE clauses, so a drift anywhere in the
chain — predicate compilation, semi-join direction, CSV shaping,
meta.xml terms, blank→null read-back — breaks the value hash.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from idb_backend_spark.operators import relations
from idb_backend_spark.plans.registry import _t, query
from idb_backend_spark.query.shim import compile_shim, shim_to_sql

# the download request: an iDigBio-style shim per side (rq/mq in the
# reference's download API). Bare scalar = term (P1), range dict = P5.
_DL_SHIM_RECORDS = {
    "basisofrecord": "O",
    "totalprice": {"type": "range", "gte": 50000.0},
}
_DL_SHIM_MEDIA = {
    "returnflag": "N",
    "quantity": {"type": "range", "gte": 45},
}

_REC_WHERE = shim_to_sql(_DL_SHIM_RECORDS)
_MED_WHERE = shim_to_sql(_DL_SHIM_MEDIA)

_DL_ORACLE = (
    # same rename layer the Spark side applies, then the shim-generated
    # WHERE clauses verbatim; r = records passing rq AND owning >=1 media
    # passing mq (the has_child semi-join); the join fans each media row
    # passing mq to its (necessarily present) parent in r
    "WITH recs AS (SELECT o_orderkey AS id, o_orderpriority AS recordset, "
    "  o_orderstatus AS basisofrecord, o_totalprice AS totalprice "
    "  FROM orders), "
    "med AS (SELECT l_orderkey AS coreid, l_returnflag AS returnflag, "
    "  l_quantity AS quantity FROM lineitem), "
    f"r AS (SELECT * FROM recs WHERE {_REC_WHERE} AND EXISTS ("
    f"  SELECT 1 FROM med m WHERE m.coreid = recs.id AND {_MED_WHERE})) "
    "SELECT r.recordset, count(DISTINCT r.id) AS n_records, "
    "  count(*) AS n_media "
    f"FROM r JOIN med m ON m.coreid = r.id AND {_MED_WHERE} "
    "GROUP BY r.recordset ORDER BY r.recordset"
)


@query("download_e2e", _DL_ORACLE)
def download_e2e(spark, sf_dir):
    """§3.1 — the full dataset-download pipeline, graded on what lands
    IN the archive: compile both shims, cross-filter records↔media,
    write the DwC-A zip (occurrence core + multimedia extension +
    citations.txt with per-recordset counts), re-open the zip with
    DwcaArchive, and aggregate the read-back members to per-recordset
    record/media counts."""
    from idb_backend_spark.export.writers import (
        citation_text,
        recordset_counts,
        write_dwca,
    )
    from idb_backend_spark.sources.dwca import DwcaArchive

    records = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("recordset"),
        F.col("o_orderstatus").alias("basisofrecord"),
        F.col("o_totalprice").alias("totalprice"),
    )
    media = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("coreid"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_quantity").alias("quantity"),
    )
    r_out, m_out = relations.cross_filter(
        records,
        media,
        record_pred=compile_shim(_DL_SHIM_RECORDS),
        media_pred=compile_shim(_DL_SHIM_MEDIA),
        link=("id", "coreid"),
    )

    work = tempfile.mkdtemp(prefix="download_e2e_")
    # the returned frame lazily reads the extracted members under `work`
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    zip_path = os.path.join(work, "download.zip")
    core = r_out.select(
        "id",
        F.col("recordset").alias("dwc:collectionCode"),
        F.col("basisofrecord").alias("dwc:basisOfRecord"),
    )
    ext = m_out.select(
        "coreid", F.col("returnflag").alias("ac:accessURI")
    )
    counts = recordset_counts(r_out, "recordset")
    write_dwca(
        zip_path,
        (core, "id", ["dwc:collectionCode", "dwc:basisOfRecord"], "records"),
        extensions=[(ext, "coreid", ["ac:accessURI"], "mediarecords")],
        citations=citation_text(
            counts,
            query_echo=str(_DL_SHIM_RECORDS),
            total=sum(n for _, n in counts),
        ),
    )

    arch = DwcaArchive(zip_path)
    rcore = arch.read_core(spark).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("`dwc:collectionCode`").alias("recordset"),
    )
    rext = arch.read_extension(spark).select(
        F.col("coreid").cast("bigint").alias("id")
    )
    n_rec = rcore.groupBy("recordset").agg(
        F.countDistinct("id").alias("n_records")
    )
    n_med = (
        rext.join(rcore, on="id")
        .groupBy("recordset")
        .agg(F.count(F.lit(1)).alias("n_media"))
    )
    return (
        n_rec.join(n_med, on="recordset")
        .select("recordset", "n_records", "n_media")
        .orderBy("recordset")
    )
