"""Mixed-fleet probe of the routed ingest (VERDICT r13 task 5): one
``ingest_subfiles_routed`` call over the realistic 100× shape —
many small recordsets + clean giants + one DIRTY giant — confirming

(a) the structural gate's common-case overhead on a shape where the
    size-candidate semi-join is non-empty but small (3 giants out of
    ~100 recordsets), vs a hand-routed no-gate baseline;
(b) the dirty giant (multi-member + coreid carriers) lands on the
    KERNEL leg — proven by outcome equality against a pure-kernel run
    of its rows, where the relational leg would answer differently;
(c) the kernel group's measured memory bound holds at the dirty
    giant's size (subprocess ru_maxrss around _process_group, the
    probe_ingest_memory methodology).

Usage: python tools/probe_router_mixed.py [n_small] [small_rows] [giant_rows]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

KERNEL_MAX = 1_200_000


def _occ_rows(spark, rsid_expr, n, seq0=0):
    ks = F.col("id").cast("string")
    return spark.range(n).select(
        rsid_expr.alias("rsid"),
        F.lit(0).cast("int").alias("file_order"),
        F.lit("occurrence.txt").alias("fname"),
        F.lit("dwc:Occurrence").alias("rowtype"),
        (F.col("id") + F.lit(seq0)).alias("seq"),
        F.array(
            F.struct(F.lit("dwc:occurrenceID").alias("k"),
                     F.concat(F.lit("occ-"), ks).alias("v")),
            F.struct(F.lit("dwc:recordedBy").alias("k"),
                     F.concat(F.lit("p-"), ks).alias("v")),
            F.struct(F.lit("dwc:locality").alias("k"),
                     F.concat(F.lit("loc "), ks).alias("v")),
        ).alias("rec"),
    )


def _media_rows(spark, rsid, n):
    """Extension member rows (coreid carriers) — what makes a giant
    DIRTY: cross-member state the relational leg cannot express."""
    ks = F.col("id").cast("string")
    return spark.range(n).select(
        F.lit(rsid).alias("rsid"),
        F.lit(0).cast("int").alias("file_order"),
        F.lit("multimedia.txt").alias("fname"),
        F.lit("dwc:Multimedia").alias("rowtype"),
        F.col("id").alias("seq"),
        F.array(
            F.struct(F.lit("coreid").alias("k"), ks.alias("v")),
            F.struct(F.lit("ac:providerManagedID").alias("k"),
                     F.concat(F.lit("pm-"), ks).alias("v")),
        ).alias("rec"),
    )


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    small_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    giant_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_300_000

    from idb_backend_spark.operators.ingest import (
        LOOKUP_SCHEMA,
        ingest_outcomes_relational,
        ingest_subfiles,
        ingest_subfiles_routed,
    )
    from idb_backend_spark.session import get_spark

    spark = get_spark("router-mixed-probe")
    spark.sparkContext.setLogLevel("ERROR")
    lookup = spark.createDataFrame([], LOOKUP_SCHEMA)

    # fleet: n_small recordsets of small_rows each; 2 clean giants; 1
    # dirty giant = core member + a 10% extension member with coreids
    smalls = _occ_rows(
        spark,
        F.concat(F.lit("rs-small-"),
                 (F.col("id") % n_small).cast("string")),
        n_small * small_rows,
    )
    g1 = _occ_rows(spark, F.lit("rs-giant-clean-1"), giant_rows)
    g2 = _occ_rows(spark, F.lit("rs-giant-clean-2"), giant_rows)
    dirty_core = _occ_rows(
        spark, F.lit("rs-giant-dirty"), giant_rows, seq0=giant_rows
    )
    dirty_ext = _media_rows(spark, "rs-giant-dirty", giant_rows // 10)
    dirty = dirty_ext.unionByName(dirty_core)
    fleet = smalls.unionByName(g1).unionByName(g2).unionByName(dirty)

    # materialize to parquet and read back: the realistic 100× shape is
    # a parquet-backed wire table, where the router's rsid-only size
    # pass is a column-pruned scan — a generated lineage would instead
    # re-synthesize every column on every pass and overstate the gate
    import tempfile

    pq = tempfile.mkdtemp(prefix="router_mixed_") + "/fleet.parquet"
    fleet.write.mode("overwrite").parquet(pq)
    fleet = spark.read.parquet(pq)
    smalls = fleet.filter(F.col("rsid").startswith("rs-small-"))
    g12 = fleet.filter(F.col("rsid").startswith("rs-giant-clean"))
    dirty = fleet.filter(F.col("rsid") == "rs-giant-dirty")

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm both code paths
    timed(ingest_subfiles_routed(fleet.limit(20_000), lookup,
                                 kernel_max_rows=KERNEL_MAX))

    routed = [
        timed(ingest_subfiles_routed(fleet, lookup,
                                     kernel_max_rows=KERNEL_MAX))
        for _ in range(2)
    ]
    # no-gate baseline: routing hand-pinned, no decision aggregations
    baseline_df = ingest_subfiles(
        smalls.unionByName(dirty), lookup
    ).unionByName(
        ingest_outcomes_relational(g12, lookup)
    )
    baseline = [timed(baseline_df) for _ in range(2)]

    # (b) dirty giant on the kernel leg: outcome distribution equality
    # with a pure-kernel run — the relational leg would orphan every
    # extension row (no cross-member coreid buffers), so equality here
    # is proof of leg placement, not just of row counts
    def dist(df):
        return {
            (r["rowtype"], r["outcome"]): r["n"]
            for r in df.filter(F.col("rsid") == "rs-giant-dirty")
            .groupBy("rowtype", "outcome")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    routed_dist = dist(
        ingest_subfiles_routed(fleet, lookup, kernel_max_rows=KERNEL_MAX)
    )
    kernel_dist = dist(ingest_subfiles(dirty, lookup))
    assert routed_dist == kernel_dist, (routed_dist, kernel_dist)

    # (c) kernel memory at the dirty giant's size: subprocess ru_maxrss
    # around _process_group (probe_ingest_memory methodology, plus the
    # extension member)
    mem = json.loads(subprocess.check_output(
        [sys.executable, "-c", _MEM_WORKER, str(giant_rows)], text=True
    ))

    print(json.dumps({
        "fleet": {
            "small_recordsets": n_small, "small_rows": small_rows,
            "clean_giants": 2, "dirty_giants": 1,
            "giant_rows": giant_rows,
            "total_rows": n_small * small_rows + 3 * giant_rows
            + giant_rows // 10,
        },
        "routed_sec": min(routed), "routed": routed,
        "baseline_nogate_sec": min(baseline), "baseline": baseline,
        "gate_overhead_sec": round(min(routed) - min(baseline), 2),
        "gate_overhead_pct": round(
            100 * (min(routed) - min(baseline)) / min(baseline), 1
        ),
        "dirty_on_kernel_leg": True,
        "dirty_outcomes": {f"{k[0]}/{k[1]}": v
                           for k, v in sorted(routed_dist.items())},
        "kernel_mem": mem,
    }))


_MEM_WORKER = r"""
import json, resource, sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1])

import pandas as pd
from idb_backend_spark.operators.ingest import _process_group

base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
next_seq = [0]

def occ(i):
    return [("dwc:occurrenceID", f"occ-{i}"), ("dwc:recordedBy", f"p-{i}"),
            ("dwc:locality", f"loc {i}")]

ext_n = n // 10
rows = pd.DataFrame({
    "rsid": "rs-giant-dirty",
    "file_order": [0] * ext_n + [1] * n,
    "fname": ["multimedia.txt"] * ext_n + ["occurrence.txt"] * n,
    "rowtype": ["dwc:Multimedia"] * ext_n + ["dwc:Occurrence"] * n,
    "seq": range(ext_n + n),
    "rec": [[("coreid", str(i)), ("ac:providerManagedID", f"pm-{i}")]
            for i in range(ext_n)] + [occ(i) for i in range(n)],
})
lookup = pd.DataFrame(columns=[
    "rsid", "scope", "rtype", "ident", "uuid", "etag", "parent", "deleted",
])
out = _process_group(rows, lookup, True, ("dwc:ResourceRelationship",))
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({
    "n_core": n, "n_ext": ext_n,
    "peak_minus_base_gib": round((peak_kb - base_kb) / 1024 / 1024, 2),
    "bytes_per_row": round((peak_kb - base_kb) * 1024 / (n + ext_n), 1),
    "out_rows": len(out),
}))
"""


if __name__ == "__main__":
    main()
