"""Measure the r13 structural routing gate's overhead on the giant
recordset shape (SCALING r12 addendum 3's scenario, re-run with the
gate): the router now makes its decision from one aggregation pass
that also scans the pair arrays for sequential-state markers
(coreid / ASR / nested terms) and counts distinct members. Overhead =
routed wall minus direct-relational wall on a clean 1.44 M-row giant.

Usage: python tools/probe_router_gate.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_440_000
    from idb_backend_spark.operators.ingest import (
        LOOKUP_SCHEMA,
        ingest_outcomes_relational,
        ingest_subfiles_routed,
    )
    from idb_backend_spark.session import get_spark

    spark = get_spark("router-gate-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ks = F.col("id").cast("string")
    rows = (
        spark.range(n)
        .select(
            F.lit("rs-giant").alias("rsid"),
            F.lit(0).cast("int").alias("file_order"),
            F.lit("f.txt").alias("fname"),
            F.lit("dwc:Occurrence").alias("rowtype"),
            F.col("id").alias("seq"),
            F.array(
                F.struct(
                    F.lit("dwc:occurrenceID").alias("k"),
                    F.concat(F.lit("occ-"), ks).alias("v"),
                ),
                F.struct(
                    F.lit("dwc:recordedBy").alias("k"),
                    F.concat(F.lit("p-"), ks).alias("v"),
                ),
                F.struct(
                    F.lit("dwc:locality").alias("k"),
                    F.concat(F.lit("loc "), ks).alias("v"),
                ),
            ).alias("rec"),
        )
    )
    lookup = spark.createDataFrame([], LOOKUP_SCHEMA)

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm both paths once
    timed(ingest_outcomes_relational(rows.limit(10_000), lookup))

    direct = [timed(ingest_outcomes_relational(rows, lookup))
              for _ in range(2)]
    routed = [
        timed(
            ingest_subfiles_routed(rows, lookup, kernel_max_rows=1_200_000)
        )
        for _ in range(2)
    ]
    print(json.dumps({
        "n_rows": n,
        "direct_relational_sec": min(direct), "direct": direct,
        "routed_sec": min(routed), "routed": routed,
        "gate_overhead_sec": round(min(routed) - min(direct), 2),
    }))


if __name__ == "__main__":
    main()
