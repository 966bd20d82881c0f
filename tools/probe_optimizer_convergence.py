"""Bisect which sub-plan of ingest_e2e trips Catalyst's
`Max iterations (100) reached for batch Operator Optimization`.

Builds the tombstones plan piece by piece with stderr markers, and runs
an A/B where the DwC-A read-back is replaced by a plain in-memory batch
so the read path and the merge composition can be separated.

Usage: python tools/probe_optimizer_convergence.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from idb_backend_spark.session import get_spark  # noqa: E402


def marker(name):
    print(f"### STEP {name}", flush=True)
    sys.stderr.write(f"### STEP {name}\n")
    sys.stderr.flush()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()

    from idb_backend_spark.export.writers import write_dwca
    from idb_backend_spark.operators import store as st
    from idb_backend_spark.operators.versioning import tombstones_for_deletes
    from idb_backend_spark.plans.registry import staging_dir
    from idb_backend_spark.sources.dwca import DwcaArchive

    sup = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    sk = F.col("s_suppkey")
    seed = sup.filter(sk % 3 != 0).select(
        F.concat(F.lit("s"), sk).alias("uuid"),
        F.lit("records").alias("type"),
        F.lit(None).cast("string").alias("parent"),
        F.md5(F.col("s_name")).alias("etag"),
        F.lit(0).alias("version"),
        F.to_timestamp(F.lit("2024-01-01")).alias("modified"),
        F.col("s_name").alias("data"),
    )

    def mk_batch(core):
        return core.select(
            F.concat(F.lit("s"), F.col("id")).alias("uuid"),
            F.lit("records").alias("type"),
            F.lit(None).cast("string").alias("parent"),
            F.md5(F.col("`dwc:recordedBy`")).alias("etag"),
            F.col("`dwc:recordedBy`").alias("data"),
        )

    # ---- arm A: plain batch (no DwC-A read-back) --------------------
    plain_core = sup.filter(sk % 7 != 0).select(
        sk.cast("string").alias("id"),
        F.when(sk % 5 == 0, F.concat(F.col("s_name"), F.lit("-rev")))
        .otherwise(F.col("s_name"))
        .alias("dwc:recordedBy"),
    )
    batch_a = mk_batch(plain_core)

    marker("A_tombstones_full")
    res = st.apply_harvest_batch(
        seed, batch_a, modified=F.to_timestamp(F.lit("2024-02-01"))
    )
    res.tombstones.explain(mode="simple")

    # ---- arm B: through write_dwca + DwcaArchive --------------------
    feed = sup.filter(sk % 7 != 0).select(
        sk.alias("id"),
        F.when(sk % 5 == 0, F.concat(F.col("s_name"), F.lit("-rev")))
        .otherwise(F.col("s_name"))
        .alias("dwc:recordedBy"),
    )
    work = staging_dir("probe_opt_")
    zip_path = os.path.join(work, "harvest.zip")
    write_dwca(zip_path, (feed, "id", ["dwc:recordedBy"], "records"))
    core = DwcaArchive(zip_path).read_core(spark)
    batch_b = mk_batch(core)

    marker("B_core_only")
    core.explain(mode="simple")

    marker("B_live_semijoin")
    cur = st.latest_view(seed, include_deleted=True)
    live = cur.filter(F.col("etag") != st.TOMBSTONE_ETAG)
    parents = batch_b.select("parent").distinct()
    live_s = live.join(
        parents, on=live["parent"].eqNullSafe(parents["parent"]),
        how="leftsemi",
    )
    live_s.explain(mode="simple")

    marker("B_tombstones_kernel")
    tombs = tombstones_for_deletes(
        live_s.select("uuid", "version", "type", "parent"),
        batch_b,
        modified=F.to_timestamp(F.lit("2024-02-01")),
    )
    tombs.explain(mode="simple")

    marker("done")


if __name__ == "__main__":
    main()
