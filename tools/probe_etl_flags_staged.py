"""A/B the etl two-stage value/flags split (r16) against the r15
single-stage form. Both sides use the CURRENT fold_flags (the fold fix
is measured separately by probe_fold_flags.py), so this isolates the
staged-flag-condition restructure. OLD is the r15 call-site construction
copied verbatim; NEW is the catalog entry.

    python tools/probe_etl_flags_staged.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.plans.catalog import Q
from idb_backend_spark.session import get_spark


def build_old(spark, sf_dir):
    """The r15 single-stage etl select, reproduced from q_store.py@r15."""
    from idb_backend_spark.functions import enrichment as E
    from idb_backend_spark.functions import grabbers
    from idb_backend_spark.functions.flags import (
        dqs_score,
        fold_flags,
        standard_coord_flags,
    )
    from idb_backend_spark.functions.grabbers import (
        float_grabber,
        int_grabber,
    )
    from idb_backend_spark.plans import q_store as QS

    raw = QS._etl_raw_frame(spark, sf_dir)
    bor = E.fix_basis_of_record(F.col("bor_s"))
    rank = E.fix_taxon_rank(F.col("rank_s"))
    dc = E.date_fallback(
        F.col("eventdate"), F.col("year_s"), F.col("month_s"),
        F.lit(None), F.lit(None),
    )
    enriched = raw.select(
        "rowid",
        F.col("lat_wgs84").alias("lat"),
        F.col("lon_wgs84").alias("lon"),
        dc.alias("datecollected"),
        float_grabber("elev_s").alias("minelevation"),
        int_grabber("version_s").alias("version"),
        bor["value"].alias("basisofrecord"),
        rank["value"].alias("taxonrank"),
        E.license_lookup(F.col("rights_s")).alias("license"),
        grabbers.collect_common_names(
            F.col("vern_s"), F.col("gbif_vern"), F.col("vern_lower_s")
        ).alias("commonnames"),
        fold_flags(
            F.col("__flag_pre_flip"), F.col("__flag_bounds"),
            F.col("__flag_low_precision"), F.col("datum_flag"),
            *standard_coord_flags(
                F.round(F.col("lat_wgs84"), 6), F.round(F.col("lon_wgs84"), 6)
            ),
            E.date_bounds_flag(dc), bor["flag_removed"], bor["flag_invalid"],
            rank["flag_replaced"], rank["flag_removed"],
        ).alias("flags"),
    )
    scored = enriched.withColumn(
        "dqs",
        F.round(
            dqs_score(
                {"lat": 1, "datecollected": 1, "basisofrecord": 1,
                 "taxonrank": 1, "license": 1, "minelevation": 1},
                F.col("flags"),
                maxscore=6.0,
            ),
            6,
        ),
    )
    return scored.withColumns(
        {
            "flags": F.array_join("flags", "|"),
            "commonnames": F.array_join("commonnames", "|"),
            "lat": F.round("lat", 6),
            "lon": F.round("lon", 6),
        }
    )


def t(df, runs):
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 3))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-etl-flags-staged")
    spark.sparkContext.setLogLevel("ERROR")

    df_old = build_old(spark, sf_dir)
    df_new = Q["etl_enrichment_pipeline"](spark, sf_dir)
    for df in (df_old, df_new):
        df.write.format("noop").mode("overwrite").save()
        df.write.format("noop").mode("overwrite").save()

    # sample-level interleave: each (old, new) pair shares one host
    # window, so pairwise deltas cancel the drift that block timing
    # cannot (this host shows 2-8x episodic swings within minutes)
    olds, news = [], []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"etl-flags:old:{i}")
        olds += t(df_old, 1)
        spark.sparkContext.setJobDescription(f"etl-flags:new:{i}")
        news += t(df_new, 1)
    wins = sum(1 for o, n in zip(olds, news) if n < o)
    print(f"OLD min {min(olds)}  samples {olds}")
    print(f"NEW min {min(news)}  samples {news}")
    print(f"pairwise: NEW faster in {wins}/{len(olds)} pairs; "
          f"median ratio new/old "
          f"{sorted(n / o for o, n in zip(olds, news))[len(olds) // 2]:.3f}")

    a = df_old.orderBy("rowid").collect()
    b = df_new.orderBy("rowid").collect()
    print(f"rows equal: {a == b} ({len(a)} vs {len(b)})")


if __name__ == "__main__":
    main()
