"""A/B the fold_flags single-evaluation fix on etl_enrichment_pipeline.

OLD = the generic when(c.isNotNull(), array(c)) fold (every flag cond
evaluated twice); NEW = the flag_spec-aware fold (cond once). Alternates
OLD/NEW noop materializations in one session and checks result equality.

    python tools/probe_fold_flags.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.functions import flags as FL
from idb_backend_spark.plans.catalog import Q
from idb_backend_spark.session import get_spark


def fold_flags_old(*flag_cols):
    if not flag_cols:
        return F.array().cast("array<string>")
    empty = F.array().cast("array<string>")
    return F.concat(
        *[
            F.when(c.isNotNull(), F.array(c)).otherwise(empty)
            for c in flag_cols
        ]
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
    spark = get_spark("probe-fold-flags")
    spark.sparkContext.setLogLevel("ERROR")

    new_fold = FL.fold_flags
    df_new = Q["etl_enrichment_pipeline"](spark, sf_dir)
    FL.fold_flags = fold_flags_old
    try:
        df_old = Q["etl_enrichment_pipeline"](spark, sf_dir)
    finally:
        FL.fold_flags = new_fold

    # warm both
    for df in (df_old, df_new):
        df.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("fold-flags:old")
    old1 = t(df_old, runs)
    spark.sparkContext.setJobDescription("fold-flags:new")
    new1 = t(df_new, runs)
    spark.sparkContext.setJobDescription("fold-flags:old2")
    old2 = t(df_old, runs)
    spark.sparkContext.setJobDescription("fold-flags:new2")
    new2 = t(df_new, runs)
    print(f"OLD {min(old1)}/{min(old2)}  samples {old1} {old2}")
    print(f"NEW {min(new1)}/{min(new2)}  samples {new1} {new2}")

    a = df_old.orderBy("rowid").collect()
    b = df_new.orderBy("rowid").collect()
    print(f"rows equal: {a == b} ({len(a)} vs {len(b)})")


if __name__ == "__main__":
    main()
