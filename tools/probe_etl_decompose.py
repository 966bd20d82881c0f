"""Decompose etl_enrichment_pipeline cost by output column / subtree.

Times noop materializations of column subsets of the final frame —
Catalyst prunes the unused expression subtrees, so each timing isolates
what its columns pull in. Usage:

    python tools/probe_etl_decompose.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from idb_backend_spark.plans.catalog import Q
from idb_backend_spark.session import get_spark


def t(df, runs=3):
    df.write.format("noop").mode("overwrite").save()  # warm
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.time() - t0)
    return min(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("etl-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    full = Q["etl_enrichment_pipeline"](spark, sf_dir)
    cases = {
        "full": full,
        "rowid_only": full.select("rowid"),
        "geo_latlon": full.select("rowid", "lat", "lon"),
        "date": full.select("rowid", "datecollected"),
        "elev_version": full.select("rowid", "minelevation", "version"),
        "vocab": full.select(
            "rowid", "basisofrecord", "taxonrank", "license"
        ),
        "commonnames": full.select("rowid", "commonnames"),
        "flags": full.select("rowid", "flags"),
        "flags_dqs": full.select("rowid", "flags", "dqs"),
        "all_but_flags_dqs": full.drop("flags", "dqs"),
    }
    for name, df in cases.items():
        spark.sparkContext.setJobDescription(f"etl-decompose:{name}")
        print(f"{name}: {t(df, runs):.3f}s", flush=True)


if __name__ == "__main__":
    main()
