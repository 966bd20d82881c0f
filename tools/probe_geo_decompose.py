"""Decompose the ETL geo subtree (py_double parse -> geo_normalize ->
molodensky shift) stage by stage on the same synthesized 600k-row frame
etl_enrichment_pipeline uses. Usage:

    python tools/probe_geo_decompose.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.functions import enrichment as E
from idb_backend_spark.functions.geo import with_molodensky_shift
from idb_backend_spark.functions.grabbers import (
    PY_FLOAT_RE,
    getfield,
    normalize_py_number,
    py_double,
    py_strip,
)
from idb_backend_spark.plans.registry import _t_spread
from idb_backend_spark.session import get_spark


def t(df, runs=3):
    df.write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.time() - t0)
    return min(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("geo-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    li = _t_spread(spark, sf_dir, "lineitem", "l_orderkey", "l_linenumber")
    lk = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    # identical synthesis to etl_enrichment_pipeline's lat_s/lon_s/datum_s
    raw = li.select(
        lk.alias("rowid"),
        F.when(F.col("l_orderkey") % 13 == 9, F.lit("0.0"))
        .otherwise(
            F.concat(
                (F.col("l_partkey") % 160 - 80).cast("string"), F.lit(".125")
            )
        )
        .alias("lat_s"),
        F.when(
            F.col("l_orderkey") % 13 == 10,
            F.concat(
                (-(F.col("l_partkey") % 160 - 80)).cast("string"),
                F.lit(".125"),
            ),
        )
        .otherwise(
            F.concat(
                (F.col("l_suppkey") % 360 - 180).cast("string"), F.lit(".25")
            )
        )
        .alias("lon_s"),
        F.expr(
            "CASE l_linenumber % 6 WHEN 0 THEN 'NAD27' WHEN 1 THEN 'WGS 72' "
            "WHEN 2 THEN 'WGS84' WHEN 3 THEN 'Cape' ELSE NULL END"
        ).alias("datum_s"),
    )

    def latlon(fn):
        return raw.select("rowid", fn("lat_s").alias("a"), fn("lon_s").alias("b"))

    cases = {}
    cases["0_synth_only"] = raw.select("rowid", "lat_s", "lon_s")
    cases["1_getfield"] = latlon(lambda c: getfield(F.col(c)))
    cases["2_pystrip_only"] = latlon(lambda c: py_strip(F.col(c)))
    cases["3_norm_nd"] = latlon(
        lambda c: normalize_py_number(py_strip(F.col(c)), drop_underscores=False)
    )
    cases["4_rlike_float"] = latlon(
        lambda c: normalize_py_number(
            py_strip(F.col(c)), drop_underscores=False
        ).rlike(PY_FLOAT_RE)
    )
    cases["5_py_double"] = latlon(lambda c: py_double(getfield(F.col(c))))

    geo = E.geo_normalize(F.col("lat_s"), F.col("lon_s"))
    cases["6_geo_normalize"] = raw.select(
        "rowid", geo["lat"].alias("a"), geo["lon"].alias("b")
    )
    staged = raw.withColumns(
        {"__geo_lat": geo["lat"], "__geo_lon": geo["lon"]}
    )
    shifted = with_molodensky_shift(
        staged, F.col("__geo_lat"), F.col("__geo_lon"), F.col("datum_s")
    )
    cases["7_molodensky"] = shifted.select("rowid", "lat_wgs84", "lon_wgs84")
    cases["8_round"] = shifted.select(
        "rowid",
        F.round("lat_wgs84", 6).alias("a"),
        F.round("lon_wgs84", 6).alias("b"),
    )

    for name, df in cases.items():
        spark.sparkContext.setJobDescription(f"geo-decompose:{name}")
        print(f"{name}: {t(df, runs):.3f}s", flush=True)


if __name__ == "__main__":
    main()
