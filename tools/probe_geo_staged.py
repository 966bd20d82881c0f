"""A/B: inline geo_normalize vs a staged form that parses each
coordinate once into an explicit column before the flip/bounds branch
logic. Checks result equality then compares noop walls.

    python tools/probe_geo_staged.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.functions import enrichment as E
from idb_backend_spark.functions.flags import flag_when
from idb_backend_spark.functions.geo import with_molodensky_shift
from idb_backend_spark.functions.grabbers import (
    decimal_exponent,
    getfield,
    py_double,
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


def synth(spark, sf_dir):
    li = _t_spread(spark, sf_dir, "lineitem", "l_orderkey", "l_linenumber")
    lk = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return li.select(
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


def inline_form(raw):
    geo = E.geo_normalize(F.col("lat_s"), F.col("lon_s"))
    staged = raw.withColumns(
        {
            "__geo_lat": geo["lat"],
            "__geo_lon": geo["lon"],
            "__flag_pre_flip": geo["flag_pre_flip"],
            "__flag_bounds": geo["flag_bounds"],
            "__flag_low_precision": geo["flag_low_precision"],
        }
    )
    out = with_molodensky_shift(
        staged, F.col("__geo_lat"), F.col("__geo_lon"), F.col("datum_s")
    )
    return out.select(
        "rowid",
        F.round("lat_wgs84", 6).alias("lat"),
        F.round("lon_wgs84", 6).alias("lon"),
        "__flag_pre_flip", "__flag_bounds", "__flag_low_precision",
        "datum_flag",
    )


def staged_form(raw):
    # stage the parses ONCE as real columns; branch logic on doubles only
    tmp = raw.withColumns(
        {
            "__g_lat0": py_double(getfield(F.col("lat_s"))),
            "__g_lon0": py_double(getfield(F.col("lon_s"))),
            "__g_exp_lat": decimal_exponent(F.col("lat_s")),
            "__g_exp_lon": decimal_exponent(F.col("lon_s")),
        }
    )
    lat0, lon0 = F.col("__g_lat0"), F.col("__g_lon0")
    have = lat0.isNotNull() & lon0.isNotNull()
    flip = (
        have
        & (((lat0 >= -180) & (lat0 < -90)) | ((lat0 > 90) & (lat0 <= 180)))
        & (lon0 >= -90)
        & (lon0 <= 90)
    )
    lat1 = F.when(flip, lon0).otherwise(lat0)
    lon1 = F.when(flip, lat0).otherwise(lon0)
    oob = have & ((lat1 < -90) | (lat1 > 90) | (lon1 < -180) | (lon1 > 180))
    ok = have & ~oob
    low_prec = ok & (
        (F.col("__g_exp_lat") <= 2) | (F.col("__g_exp_lon") <= 2)
    )
    staged = tmp.withColumns(
        {
            "__geo_lat": F.when(ok, lat1),
            "__geo_lon": F.when(ok, lon1),
            "__flag_pre_flip": flag_when("geopoint_pre_flip", flip & ~oob),
            "__flag_bounds": flag_when("geopoint_bounds", oob),
            "__flag_low_precision": flag_when(
                "geopoint_low_precision", low_prec
            ),
        }
    )
    out = with_molodensky_shift(
        staged, F.col("__geo_lat"), F.col("__geo_lon"), F.col("datum_s")
    )
    return out.select(
        "rowid",
        F.round("lat_wgs84", 6).alias("lat"),
        F.round("lon_wgs84", 6).alias("lon"),
        "__flag_pre_flip", "__flag_bounds", "__flag_low_precision",
        "datum_flag",
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("geo-staged-ab")
    spark.sparkContext.setLogLevel("ERROR")

    raw = synth(spark, sf_dir)
    a = inline_form(raw)
    b = staged_form(raw)

    # result equality first
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result diff rows: {diff}", flush=True)

    spark.sparkContext.setJobDescription("geo-ab:inline")
    ta = t(a, runs)
    spark.sparkContext.setJobDescription("geo-ab:staged")
    tb = t(b, runs)
    # interleave once more to de-noise
    spark.sparkContext.setJobDescription("geo-ab:inline2")
    ta2 = t(a, runs)
    spark.sparkContext.setJobDescription("geo-ab:staged2")
    tb2 = t(b, runs)
    print(f"inline: {ta:.3f}s / {ta2:.3f}s   staged: {tb:.3f}s / {tb2:.3f}s")


if __name__ == "__main__":
    main()
