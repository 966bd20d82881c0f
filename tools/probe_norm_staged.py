"""A/B: with_geo_normalize that stages only the PARSED doubles/exponents
(old r15 form — each parse re-inlines the 650-char Nd translate chain at
every CaseWhen reference, 14 copies in the etl plan) vs the current form
that also stages the NORMALIZED input strings (4 copies). Result
equality by collect, min-of-N noop walls, same session.

    python tools/probe_norm_staged.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.functions import enrichment as E
from idb_backend_spark.functions.enrichment import _geo_branch_logic, getfield
from idb_backend_spark.functions.grabbers import decimal_exponent, py_double
from idb_backend_spark.plans.registry import _t_spread
from idb_backend_spark.session import get_spark


def old_with_geo_normalize(df, lat_raw, lon_raw):
    tmp = df.withColumns(
        {
            "__geo_p_lat0": py_double(getfield(lat_raw)),
            "__geo_p_lon0": py_double(getfield(lon_raw)),
            "__geo_p_explat": decimal_exponent(lat_raw),
            "__geo_p_explon": decimal_exponent(lon_raw),
        }
    )
    r = _geo_branch_logic(
        F.col("__geo_p_lat0"),
        F.col("__geo_p_lon0"),
        F.col("__geo_p_explat"),
        F.col("__geo_p_explon"),
    )
    return tmp.withColumns(
        {
            "__geo_lat": r["lat"],
            "__geo_lon": r["lon"],
            "__flag_pre_flip": r["flag_pre_flip"],
            "__flag_bounds": r["flag_bounds"],
            "__flag_low_precision": r["flag_low_precision"],
        }
    ).drop("__geo_p_lat0", "__geo_p_lon0", "__geo_p_explat", "__geo_p_explon")


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
    )


def t(df, runs):
    df.write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 3))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = synth(spark, sf_dir)
    cols = [
        "rowid", "__geo_lat", "__geo_lon",
        "__flag_pre_flip", "__flag_bounds", "__flag_low_precision",
    ]
    old = old_with_geo_normalize(
        base, F.col("lat_s"), F.col("lon_s")
    ).select(*cols)
    new = E.with_geo_normalize(
        base, F.col("lat_s"), F.col("lon_s")
    ).select(*cols)

    spark.sparkContext.setJobDescription("norm-staged A/B: old")
    told = t(old, runs)
    spark.sparkContext.setJobDescription("norm-staged A/B: new")
    tnew = t(new, runs)
    spark.sparkContext.setJobDescription(None)

    key=lambda r:tuple((v is None, v) for v in r)
    o = sorted(map(tuple, old.collect()), key=key)
    n = sorted(map(tuple, new.collect()), key=key)
    print(f"old: min {min(told)} {told}")
    print(f"new: min {min(tnew)} {tnew}")
    print(f"rows old={len(o)} new={len(n)} equal={o == n}")


if __name__ == "__main__":
    main()
