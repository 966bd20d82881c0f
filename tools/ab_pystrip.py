"""Pinned A/B of the r12 Python-semantics mirrors on the ETL hot path
(verdict r12 task 2): time etl_enrichment_pipeline at sf0.1 with the
shipped py_strip / py_double / normalize_py_number chains (ON) versus
naive substitutes (OFF: F.trim + bare try_cast), same session, warmed,
min-of-3 each. Quantifies how much of the r12 bench drift (2.869 ->
3.34 s against a faster canary) the parity chains can possibly explain.

The OFF leg is A/B-only instrumentation — it changes answer semantics
(space-only trim, Java-literal acceptance) and exists purely to bound
the cost of the exact mirrors.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def time_query(spark, sf_dir, runs=3):
    from idb_backend_spark.plans.catalog import Q

    df = Q["etl_enrichment_pipeline"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm, untimed
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 3))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from idb_backend_spark.functions import grabbers as G
    from idb_backend_spark.session import get_spark

    spark = get_spark("ab-pystrip")
    spark.sparkContext.setLogLevel("ERROR")

    orig = (G.py_strip, G.py_double, G.normalize_py_number)

    def naive_strip(c):
        return F.trim(F.col(c) if isinstance(c, str) else c)

    def naive_double(c):
        c = F.col(c) if isinstance(c, str) else c
        return c.cast("string").try_cast("double")

    legs = {}
    legs["on"] = time_query(spark, sf_dir)

    G.py_strip = naive_strip
    legs["strip_off"] = time_query(spark, sf_dir)
    G.py_double = naive_double
    G.normalize_py_number = lambda c, drop_underscores=True: c
    legs["all_off"] = time_query(spark, sf_dir)
    G.py_strip = orig[0]
    legs["double_off"] = time_query(spark, sf_dir)
    G.py_strip, G.py_double, G.normalize_py_number = orig
    legs["on_again"] = time_query(spark, sf_dir)

    out = {"sf_dir": sf_dir}
    for k, v in legs.items():
        out[k + "_min"] = min(v)
        out[k] = v
    on_best = min(min(legs["on"]), min(legs["on_again"]))
    out["mirror_cost_sec"] = round(on_best - min(legs["all_off"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
