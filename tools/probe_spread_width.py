"""A/B the data-proportional spread width (r16) against the fixed
cores-wide spread, per query. OLD is recovered by setting
spark.idb.spread.minBytesPerTask=1 (ceil(bytes/1) >= cores for every
real input, reproducing n=cores); NEW uses the default 64 KiB floor.
Sample-interleaved pairs; result equality by sorted collect.

    python tools/probe_spread_width.py [sf_dir] [pairs] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from idb_backend_spark.plans.catalog import Q, UNGRADED
from idb_backend_spark.session import get_spark

DEFAULT_QUERIES = [
    "exact_dedup",
    "simhash_pairs",
    "corpus_curation_pipeline",
    "token_count_quality",
    "lang_id_heuristic",
    "datum_shift_molodensky",
    "latest_object_per_url",
]

CONF = "spark.idb.spread.minBytesPerTask"


def t1(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    names = sys.argv[3:] or DEFAULT_QUERIES
    runnable = {**Q, **UNGRADED}
    spark = get_spark("probe-spread-width")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        spark.conf.set(CONF, "1")
        df_old = runnable[name](spark, sf_dir)
        spark.conf.set(CONF, "65536")
        df_new = runnable[name](spark, sf_dir)
        for df in (df_old, df_new):
            df.write.format("noop").mode("overwrite").save()
            df.write.format("noop").mode("overwrite").save()
        olds, news = [], []
        for i in range(pairs):
            spark.sparkContext.setJobDescription(f"spread:{name}:old:{i}")
            olds.append(t1(df_old))
            spark.sparkContext.setJobDescription(f"spread:{name}:new:{i}")
            news.append(t1(df_new))
        wins = sum(1 for o, n in zip(olds, news) if n < o)
        med = sorted(n / o for o, n in zip(olds, news))[pairs // 2]
        a = sorted(map(tuple, df_old.collect()))
        b = sorted(map(tuple, df_new.collect()))
        print(
            f"{name}: old min {min(olds)} new min {min(news)} "
            f"wins {wins}/{pairs} median-ratio {med:.3f} equal={a == b}",
            flush=True,
        )
        print(f"  old {olds}\n  new {news}", flush=True)


if __name__ == "__main__":
    main()
