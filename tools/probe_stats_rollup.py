"""A/B the single-pass usage_stats_rollup (synthetic __count/__total
dims riding the kv cascade) vs the old two-scan totals-join shape.
Same session, min-of-N noop walls, result equality by collect()."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from idb_backend_spark.operators import aggregates as agg
from idb_backend_spark.plans.registry import _t
from idb_backend_spark.session import get_spark


def old_rollup(
    df: DataFrame,
    group_cols,
    stats_type_col="stats_type",
    term_col="term",
    query_hash_col="query_hash",
    geocode_col="geocode",
    record_count_col="record_count",
) -> DataFrame:
    st = F.col(stats_type_col)
    is_view = st == "view"
    is_seen = st == "seen"
    is_vs = is_view | is_seen
    lnull = F.lit(None).cast("long")

    item_w = F.when(is_vs, F.lit(1)).otherwise(lnull)
    query_w = (
        F.when(is_seen, F.lit(1))
        .when(is_view, lnull)
        .otherwise(F.col(record_count_col))
    )
    geo_w = F.when(is_vs, F.lit(1)).otherwise(F.col(record_count_col))

    def dim(name, key, w):
        return F.struct(
            F.lit(name).alias("dim"),
            F.col(key).cast("string").alias("key"),
            w.cast("long").alias("w"),
        )

    kv = (
        df.select(
            *group_cols,
            F.explode(
                F.array(
                    dim("items", term_col, item_w),
                    dim("queries", query_hash_col, query_w),
                    dim("geocodes", geocode_col, geo_w),
                )
            ).alias("e"),
        )
        .select(*group_cols, "e.dim", "e.key", "e.w")
        .filter(F.col("w").isNotNull() & F.col("key").isNotNull())
    )
    fine = kv.groupBy(*group_cols, "dim", "key").agg(F.sum("w").alias("n"))

    def map_for(name):
        entry = F.when(
            F.col("dim") == name, F.struct(F.col("key"), F.col("n"))
        )
        return F.map_from_entries(
            F.sort_array(F.collect_list(entry))
        ).alias(name)

    maps = fine.groupBy(*group_cols).agg(
        map_for("items"), map_for("queries"), map_for("geocodes")
    )
    totals = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("count"),
        F.sum(
            F.when(is_vs, F.lit(1)).otherwise(F.col(record_count_col))
        ).alias("total"),
    )
    return totals.join(maps, on=list(group_cols), how="left")


def stats_frame(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id")
    return ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.when(F.col("event_type") == "click", "view")
        .when(F.col("event_type") == "view", "seen")
        .otherwise("search")
        .alias("stats_type"),
        uid.cast("string").alias("term"),
        F.concat(F.lit("q"), (uid % 5).cast("string")).alias("query_hash"),
        F.concat(
            F.lit('{"c":'), (uid % 3).cast("string"), F.lit("}")
        ).alias("geocode"),
        (F.lit(1) + F.abs(F.col("event_id")) % 4).alias("record_count"),
    )


def render(df):
    return df.select(
        "day",
        "stats_type",
        "count",
        F.col("total").cast("long").alias("total"),
        F.to_json("items").alias("items"),
        F.to_json("queries").alias("queries"),
        F.to_json("geocodes").alias("geocodes"),
    ).orderBy("day", "stats_type")


def t(df, runs=5):
    df.write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 3))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    stats = stats_frame(spark, sf_dir)
    if scale > 1:
        # poor-man's larger SF: k perturbed copies (distinct users per
        # copy so the group/term cardinality scales with the volume)
        from functools import reduce

        copies = [
            stats.withColumn(
                "term", F.concat(F.col("term"), F.lit(f"_{i}"))
            )
            for i in range(scale)
        ]
        stats = reduce(lambda a, b: a.union(b), copies)

    new_df = render(agg.usage_stats_rollup(stats, ["day", "stats_type"]))
    old_df = render(old_rollup(stats, ["day", "stats_type"]))

    for df in (old_df, new_df):  # warm twice
        t(df, 2)

    # sample-level interleave: pairwise deltas cancel this host's
    # episodic drift, which block min-of-N cannot (r16 finding)
    olds, news = [], []
    for i in range(pairs):
        spark.sparkContext.setJobDescription(f"stats_rollup:old:{i}")
        olds += t(old_df, 1)
        spark.sparkContext.setJobDescription(f"stats_rollup:new:{i}")
        news += t(new_df, 1)
    spark.sparkContext.setJobDescription(None)

    o = [tuple(r) for r in old_df.collect()]
    n = [tuple(r) for r in new_df.collect()]
    wins = sum(1 for a, b in zip(olds, news) if b < a)
    print(f"old: min {min(olds)} {olds}")
    print(f"new: min {min(news)} {news}")
    print(f"pairwise: NEW faster in {wins}/{len(olds)}; median ratio "
          f"{sorted(b / a for a, b in zip(olds, news))[len(olds) // 2]:.3f}")
    print(f"rows old={len(o)} new={len(n)} equal={o == n}")


if __name__ == "__main__":
    main()
