"""A/B the pushdown barrier in corpus_curation_pipeline: old shape
(quality filter pushed below the spread into the serial scan stage) vs
new (barrier keeps it post-spread). Same session, min-of-N noop walls,
result equality by collect()."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from idb_backend_spark.plans.registry import _t
from idb_backend_spark.session import get_spark


def pushdown_barrier(df):
    """The r15-s2 predicate-only barrier, inlined here after its
    deletion from session.py (r16 ADVICE): a nondeterministic FILTER
    pins only the relative order of filters — superseded by
    barrier_filter, which stages a nondeterministic FIELD. Kept in this
    probe so the historical A/B stays reproducible."""
    return df.where(F.spark_partition_id() >= 0)


def build(spark, sf_dir, barrier: bool):
    from idb_backend_spark.functions import text as T
    from idb_backend_spark.operators.dedup import _spread, exact_dedup_keep_first

    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), None)
    enriched = docs.select(
        "doc_id",
        "text",
        T.lang_id("text").alias("lang"),
        T.quality_score("text").alias("q"),
        T.token_count("text").alias("n_tok"),
    )
    if barrier:
        enriched = pushdown_barrier(enriched)
    filtered = enriched.filter((F.col("q") >= 0.3) & (F.col("n_tok") >= 5))
    kept = exact_dedup_keep_first(
        filtered, "text", "doc_id", keep_cols=["doc_id", "lang", "q", "n_tok"]
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.col("q").cast("decimal(12,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


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
    spark = get_spark("corpus-barrier-ab")
    spark.sparkContext.setLogLevel("ERROR")
    old = build(spark, sf_dir, False)
    new = build(spark, sf_dir, True)
    spark.sparkContext.setJobDescription("corpus-ab:old")
    print("old:", t(old))
    spark.sparkContext.setJobDescription("corpus-ab:new")
    print("new:", t(new))
    spark.sparkContext.setJobDescription("corpus-ab:old2")
    print("old2:", t(old))
    spark.sparkContext.setJobDescription("corpus-ab:new2")
    print("new2:", t(new))
    ro, rn = sorted(map(tuple, old.collect())), sorted(map(tuple, new.collect()))
    print("rows_equal:", ro == rn, len(ro))


if __name__ == "__main__":
    main()
