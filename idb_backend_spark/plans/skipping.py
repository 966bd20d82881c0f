"""Fulltext data skipping — per-file token index (SURVEY §4's one custom
optimizer candidate: the reference gets token lookup for free from
Elasticsearch's inverted index; a Spark scan would otherwise read every
file for every fulltext query).

Design: a tiny side table mapping each data file to the set of token-hash
buckets present in its text columns. At query time the driver probes the
index with the query's tokens and hands Spark only the files that can
contain ALL of them (P7 is a token conjunction). False positives are
possible (bucket collisions) and harmless — the residual fulltext filter
still runs; false negatives are impossible for whole-token matches.

Scale notes: the index is built with one distributed pass (explode
tokens → distinct (file, bucket) → collect per file) and is ~KBs per
file — thousands of files fit comfortably in driver memory. This is the
same trick as Parquet bloom filters / Delta data skipping, specialized
to tokenized text. Substring `contains` semantics (the shim's fulltext
uses substring containment) only allow skipping for whole-token probes,
so `fulltext_scan` prunes with whole tokens and keeps the exact residual
predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idb_backend_spark.functions.text import tokens

#: bucket space for token hashes — 2^20 buckets keeps per-file sets exact
#: enough that collisions are rare while the index stays tiny
N_BUCKETS = 1 << 20


def build_token_index(
    df: DataFrame, text_cols: list[str], out_path: str
) -> None:
    """One distributed pass: (file, sorted distinct token buckets).

    ``df`` must be a direct file-source frame (input_file_name() resolves).
    """
    toks = None
    for c in text_cols:
        t = F.explode_outer(tokens(c)).alias("tok")
        part = df.select(F.input_file_name().alias("file"), t)
        toks = part if toks is None else toks.unionByName(part)
    buckets = (
        toks.filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
        .select(
            "file",
            F.pmod(F.xxhash64("tok"), F.lit(N_BUCKETS)).cast("int").alias("b"),
        )
        .distinct()
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("b")).alias("buckets"))
    )
    buckets.write.mode("overwrite").parquet(out_path)


def _bucket_of(token: str, spark: SparkSession) -> int:
    # must hash EXACTLY like the build side (JVM xxhash64 with Spark's
    # seed) — one tiny local query beats reimplementing the hash in Python
    row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(token)), F.lit(N_BUCKETS)).cast("int").alias("b")
    ).first()
    return row["b"]


def prune_files(
    spark: SparkSession, index_path: str, query_tokens: list[str]
) -> list[str]:
    """Files whose bucket set contains EVERY query token's bucket (P7 is a
    conjunction). Runs as one filter over the KB-scale index table."""
    idx = spark.read.parquet(index_path)
    toks = [t for t in {t.lower() for t in query_tokens} if t]
    if not toks:
        return [r["file"] for r in idx.select("file").collect()]
    pred = None
    for t in toks:
        b = _bucket_of(t, spark)
        c = F.array_contains("buckets", b)
        pred = c if pred is None else (pred & c)
    return [r["file"] for r in idx.filter(pred).select("file").collect()]


def fulltext_scan(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    query: str,
    fulltext_col: str = "fulltext",
) -> DataFrame:
    """Fulltext query with file skipping + exact residual filter.

    Returns exactly what a full scan with the P7 predicate would return,
    reading only the files the index admits. Empty admissible set =>
    empty frame without touching data files.
    """
    from idb_backend_spark.query.shim import compile_shim

    files = prune_files(spark, index_path, query.split())
    shim = {fulltext_col: {"type": "fulltext", "value": query}}
    if not files:
        base = spark.read.parquet(table_path)
        return base.filter(F.lit(False))
    pruned = spark.read.parquet(*files)
    return pruned.filter(compile_shim(shim, fulltext_col=fulltext_col))
