"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster (AQE, skew handling, partition-size
control); tested on local[N]. All equality semantics in the engine are
"lowercased keyword" (reference: idb/helpers/conversions.py:280-285), and
all timestamps are processed in UTC for deterministic date functions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "idb-backend-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # and dynamic join-strategy switch — essential at 100 TB where static
        # partition counts are always wrong somewhere.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for every pandas_udf / toPandas path (UDF kernels: date parse,
        # geo, simhash) — row-at-a-time Python UDFs are banned in this engine.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic time semantics (oracle parity with naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) columns (events.ts) read as long nanos;
        # sources/store.py converts to microsecond timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate infers `size(arr) > 0` from every
        # explode and PushDownPredicate then substitutes the array
        # expression into that filter below the projections — for the
        # engine's expensive array builders (shingle windows, chunkers)
        # that re-evaluates the tokenization O(k·n) times per row INSIDE
        # the scan stage (measured 20x on the shingle explode). Every
        # generator in this engine explodes arrays that are non-empty by
        # construction, so the inferred filter only costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Bound scan partition size so a 100 TB table still yields
        # executor-memory-sized tasks.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the synthetic test tables (TESTDATA.md) as a dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
