"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster (AQE, skew handling, partition-size
control); tested on local[N]. All equality semantics in the engine are
"lowercased keyword" (reference: idb/helpers/conversions.py:280-285), and
all timestamps are processed in UTC for deterministic date functions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def _cpus() -> int:
    """SPARK_GRAFT_CPUS parsed LAZILY with a fallback — an import-time
    int() made any non-numeric value (an empty string from a CI
    template) an ImportError for the whole package, pointing at module
    import instead of configuration."""
    raw = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        return max(1, int(raw))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "idb-backend-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = _cpus()
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
            str(shuffle_partitions or cpus),
        )
        # Arrow for every pandas_udf / toPandas path (UDF kernels: date parse,
        # geo, simhash) — row-at-a-time Python UDFs are banned in this engine.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic time semantics (oracle parity with naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) columns (events.ts) read as long nanos;
        # plans/registry._t converts them to microsecond TIMESTAMP_NTZ —
        # that loader is the one conversion point every catalog path uses.
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
        # Align whole-stage-codegen's giving-up point with HotSpot's
        # actual JIT ceiling (-XX:HugeMethodLimit = 8000 bytecode bytes).
        # The default 65535 keeps stages whose generated consume loop is
        # 8-64 KB "codegen'd" — but HotSpot refuses to JIT them, so the
        # ENTIRE fused loop (trig, regexes, everything) executes as
        # interpreted bytecode. With 8000, such a stage falls back to
        # per-operator codegen, whose smaller methods all JIT: measured
        # 19.4 s -> 6.6 s on the 600k-row enrichment pipeline, no other
        # bench query regressed. Wide fused projections hit this
        # silently — there is no log line for "compiled but not JITted".
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
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


def _local_input_bytes(df) -> int | None:
    """Total input size when EVERY scanned file is on the local
    filesystem; None for any remote scheme (s3/hdfs/...) — a table that
    lives on object storage is cluster-scale, where the scan is wide and
    the spread must be a no-op. `inputFiles()` is a driver-only listing
    (~90 ms measured; no Spark job), vs ~170 ms for the `.rdd` plan
    conversion this replaced."""
    total = 0
    for uri in df.inputFiles():
        if not uri.startswith("file:"):
            return None
        p = uri[5:]
        while p.startswith("//"):
            p = p[1:]
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def spread_for_compute(df, *by: str, input_bytes: int | None = None):
    """Repartition to the session's default parallelism ONLY when the
    scan cannot reach it — the CPU-bound-enrichment pattern.

    The enrichment/signature expression stacks cost ~10x their scan
    bytes (the reference's figure for the same work is 750 rec/s/core),
    so a narrow input — a small file, a skinny dimension, one large row
    group — strands every core but the few the scan split to. Spark
    splits a file no finer than `spark.sql.files.openCostInBytes`
    (default 4 MiB), so a scan of fewer than cores x openCost bytes is
    PHYSICALLY narrower than the machine; that byte test is the guard.
    At real scale input bytes dwarf the threshold (or the path is
    remote, reported as unknown) and NO exchange is added — the
    repartition exists exactly when it pays for itself.

    ``input_bytes`` is a zero-cost hint when the caller knows the source
    (plans/registry stats the parquet path); otherwise a driver-side
    `inputFiles()` listing resolves local sizes. Pass high-cardinality
    key columns as ``by`` for deterministic hash placement — an agg on
    the same keys then adds no second exchange (HashPartitioning
    satisfies the agg's ClusteredDistribution); the bare form
    round-robins. Use on ROW-WISE pipelines: the exchange reorders
    rows, which a downstream float aggregate would see as a different
    summation order (rounded floats absorb it — the repo's 6-dp
    contract — but exact replay of an ordered stream would not).
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if input_bytes is None:
        input_bytes = _local_input_bytes(df)
    if input_bytes is None:
        return df  # remote storage: cluster scale, scan is already wide
    try:
        open_cost = int(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
    except (TypeError, ValueError):
        open_cost = 4194304
    if input_bytes >= cores * open_cost:
        return df
    if by:
        from pyspark.sql import functions as F

        return df.repartition(cores, *[F.col(c) for c in by])
    return df.repartition(cores)


# (a load_tables helper used to live here — deleted as dead code: every
# real path loads tables through plans/registry._t, which also owns the
# events.ts nanos->timestamp conversion this raw read would skip)
