"""S8/X7 — the analytical-table sink: partitioned, size-controlled,
clustered writes (the role the ES bulk indexer plays in the reference,
idb/indexing/indexer.py:273-330 with its 500-doc/10 MB chunking and
refresh toggling).

On Spark the equivalent knobs are output layout, not request batching:
* ``partitionBy(type)`` (X2) so every downstream query prunes,
* ``maxRecordsPerFile`` bounding file sizes (the 10 MB chunk analog),
* optional sort-within-partitions clustering so range predicates on the
  cluster key skip row groups via parquet min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_index_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write the typed analytical table with a scan-friendly layout.

    ``cluster_by`` sorts within partitions so parquet row-group min/max
    statistics actually skip data for range/equality predicates on those
    columns (unsorted data has full-range stats everywhere — useless).
    """
    out = df
    if cluster_by:
        shuffle_keys = (partition_by or []) + cluster_by
        # repartition on partition_by ALONE collapses parallelism to the
        # number of distinct partition values (4 `type`s -> 4 sort+write
        # tasks for the whole table); hashing on partition+cluster keys
        # keeps the cluster wide while dynamic partitioning still lands
        # each row in its hive directory
        out = out.repartition(*[F.col(c) for c in shuffle_keys])
        out = out.sortWithinPartitions(*shuffle_keys)
    writer = out.write.mode(mode).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def compact(
    spark_df: DataFrame, target_partitions: int | None = None
) -> DataFrame:
    """Small-file compaction pass (the OPTIMIZE analog): coalesce a table
    rewritten by many incremental merges back to healthy file counts.
    AQE already coalesces shuffle output; this is for explicit rewrites."""
    n = target_partitions or max(
        1, spark_df.sparkSession.sparkContext.defaultParallelism // 2
    )
    return spark_df.coalesce(n)
